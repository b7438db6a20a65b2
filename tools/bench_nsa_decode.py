"""NSA sparse decode vs dense full-attention decode at long context
(VERDICT r4 #4 'done' bar: a >=8k bench arm showing NSA decode step
time < dense at the same geometry).

Per-layer attention chains only (no GEMMs), L layers in a lax.scan,
R steps back-to-back in-jit, one device_get at the end — the PERF.md
methodology for this hardware. Arms:

  dense      — fused-write multirow paged decode over the FULL history
               (what a non-NSA model pays at this context)
  nsa_sparse — the production sparse path: compressed branch over the
               cached rows + top-k select (Pallas select kernel) +
               sliding window (multirow kernel, window=512)

Bytes per step per layer (B=8, Hk=4, D=128, ctx=8192):
  dense     ~ B*ctx*Hk*D*2*2    = 134 MB
  sparse    ~ B*(ctx/16 + 16*64 + 512)*Hk*D*2*2 ~ 25 MB
so the sparse arm should win despite one extra kernel launch per layer.

Env: NSA_BENCH_CTX (default 8192), NSA_BENCH_B (8), NSA_BENCH_L (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CTX = int(os.environ.get("NSA_BENCH_CTX", 8192))
B = int(os.environ.get("NSA_BENCH_B", 8))
L = int(os.environ.get("NSA_BENCH_L", 8))
R = int(os.environ.get("NSA_BENCH_R", 8))
Hq, Hk, D = 16, 4, 128
PS = 32
KERNEL, STRIDE, SS, TOPN, WIN = 32, 16, 64, 16, 512


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.mem.kv_cache import MHAKVCache, NSAKVCache
    from sglang_fluentllm_tpu.ops.attention.nsa import (
        NSAAttentionBackend,
        NSAParams,
    )
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        RUN_SLACK_PAGES,
        paged_decode_multirow,
    )
    from sglang_fluentllm_tpu.runtime.forward_batch import (
        ForwardBatch,
        ForwardMode,
    )

    rng = np.random.RandomState(0)
    P = CTX // PS
    slots = (1 + B * P + RUN_SLACK_PAGES) * PS
    pages = np.zeros((B, P), np.int32)
    for b in range(B):
        pages[b] = 1 + b * P + np.arange(P)
    T = np.full((B,), CTX, np.int32)
    NB = (CTX - KERNEL) // STRIDE + 1

    def mk(*s, scale=0.3):
        return jnp.asarray(rng.standard_normal(s) * scale, jnp.bfloat16)

    kpool = mk(L, Hk, slots, D)
    vpool = mk(L, Hk, slots, D)
    q = mk(B, 1, Hq, D)
    kn = mk(B, 1, Hk, D)
    vn = mk(B, 1, Hk, D)
    new_slots = (jnp.asarray(pages)[:, -1] * PS + (CTX - 1) % PS
                 ).astype(jnp.int32)[:, None]
    fb = ForwardBatch(
        input_ids=jnp.zeros((B, 1), jnp.int32),
        positions=jnp.full((B, 1), CTX - 1, jnp.int32),
        out_cache_loc=new_slots,
        page_tables=jnp.asarray(pages),
        seq_lens=jnp.asarray(T),
        q_lens=jnp.ones((B,), jnp.int32),
        mode=ForwardMode.DECODE, page_size=PS, pages_are_runs=True,
        state_idx=jnp.arange(B, dtype=jnp.int32),
    )
    sm = 1.0 / np.sqrt(D)
    backend = NSAAttentionBackend()
    nsa_p = NSAParams(
        gate_k=mk(KERNEL * D, KERNEL, scale=0.05),
        gate_v=mk(KERNEL * D, KERNEL, scale=0.05),
        fusion_w=mk(Hq, 3, 3 * D, scale=0.05),
    )
    nsakv = NSAKVCache(
        pool=MHAKVCache(k=kpool, v=vpool),
        ck=mk(L, B + 1, NB, Hk, D),
        cv=mk(L, B + 1, NB, Hk, D),
    )

    def nsa_dense_step(kv, _):
        """The ACTUAL alternative for an NSA model: the old paged path —
        full history gathered per layer + dense three-branch attention
        (what the sparse path replaces; the plain-dense arm below is the
        no-NSA floor no NSA implementation can reach)."""
        def layer(kv, lid):
            from sglang_fluentllm_tpu.mem.kv_cache import mha_write
            from sglang_fluentllm_tpu.ops.attention.nsa import nsa_attend
            from sglang_fluentllm_tpu.ops.attention.ref_backend import (
                page_gather_mha,
            )

            pool = mha_write(
                kv.pool, lid, fb.out_cache_loc.reshape(-1),
                kn.reshape(B, Hk, D), vn.reshape(B, Hk, D))
            kd = page_gather_mha(
                pool.k[lid], fb.page_tables, PS)[..., :D]
            vd = page_gather_mha(
                pool.v[lid], fb.page_tables, PS)[..., :D]
            out = nsa_attend(
                q, kd, vd, fb.positions, fb.seq_lens, nsa_p,
                kernel=KERNEL, stride=STRIDE, select_size=SS,
                top_n=TOPN, n_init=1, n_local=2, window=WIN,
                sm_scale=sm)
            return NSAKVCache(pool=pool, ck=kv.ck, cv=kv.cv), \
                jnp.sum(out.astype(jnp.float32))
        kv, outs = jax.lax.scan(
            layer, kv, jnp.arange(L, dtype=jnp.int32))
        return kv, jnp.sum(outs)

    def dense_step(kv, _):
        def layer(kv, lid):
            out, k2, v2 = paged_decode_multirow(
                q[:, 0], kv.k, kv.v, lid, fb.page_tables, fb.seq_lens,
                k_new=kn[:, 0], v_new=vn[:, 0],
                new_slots=fb.out_cache_loc[:, 0],
                page_size=PS, sm_scale=sm, run_only=True,
            )
            return MHAKVCache(k=k2, v=v2), jnp.sum(out.astype(jnp.float32))
        kv, outs = jax.lax.scan(
            layer, kv, jnp.arange(L, dtype=jnp.int32))
        return kv, jnp.sum(outs)

    def sparse_step(kv, _):
        def layer(kv, lid):
            out, kv = backend._decode_sparse(
                kv, lid, q, kn, vn, fb, sm, nsa_p,
                kernel=KERNEL, stride=STRIDE, select_size=SS,
                top_n=TOPN, n_init=1, n_local=2, window=WIN,
            )
            return kv, jnp.sum(out.astype(jnp.float32))
        kv, outs = jax.lax.scan(
            layer, kv, jnp.arange(L, dtype=jnp.int32))
        return kv, jnp.sum(outs)

    @jax.jit
    def run_dense(kv):
        kv, outs = jax.lax.scan(dense_step, kv, None, length=R)
        return jnp.sum(outs)

    @jax.jit
    def run_sparse(kv):
        kv, outs = jax.lax.scan(sparse_step, kv, None, length=R)
        return jnp.sum(outs)

    @jax.jit
    def run_nsa_dense(kv):
        kv, outs = jax.lax.scan(nsa_dense_step, kv, None, length=R)
        return jnp.sum(outs)

    arms = [
        ("dense", run_dense, MHAKVCache(k=kpool, v=vpool)),
        ("nsa_sparse", run_sparse, nsakv),
    ]
    if os.environ.get("NSA_BENCH_DENSE_NSA", "1") == "1":
        arms.append(("nsa_dense_gather", run_nsa_dense, nsakv))
    res = {}
    for name, fn, kv in arms:
        t0 = time.time()
        jax.device_get(fn(kv))
        print(f"{name} compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(fn(kv))
            best = min(best, (time.perf_counter() - t0) / R)
        res[name] = best * 1e3
        print(json.dumps({
            "metric": f"nsa_bench_{name}",
            "step_ms": round(best * 1e3, 3),
            "ctx": CTX, "layers": L, "batch": B,
        }), flush=True)
    print(json.dumps({
        "metric": "nsa_sparse_vs_dense_decode",
        "value": round(res["dense"] / res["nsa_sparse"], 3),
        "unit": "x (>1 = sparse faster)",
        "ctx": CTX,
        "dense_ms": round(res["dense"], 3),
        "sparse_ms": round(res["nsa_sparse"], 3),
        "vs_nsa_dense_gather": (
            round(res["nsa_dense_gather"] / res["nsa_sparse"], 3)
            if "nsa_dense_gather" in res else None),
    }), flush=True)


if __name__ == "__main__":
    main()
