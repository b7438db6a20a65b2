"""MLA decode KERNEL at long context: bf16-KV vs FP8-per-token-KV.

The engine-level north-star arm (tools/bench_mla_fp8.py) is
weight-stream-dominated at the geometry that fits one v5e chip (1.6 GB
dummy weights vs ~0.3 GB KV at ctx 1k), so it cannot isolate the KV
term the FP8 cache exists to cut. This arm times ONLY the per-layer MLA
paged decode attention chain (the SnapMLA contract surface, reference
flashmla_backend.py:127 flash_mla_ckv_fp8_per_token) at ctx where the
KV stream dominates the step:

  bytes/layer/step  bf16: B*ctx*(512+128)*2 = 84 MB @ B=8, ctx=8192
                    fp8 : B*ctx*(512*1 + 128*2) = 50 MB  (0.6x)

Same in-jit scan methodology as the other probes. FP8 >= ~1.2x here
means the kernel realizes the bandwidth saving; < 1.0x means dequant
overhead still eats it.

Env: MLA_K_CTX (8192), MLA_K_B (8), MLA_K_L (8), MLA_K_R (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CTX = int(os.environ.get("MLA_K_CTX", 8192))
B = int(os.environ.get("MLA_K_B", 8))
L = int(os.environ.get("MLA_K_L", 8))
R = int(os.environ.get("MLA_K_R", 8))
H, r, dn, dr, dv = 16, 512, 128, 64, 128
PS = 32


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.mem.kv_cache import (
        MLAKVCache,
        MLAKVCacheFP8,
        fp8_tail_dim,
        mla_write,
        mla_write_fp8,
        padded_head_dim,
    )
    from sglang_fluentllm_tpu.ops.attention.mla_paged_backend import (
        MLAPagedBackend,
    )
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        RUN_SLACK_PAGES,
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
    r_pad = padded_head_dim(r)
    rope_pad = padded_head_dim(dr)

    def mk(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s) * scale, jnp.bfloat16)

    # seed pools via the production write paths (page-aligned rows)
    def seed(pool, write):
        for b in range(B):
            step = 8  # pages per write batch
            for p0 in range(0, P, step):
                n = min(step * PS, (P - p0) * PS)
                loc = jnp.asarray(
                    pages[b, p0] * PS + np.arange(n), jnp.int32)
                ckv = mk(n, r)
                kpe = mk(n, dr)
                for lid in range(L):
                    pool = write(pool, lid, loc, ckv, kpe)
        return pool

    t0 = time.time()
    pool_bf16 = seed(
        MLAKVCache(lat=jnp.zeros((L, slots, r_pad + rope_pad),
                                 jnp.bfloat16)), mla_write)
    pool_fp8 = seed(
        MLAKVCacheFP8(
            ckv=jnp.zeros((L, slots, r), jnp.float8_e4m3fn),
            tail=jnp.zeros((L, slots, fp8_tail_dim(dr)), jnp.bfloat16),
        ), mla_write_fp8)
    print(f"pool seed {time.time()-t0:.1f}s", flush=True)

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
    )
    qn = mk(B, 1, H, dn)
    qp = mk(B, 1, H, dr)
    ckv_n = mk(B, 1, r)
    kpe_n = mk(B, 1, dr)
    w_kc = mk(H, r, dn, scale=0.05)
    w_vc = mk(H, r, dv, scale=0.05)
    sm = 0.1
    backend = MLAPagedBackend()

    def step(pool, _):
        def layer(pool, lid):
            out, pool = backend(
                pool, lid, qn, qp, ckv_n, kpe_n, fb, w_kc, w_vc, sm)
            return pool, jnp.sum(out.astype(jnp.float32))
        pool, outs = jax.lax.scan(
            layer, pool, jnp.arange(L, dtype=jnp.int32))
        return pool, jnp.sum(outs)

    @jax.jit
    def run(pool):
        pool, outs = jax.lax.scan(step, pool, None, length=R)
        return jnp.sum(outs)

    res = {}
    for name, pool in (("bf16", pool_bf16), ("fp8", pool_fp8)):
        t0 = time.time()
        jax.device_get(run(pool))
        print(f"{name} compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(run(pool))
            best = min(best, (time.perf_counter() - t0) / R)
        res[name] = best * 1e3
        print(json.dumps({
            "metric": f"mla_kernel_longctx_{name}",
            "step_ms": round(best * 1e3, 3),
            "ctx": CTX, "layers": L, "batch": B,
        }), flush=True)
    bf16_bytes = B * CTX * (r_pad + rope_pad) * 2 * L
    fp8_bytes = B * CTX * (r + fp8_tail_dim(dr) * 2) * L
    print(json.dumps({
        "metric": "mla_kernel_fp8_vs_bf16_longctx",
        "value": round(res["bf16"] / res["fp8"], 3),
        "unit": "x (>1 = fp8 faster)",
        "ctx": CTX,
        "bf16_ms": round(res["bf16"], 3),
        "fp8_ms": round(res["fp8"], 3),
        "bf16_kv_mb_per_step": round(bf16_bytes / 1e6, 1),
        "fp8_kv_mb_per_step": round(fp8_bytes / 1e6, 1),
        "bytes_ratio": round(bf16_bytes / fp8_bytes, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
