"""Decode-step attribution microbenchmark (run on the real TPU).

Times the fused k-step decode dispatch under different attention backends to
attribute the per-step cost (weights stream vs attention kernel vs KV write),
plus standalone 24-layer attention chains for kernel head-to-heads.

Usage:  python tools/profile_decode.py [full|kernels|all]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 64
CTX = 192          # tokens already in cache per row
K_STEPS = 8
PAGE = 32
REPEAT = 30

QWEN25_05B = {
    "architectures": ["Qwen2ForCausalLM"],
    "model_type": "qwen2",
    "hidden_size": 896,
    "intermediate_size": 4864,
    "num_attention_heads": 14,
    "num_key_value_heads": 2,
    "num_hidden_layers": 24,
    "vocab_size": 151936,
    "max_position_embeddings": 32768,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "attention_bias": True,
    "tie_word_embeddings": True,
}


def build_runner():
    from sglang_fluentllm_tpu.config.server_args import ServerArgs
    from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner

    model_dir = tempfile.mkdtemp(prefix="prof_model_")
    with open(os.path.join(model_dir, "config.json"), "w") as fp:
        json.dump(QWEN25_05B, fp)
    sa = ServerArgs(
        model_path=model_dir,
        load_format="dummy",
        skip_tokenizer_init=True,
        dtype="bfloat16",
        page_size=PAGE,
        max_total_tokens=B * (CTX + K_STEPS + PAGE),
        max_running_requests=2 * B,
        decode_steps_per_launch=K_STEPS,
        random_seed=0,
    )
    return ModelRunner(sa)


def make_decode_batch(runner):
    from sglang_fluentllm_tpu.runtime.batch_builder import DecodeItem

    items = []
    pages_per_req = (CTX + K_STEPS + PAGE - 1) // PAGE
    for i in range(B):
        base = 1 + i * pages_per_req  # page 0 is padding
        pages = np.arange(base, base + pages_per_req, dtype=np.int32)
        # slots for steps 0..k-1 start at position CTX-1
        pos = CTX - 1 + np.arange(K_STEPS)
        slots = pages[pos // PAGE] * PAGE + pos % PAGE
        items.append(DecodeItem(
            input_id=7, seq_len=CTX, slots=slots.astype(np.int32),
            pages=pages,
        ))
    return runner.batch_builder.build_decode(items)


def time_dispatch(runner, batch, sampling, label):
    import jax

    # warmup / compile
    ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
    jax.block_until_ready((ids, lp))
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
    jax.block_until_ready((ids, lp))
    dt = (time.perf_counter() - t0) / REPEAT
    per_step_ms = 1000 * dt / K_STEPS
    print(f"{label:34s} dispatch {1000*dt:8.3f} ms  "
          f"per-step {per_step_ms:7.3f} ms  "
          f"({B / (dt / K_STEPS):8.0f} tok/s)", flush=True)
    return per_step_ms


class StubBackend:
    """Write KV, then return v broadcast (no attention kernel)."""

    name = "stub"

    def __call__(self, kv_cache, layer_id, q, k_new, v_new, batch,
                 sm_scale, logit_cap=0.0, **kw):
        from sglang_fluentllm_tpu.mem.kv_cache import mha_write

        B_, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B_ * S, Hk, D), v_new.reshape(B_ * S, Hk, D),
        )
        G = q.shape[2] // Hk
        out = jnp_repeat(v_new, G)
        return out, kv_cache


class StubNoWriteBackend:
    name = "stub_nowrite"

    def __call__(self, kv_cache, layer_id, q, k_new, v_new, batch,
                 sm_scale, logit_cap=0.0, **kw):
        G = q.shape[2] // k_new.shape[2]
        return jnp_repeat(v_new, G), kv_cache


def jnp_repeat(v, G):
    import jax.numpy as jnp

    return jnp.repeat(v, G, axis=2)


def profile_full(runner):
    from sglang_fluentllm_tpu.ops.attention.paged_backend import (
        PagedAttentionBackend,
    )
    from sglang_fluentllm_tpu.ops.attention.ref_backend import (
        RefAttentionBackend,
    )
    from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata

    batch = make_decode_batch(runner)
    sampling = SamplingMetadata.from_lists(
        [0.0] * B, [1.0] * B, [-1] * B, [0.0] * B, batch.batch_size
    )
    results = {}
    import os as _os
    sel = _os.environ.get("PROF_BACKENDS", "paged,stub_nowrite").split(",")
    all_b = {
        "paged": ("paged (current prod)", PagedAttentionBackend()),
        "ref": ("ref dense-gather", RefAttentionBackend()),
        "stub_write": ("stub write-only", StubBackend()),
        "stub_nowrite": ("stub no-write", StubNoWriteBackend()),
    }
    for label, backend in [all_b[k] for k in sel if k in all_b]:
        runner.model.attn = backend
        runner.attn_backend = backend
        runner._init_jit()
        results[label] = time_dispatch(runner, batch, sampling, label)
    return results


def profile_kernels(runner):
    """Standalone 24-layer decode-attention chains, simulating in-model
    conditions (stacked [L, ...] cache, dynamic layer index in a scan)."""
    import functools

    import jax
    import jax.numpy as jnp

    c = runner.model_config
    L, Hk, D = c.num_hidden_layers, c.num_key_value_heads, 128
    Hq = c.num_attention_heads
    G = Hq // Hk
    num_slots = runner.kv_cache.k.shape[2]
    batch = make_decode_batch(runner)
    pt = jnp.asarray(batch.page_tables)
    seq_lens = jnp.asarray(batch.seq_lens)
    q = jnp.asarray(
        np.random.RandomState(0).standard_normal((B, Hq, D)),
        jnp.bfloat16,
    )
    kc = runner.kv_cache.k
    vc = runner.kv_cache.v
    sm = 1.0 / np.sqrt(D)

    from jax.experimental.pallas.ops.tpu.paged_attention import (
        paged_attention as official,
    )
    from sglang_fluentllm_tpu.ops.attention.pallas_decode import (
        paged_decode_attention as inhouse,
    )

    def chain(attn_fn):
        def step(h, l):
            o = attn_fn(h, l)
            return h + o.astype(h.dtype) * 1e-6, None

        def run(q0):
            h, _ = jax.lax.scan(step, q0, jnp.arange(L))
            return h

        return jax.jit(run)

    def official_fn(h, l):
        k_pages = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)
        v_pages = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)
        k_pages = k_pages.reshape(Hk, -1, PAGE, D)
        v_pages = v_pages.reshape(Hk, -1, PAGE, D)
        P = pt.shape[1]
        ppcb = 8
        P_pad = -(-P // ppcb) * ppcb
        ptp = jnp.pad(pt, ((0, 0), (0, P_pad - P))) if P_pad != P else pt
        return official(
            (h * sm).astype(h.dtype), k_pages, v_pages,
            jnp.maximum(seq_lens, 1), ptp,
            pages_per_compute_block=min(ppcb, P_pad),
        )

    def inhouse_fn(h, l):
        k_l = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)
        return inhouse(h, k_l, v_l, pt, seq_lens, page_size=PAGE,
                       sm_scale=float(sm))

    def dense_fn(h, l):
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            mha_attend, page_gather_mha,
        )

        k_l = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)
        k = page_gather_mha(k_l, pt, PAGE)
        v = page_gather_mha(v_l, pt, PAGE)
        return mha_attend(h[:, None], k, v, seq_lens,
                          jnp.ones_like(seq_lens), float(sm))[:, 0]

    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        paged_decode_multirow as multirow,
    )

    def multirow_fn_rows(rows):
        def fn(h, l):
            out = multirow(h, kc, vc, l, pt, seq_lens, page_size=PAGE,
                           sm_scale=float(sm), rows=rows)
            return out[0] if isinstance(out, tuple) else out
        return fn

    # scattered page tables (per-page DMA path)
    rngp = np.random.RandomState(5)
    pt_scat = np.asarray(batch.page_tables).copy()
    perm = rngp.permutation(np.unique(pt_scat[pt_scat > 0]))
    remap = np.zeros(int(pt_scat.max()) + 1, np.int32)
    remap[np.unique(pt_scat[pt_scat > 0])] = perm
    pt_scat = jnp.asarray(remap[pt_scat])

    def multirow_scattered_fn(h, l):
        out = multirow(h, kc, vc, l, pt_scat, seq_lens, page_size=PAGE,
                       sm_scale=float(sm), rows=8)
        return out[0] if isinstance(out, tuple) else out

    for label, fn in [
        ("official paged_attention x24", official_fn),
        ("inhouse pallas_decode x24", inhouse_fn),
        ("dense gather jnp x24", dense_fn),
        ("multirow rows=8 x24", multirow_fn_rows(8)),
        ("multirow rows=16 x24", multirow_fn_rows(16)),
        ("multirow rows=32 x24", multirow_fn_rows(32)),
        ("multirow scattered rows=8 x24", multirow_scattered_fn),
    ]:
        try:
            f = chain(fn)
            out = f(q)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(REPEAT):
                out = f(q)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / REPEAT
            print(f"{label:34s} {1000*dt:8.3f} ms "
                  f"({1000*dt/24:6.3f} ms/layer-call)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:34s} FAILED: {e}", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    runner = build_runner()
    print(f"platform={__import__('jax').devices()[0].platform}", flush=True)
    if mode in ("kernels", "all"):
        profile_kernels(runner)
    if mode in ("full", "all"):
        profile_full(runner)


if __name__ == "__main__":
    main()
