"""Hardware numerics validation for the Pallas decode kernels against the
jnp reference backends (run on the real chip after any kernel change —
CPU interpret mode does not exercise Mosaic's lowering).

Checks:
  - paged_decode_multirow (fused write, deep DMA pipeline) vs ref MHA
  - mla_decode_multirow bf16 + fp8 per-token KV vs ref MLA (absorbed)
Prints one JSON line per check with the max abs error.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.mem.kv_cache import (
        MHAKVCache,
        MLAKVCache,
        MLAKVCacheFP8,
        fp8_tail_dim,
        mha_write,
        mla_write,
        mla_write_fp8,
        padded_head_dim,
    )
    from sglang_fluentllm_tpu.ops.attention.ref_backend import (
        RefAttentionBackend,
        RefMLABackend,
    )
    from sglang_fluentllm_tpu.runtime.forward_batch import (
        ForwardBatch,
        ForwardMode,
    )

    rng = np.random.RandomState(0)
    PS = 32

    # ---- MHA multirow ----
    B, Hq, Hk, D, CTX, L = 8, 14, 2, 64, 150, 2
    Dp = padded_head_dim(D)
    Ppr = -(-(CTX + 1) // PS)
    slots_n = (1 + B * Ppr + 8) * PS
    pages = np.zeros((B, Ppr), np.int32)
    for i in range(B):
        pages[i] = 1 + i * Ppr + np.arange(Ppr)

    def seed_pool(cache, write, mk_rows):
        for b in range(B):
            for p in range(Ppr):
                n = min(PS, CTX - 1 - p * PS)
                if n <= 0:
                    break
                loc = jnp.arange(
                    pages[b, p] * PS, pages[b, p] * PS + n, dtype=jnp.int32
                )
                for lid in range(L):
                    cache = write(cache, lid, loc, *mk_rows(n, b, p, lid))
        return cache

    kv = MHAKVCache(
        k=jnp.zeros((L, Hk, slots_n, Dp), jnp.bfloat16),
        v=jnp.zeros((L, Hk, slots_n, Dp), jnp.bfloat16),
    )
    kv = seed_pool(
        kv, mha_write,
        lambda n, b, p, lid: (
            jnp.asarray(rng.standard_normal((n, Hk, D)) * 0.3, jnp.bfloat16),
            jnp.asarray(rng.standard_normal((n, Hk, D)) * 0.3, jnp.bfloat16),
        ),
    )
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)) * 0.3, jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, 1, Hk, D)) * 0.3, jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, 1, Hk, D)) * 0.3, jnp.bfloat16)
    slot_new = (
        jnp.asarray(pages)[:, (CTX - 1) // PS] * PS + (CTX - 1) % PS
    ).astype(jnp.int32)[:, None]
    fb = ForwardBatch(
        input_ids=jnp.zeros((B, 1), jnp.int32),
        positions=jnp.full((B, 1), CTX - 1, jnp.int32),
        out_cache_loc=slot_new,
        page_tables=jnp.asarray(pages),
        seq_lens=jnp.full((B,), CTX, jnp.int32),
        q_lens=jnp.ones((B,), jnp.int32),
        mode=ForwardMode.DECODE, page_size=PS, pages_are_runs=True,
    )
    from sglang_fluentllm_tpu.ops.attention.paged_backend import (
        PagedAttentionBackend,
    )

    for lid in range(L):
        o_pal, kv_pal = PagedAttentionBackend()(
            kv, lid, q, kn, vn, fb, 0.125
        )
        o_ref, kv_ref = RefAttentionBackend()(
            kv, lid, q, kn, vn, fb, 0.125
        )
        err = float(jnp.max(jnp.abs(
            o_pal.astype(jnp.float32) - o_ref.astype(jnp.float32)
        )))
        kerr = float(jnp.max(jnp.abs(
            kv_pal.k.astype(jnp.float32) - kv_ref.k.astype(jnp.float32)
        )))
        print(json.dumps({"check": f"mha_multirow_l{lid}",
                          "max_err": err, "kv_err": kerr,
                          "ok": err < 0.03 and kerr == 0.0}), flush=True)

    # ---- MLA bf16 + fp8 ----
    from sglang_fluentllm_tpu.ops.attention.mla_paged_backend import (
        MLAPagedBackend,
    )

    H, r, dn, dr, dv = 8, 512, 128, 64, 128
    r_pad = padded_head_dim(r)
    rope_pad = padded_head_dim(dr)
    for kind in ("bf16", "fp8"):
        if kind == "bf16":
            pool = MLAKVCache(lat=jnp.zeros(
                (L, slots_n, r_pad + rope_pad), jnp.bfloat16))
            write = mla_write
        else:
            pool = MLAKVCacheFP8(
                ckv=jnp.zeros((L, slots_n, r), jnp.float8_e4m3fn),
                tail=jnp.zeros((L, slots_n, fp8_tail_dim(dr)),
                               jnp.bfloat16),
            )
            write = mla_write_fp8
        pool = seed_pool(
            pool, write,
            lambda n, b, p, lid: (
                jnp.asarray(rng.standard_normal((n, r)) * 0.3, jnp.bfloat16),
                jnp.asarray(rng.standard_normal((n, dr)) * 0.3,
                            jnp.bfloat16),
            ),
        )
        qn = jnp.asarray(rng.standard_normal((B, 1, H, dn)) * 0.2,
                         jnp.bfloat16)
        qp = jnp.asarray(rng.standard_normal((B, 1, H, dr)) * 0.2,
                         jnp.bfloat16)
        ckv_n = jnp.asarray(rng.standard_normal((B, 1, r)) * 0.2,
                            jnp.bfloat16)
        kpe_n = jnp.asarray(rng.standard_normal((B, 1, dr)) * 0.2,
                            jnp.bfloat16)
        w_kc = jnp.asarray(rng.standard_normal((H, r, dn)) * 0.05,
                           jnp.bfloat16)
        w_vc = jnp.asarray(rng.standard_normal((H, r, dv)) * 0.05,
                           jnp.bfloat16)
        o_pal, _ = MLAPagedBackend()(
            pool, 0, qn, qp, ckv_n, kpe_n, fb, w_kc, w_vc, 0.1
        )
        o_ref, _ = RefMLABackend()(
            pool, 0, qn, qp, ckv_n, kpe_n, fb, w_kc, w_vc, 0.1
        )
        err = float(jnp.max(jnp.abs(
            o_pal.astype(jnp.float32) - o_ref.astype(jnp.float32)
        )))
        print(json.dumps({"check": f"mla_decode_{kind}",
                          "max_err": err, "ok": err < 0.05}), flush=True)

    # ---- int4 dequant GEMM (w4a16 decode path) ----
    from sglang_fluentllm_tpu.ops.quant.int4 import (
        int4_block_matmul,
        int4_matmul_ref,
        quantize_weight_int4,
    )

    K4, N4 = 512, 512
    w = rng.standard_normal((K4, N4)).astype(np.float32) * 0.02
    qw = quantize_weight_int4(w)
    x4 = jnp.asarray(rng.standard_normal((32, K4)), jnp.bfloat16)
    y_pal = int4_block_matmul(x4, qw.w4, qw.scale, block_n=256)
    y_ref = int4_matmul_ref(x4, qw)
    scale4 = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) or 1.0
    err = float(jnp.max(jnp.abs(
        y_pal.astype(jnp.float32) - y_ref.astype(jnp.float32)
    ))) / scale4
    print(json.dumps({"check": "int4_gemm",
                      "rel_err": err, "ok": err < 0.02}), flush=True)


if __name__ == "__main__":
    main()
