"""Decode-step epilogue ablation on the real chip (VERDICT r2 #4).

Times a k-step fused decode window over the qwen2.5-0.5B geometry with the
logits/sampling epilogue swapped between variants:
  full      — status quo: f32 [B, V] logits materialized, argmax
  noeplg    — no logits at all (forward-only floor)
  bf16      — bf16 [B, V] logits (downcast fused into the GEMM epilogue)
  chunked   — vocab-chunked running argmax, no [B, V] materialization

Prints one JSON line per variant. In-jit lax.scan repetition + device_get
(block_until_ready does not block through the axon tunnel).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CFG = {
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
B, K, CTX, PS = 64, 16, 160, 32


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.config.model_config import ModelConfig
    from sglang_fluentllm_tpu.mem.kv_cache import create_kv_cache
    from sglang_fluentllm_tpu.models import get_model_class
    from sglang_fluentllm_tpu.ops.attention.paged_backend import (
        PagedAttentionBackend,
    )
    from sglang_fluentllm_tpu.runtime.forward_batch import (
        ForwardBatch,
        ForwardMode,
    )

    cfg = ModelConfig.from_hf_dict(CFG)
    model = get_model_class(cfg.architectures)(cfg, PagedAttentionBackend())
    params = model.init_dummy_params(seed=0, dtype=jnp.bfloat16)
    Ppr = -(-(CTX + K) // PS)
    kv = create_kv_cache(cfg, (1 + B * Ppr + 8) * PS, dtype=jnp.bfloat16)

    pages = np.zeros((B, Ppr), np.int32)
    for i in range(B):
        pages[i] = 1 + i * Ppr + np.arange(Ppr)
    slots = np.zeros((B, K), np.int32)
    for i in range(B):
        for j in range(K):
            pos = CTX - 1 + j
            slots[i, j] = pages[i, pos // PS] * PS + pos % PS
    batch0 = ForwardBatch(
        input_ids=jnp.ones((B, 1), jnp.int32),
        positions=jnp.full((B, 1), CTX - 1, jnp.int32),
        out_cache_loc=jnp.asarray(slots),
        page_tables=jnp.asarray(pages),
        seq_lens=jnp.full((B,), CTX, jnp.int32),
        q_lens=jnp.ones((B,), jnp.int32),
        mode=ForwardMode.DECODE,
        page_size=PS,
        pages_are_runs=True,
    )

    V = cfg.vocab_size
    CH = 4096

    def make_window(variant):
        import dataclasses

        def one_step(params, carry, j):
            kv, ids = carry
            sub = dataclasses.replace(
                batch0,
                input_ids=ids[:, None],
                positions=(batch0.seq_lens - 1 + j)[:, None],
                out_cache_loc=jax.lax.dynamic_slice_in_dim(
                    batch0.out_cache_loc, j, 1, axis=1),
                seq_lens=batch0.seq_lens + j,
            )
            kv, h = model.forward(params, kv, sub)
            hl = h[:, 0]
            w = params["embed_tokens"].T
            if variant == "noeplg":
                new = (ids + jnp.sum(hl[:, :1]).astype(jnp.int32) % 7) % V
            elif variant == "full":
                lg = (hl @ w).astype(jnp.float32)
                new = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            elif variant == "bf16":
                lg = hl @ w  # stays bf16
                new = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            elif variant == "chunked":
                def vchunk(carry, c):
                    bv, bi = carry
                    wc = jax.lax.dynamic_slice_in_dim(w, c * CH, CH, axis=1)
                    lg = (hl @ wc).astype(jnp.float32)
                    m = jnp.max(lg, axis=-1)
                    a = jnp.argmax(lg, axis=-1).astype(jnp.int32) + c * CH
                    upd = m > bv
                    return (jnp.where(upd, m, bv),
                            jnp.where(upd, a, bi)), None

                (mv, mi), _ = jax.lax.scan(
                    vchunk,
                    (jnp.full((B,), -1e30, jnp.float32),
                     jnp.zeros((B,), jnp.int32)),
                    jnp.arange(V // CH, dtype=jnp.int32),
                )
                new = mi
            return (kv, new), new

        def window(params, kv, ids0):
            # params as ARG, not closure: closed-over weights bake into
            # the HLO as ~1 GB of literals and kill the remote compiler
            import functools

            (kv, last), all_ids = jax.lax.scan(
                functools.partial(one_step, params),
                (kv, ids0), jnp.arange(K, dtype=jnp.int32))
            return kv, all_ids

        return jax.jit(window, donate_argnums=(1,))

    ids0 = jnp.ones((B,), jnp.int32)
    variants = tuple(os.environ.get(
        "ABL_VARIANTS", "full,noeplg,bf16,chunked").split(","))
    for variant in variants:
        fn = make_window(variant)
        kv2 = create_kv_cache(cfg, (1 + B * Ppr + 8) * PS,
                              dtype=jnp.bfloat16)
        kv2, out = fn(params, kv2, ids0)
        jax.device_get(out)          # compile + settle
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            kv2, out = fn(params, kv2, ids0)
            jax.device_get(out)
            best = min(best, (time.perf_counter() - t0) / K)
        print(json.dumps({
            "variant": variant,
            "step_ms": round(best * 1e3, 3),
            "tok_s": round(B / best, 1),
        }))
        del fn


if __name__ == "__main__":
    main()
