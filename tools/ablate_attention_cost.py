"""Isolate the per-step cost of the paged decode attention kernel chain
(24 layers x fused KV write) at the bench geometry — the remaining
unexplained decode-step time after the GEMM-chain ablation
(tools/ablate_gemm_chain.py)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, K, CTX, PS, L = 64, 8, 160, 32, 24
HQ, HKV, D = 14, 2, 64


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.config.model_config import ModelConfig
    from sglang_fluentllm_tpu.mem.kv_cache import create_kv_cache
    from sglang_fluentllm_tpu.ops.attention.paged_backend import (
        PagedAttentionBackend,
    )
    from sglang_fluentllm_tpu.runtime.forward_batch import (
        ForwardBatch,
        ForwardMode,
    )

    cfg = ModelConfig.from_hf_dict({
        "architectures": ["Qwen2ForCausalLM"], "model_type": "qwen2",
        "hidden_size": HQ * D, "intermediate_size": 128,
        "num_attention_heads": HQ, "num_key_value_heads": HKV,
        "num_hidden_layers": L, "vocab_size": 128,
        "max_position_embeddings": 32768,
    })
    Ppr = -(-(CTX + K) // PS)
    kv = create_kv_cache(cfg, (1 + B * Ppr + 8) * PS, dtype=jnp.bfloat16)
    backend = PagedAttentionBackend()

    pages = np.zeros((B, Ppr), np.int32)
    for i in range(B):
        pages[i] = 1 + i * Ppr + np.arange(Ppr)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)) * 0.1, jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, 1, HKV, D)) * 0.1, jnp.bfloat16)

    def window(kv, q, kn):
        def step(carry, j):
            kv, x = carry
            pos = CTX - 1 + j
            slot = (
                jnp.asarray(pages)[:, pos // PS] * PS + pos % PS
            )[:, None]
            fb = ForwardBatch(
                input_ids=jnp.zeros((B, 1), jnp.int32),
                positions=jnp.full((B, 1), pos, jnp.int32),
                out_cache_loc=slot,
                page_tables=jnp.asarray(pages),
                seq_lens=jnp.full((B,), CTX + j, jnp.int32),
                q_lens=jnp.ones((B,), jnp.int32),
                mode=ForwardMode.DECODE,
                page_size=PS,
                pages_are_runs=True,
            )

            def layer(carry2, lid):
                kv, x = carry2
                out, kv = backend(kv, lid, x[0], x[1], x[2], fb, 0.125)
                return (kv, x), jnp.sum(out.astype(jnp.float32))

            (kv, _), sums = jax.lax.scan(
                layer, (kv, x), jnp.arange(L, dtype=jnp.int32)
            )
            return (kv, x), jnp.sum(sums)

        (kv, _), s = jax.lax.scan(
            step, (kv, (q, kn, kn)), jnp.arange(K, dtype=jnp.int32)
        )
        return kv, jnp.sum(s)

    fn = jax.jit(window, donate_argnums=(0,))
    kv, out = fn(kv, q, kn)
    jax.device_get(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        kv, out = fn(kv, q, kn)
        jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / K)
    print(json.dumps({
        "metric": "attention_chain_step_ms",
        "value": round(best * 1e3, 3),
        "detail": {"layers": L, "batch": B, "ctx": CTX, "window": K},
    }))


if __name__ == "__main__":
    main()
