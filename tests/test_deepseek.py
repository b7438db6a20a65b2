"""DeepSeek-V2 MLA+MoE end-to-end on the tiny config (CPU jax).

Covers: MLA normal (prefill) + absorbed (decode) paths over the compressed
KV cache, dense-replace layer + MoE tower, FP8 per-token KV variant.
"""

import numpy as np
import pytest

from tests.utils import TINY_DEEPSEEK_CFG, tiny_engine

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 17]


@pytest.fixture(scope="module")
def engine():
    return tiny_engine(TINY_DEEPSEEK_CFG)


class TestDeepseekV2:
    def test_greedy_generation(self, engine):
        out = engine.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 8

    def test_greedy_deterministic(self, engine):
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        o1 = engine.generate(input_ids=PROMPT, sampling_params=sp)
        o2 = engine.generate(input_ids=PROMPT, sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]

    def test_decode_matches_prefill_logits(self, engine):
        """Absorbed decode continuation == one-shot prefill over the same
        tokens (normal path): generate 4, then re-prefill prompt+3 and the
        4th token must match."""
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        out = engine.generate(input_ids=PROMPT, sampling_params=sp)
        toks = out["output_ids"]
        engine.flush_cache()
        out2 = engine.generate(
            input_ids=PROMPT + toks[:3],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[3]

    def test_batch(self, engine):
        outs = engine.generate(
            input_ids=[PROMPT, PROMPT[:4], list(range(20))],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )
        assert all(len(o["output_ids"]) == 5 for o in outs)


class TestDeepseekFP8KV:
    def test_fp8_kv_close_to_bf16(self):
        sp = {"max_new_tokens": 8, "temperature": 0.0}
        e_ref = tiny_engine(TINY_DEEPSEEK_CFG)
        ref = e_ref.generate(input_ids=PROMPT, sampling_params=sp,
                             return_logprob=True)
        e_fp8 = tiny_engine(TINY_DEEPSEEK_CFG, kv_cache_dtype="fp8_e4m3")
        got = e_fp8.generate(input_ids=PROMPT, sampling_params=sp,
                             return_logprob=True)
        # same greedy tokens for a few steps; logprobs close
        assert got["output_ids"][:4] == ref["output_ids"][:4]

    def test_fp8_pool_layout(self):
        from sglang_fluentllm_tpu.mem.kv_cache import MLAKVCacheFP8

        e = tiny_engine(TINY_DEEPSEEK_CFG, kv_cache_dtype="fp8_e4m3")
        kv = e.runner.kv_cache
        assert isinstance(kv, MLAKVCacheFP8)
        assert kv.ckv.dtype.name == "float8_e4m3fn"
        # packed tail: [rope | scale_hi | scale_lo] per token (TPU DMA
        # lane-rule adaptation of the reference fp8+f32+bf16 triple)
        assert kv.tail.dtype.name == "bfloat16"
        from sglang_fluentllm_tpu.mem.kv_cache import fp8_tail_dim
        assert kv.tail.shape[-1] == fp8_tail_dim(
            e.model_config.qk_rope_head_dim)


class TestMLAPagedBackend:
    def test_mla_paged_decode_matches_ref(self):
        """MLAPagedBackend (pipelined kernel in interpret mode) ==
        RefMLABackend greedily."""
        from jax.experimental.pallas import tpu as pltpu

        sp = {"max_new_tokens": 6, "temperature": 0.0}
        e_ref = tiny_engine(TINY_DEEPSEEK_CFG)
        ref = e_ref.generate(input_ids=PROMPT, sampling_params=sp)
        e_k = tiny_engine(TINY_DEEPSEEK_CFG, attention_backend="mla_paged")
        with pltpu.force_tpu_interpret_mode():
            out = e_k.generate(input_ids=PROMPT, sampling_params=sp)
        assert out["output_ids"] == ref["output_ids"]

    def test_mla_paged_fp8_decode_matches_ref(self):
        """FP8 fused-dequant kernel (interpret mode) == ref fp8 path."""
        from jax.experimental.pallas import tpu as pltpu

        sp = {"max_new_tokens": 6, "temperature": 0.0}
        e_ref = tiny_engine(TINY_DEEPSEEK_CFG, kv_cache_dtype="fp8_e4m3")
        ref = e_ref.generate(input_ids=PROMPT, sampling_params=sp)
        e_k = tiny_engine(TINY_DEEPSEEK_CFG, kv_cache_dtype="fp8_e4m3",
                          attention_backend="mla_paged")
        with pltpu.force_tpu_interpret_mode():
            out = e_k.generate(input_ids=PROMPT, sampling_params=sp)
        assert out["output_ids"] == ref["output_ids"]


class TestMLAFlashExtend:
    def test_mla_extend_flash_matches_ref(self):
        """MLAPagedBackend extend (latent decompress + dense flash kernel)
        == RefMLABackend normal path, incl. a radix-prefix row."""
        from jax.experimental.pallas import tpu as pltpu
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.mem.kv_cache import (
            MLAKVCache, padded_head_dim,
        )
        from sglang_fluentllm_tpu.ops.attention.mla_paged_backend import (
            MLAPagedBackend,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            RefMLABackend,
        )
        from sglang_fluentllm_tpu.runtime.forward_batch import (
            ForwardBatch, ForwardMode,
        )

        rng = np.random.RandomState(3)
        B, S, H, dn, dr, r, dv, ps, L = 2, 24, 4, 32, 16, 64, 32, 8, 2
        seqs = [40, 24]
        qls = [24, 24]  # row 0 has a 16-token cached prefix
        P = max(-(-s // ps) for s in seqs)
        num_pages = B * P + 1 + 16
        pt = np.zeros((B, P), np.int32)
        out_loc = np.zeros((B, S), np.int32)
        nxt = 1
        for i, (sl_i, ql_i) in enumerate(zip(seqs, qls)):
            npg = -(-sl_i // ps)
            pt[i, :npg] = np.arange(nxt, nxt + npg)
            nxt += npg
            prefix = sl_i - ql_i
            for j in range(ql_i):
                pos = prefix + j
                out_loc[i, j] = pt[i, pos // ps] * ps + pos % ps

        r_pad = padded_head_dim(r)
        Dl = r_pad + padded_head_dim(dr)
        lat = rng.standard_normal(
            (L, num_pages * ps, Dl)
        ).astype(np.float32) * 0.3
        lat[:, :ps] = 0
        batch = ForwardBatch(
            input_ids=jnp.zeros((B, S), jnp.int32),
            positions=jnp.zeros((B, S), jnp.int32),
            out_cache_loc=jnp.asarray(out_loc),
            page_tables=jnp.asarray(pt),
            seq_lens=jnp.asarray(np.asarray(seqs, np.int32)),
            q_lens=jnp.asarray(np.asarray(qls, np.int32)),
            mode=ForwardMode.EXTEND,
            page_size=ps,
            pages_are_runs=True,
        )
        q_nope = rng.standard_normal((B, S, H, dn)).astype(np.float32)
        q_pe = rng.standard_normal((B, S, H, dr)).astype(np.float32)
        ckv_new = rng.standard_normal((B, S, r)).astype(np.float32) * 0.3
        kpe_new = rng.standard_normal((B, S, dr)).astype(np.float32) * 0.3
        w_kc = rng.standard_normal((H, r, dn)).astype(np.float32) * 0.2
        w_vc = rng.standard_normal((H, r, dv)).astype(np.float32) * 0.2
        sm = 1.0 / np.sqrt(dn + dr)

        args = (
            1, jnp.asarray(q_nope), jnp.asarray(q_pe),
            jnp.asarray(ckv_new), jnp.asarray(kpe_new), batch,
            jnp.asarray(w_kc), jnp.asarray(w_vc), sm,
        )
        ref_out, _ = RefMLABackend()(
            MLAKVCache(lat=jnp.asarray(lat)), *args
        )
        with pltpu.force_tpu_interpret_mode():
            out, _ = MLAPagedBackend()(
                MLAKVCache(lat=jnp.asarray(lat)), *args
            )
        for i, ql_i in enumerate(qls):
            np.testing.assert_allclose(
                np.asarray(out)[i, :ql_i], np.asarray(ref_out)[i, :ql_i],
                rtol=2e-4, atol=2e-4,
            )
