"""DuoAttention tests: head-mask quantile oracle, full-head == dense
parity, streaming-head sink+window oracle, and engine invariants."""

import numpy as np
import pytest

from tests.utils import TINY_LLAMA_CFG, tiny_engine

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 17, 64, 99]
SP = {"max_new_tokens": 6, "temperature": 0.0}


def duo_cfg(head_scores, sink=2, recent=3, sparsity=0.5):
    return {
        **TINY_LLAMA_CFG,
        "duo_attention_config": {
            "sink_size": sink, "recent_size": recent,
            "sparsity": sparsity, "head_scores": head_scores,
        },
    }


class TestDuoOps:
    def test_head_mask_quantile(self):
        from sglang_fluentllm_tpu.ops.attention.duo import duo_head_mask

        scores = np.asarray([[0.1, 0.9], [0.5, 0.2]], np.float32)
        mask = duo_head_mask(scores, 0.5)
        assert mask.sum() == 2  # top half kept as full heads
        assert mask[0, 1] and mask[1, 0]

    def test_full_heads_equal_dense(self):
        from sglang_fluentllm_tpu.ops.attention.duo import duo_attend

        rng = np.random.RandomState(0)
        B, S, Hq, Hk, D = 1, 5, 4, 2, 8
        q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
        v = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
        pos = np.arange(S)[None].astype(np.int32)
        seq = np.asarray([S], np.int32)
        out = np.asarray(duo_attend(
            q, k, v, pos, seq, np.ones(Hk, bool), 1, 1, 0.5))
        G = Hq // Hk
        for t in range(S):
            for h in range(Hq):
                kv = h // G
                sc = (q[0, t, h] @ k[0, :t + 1, kv].T) * 0.5
                p = np.exp(sc - sc.max()); p /= p.sum()
                ref = p @ v[0, :t + 1, kv]
                np.testing.assert_allclose(out[0, t, h], ref,
                                           rtol=1e-5, atol=1e-5)

    def test_streaming_head_sink_window(self):
        from sglang_fluentllm_tpu.ops.attention.duo import duo_attend

        rng = np.random.RandomState(1)
        B, S, Hq, Hk, D = 1, 8, 2, 2, 4
        sink, recent = 2, 3
        q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
        v = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
        pos = np.arange(S)[None].astype(np.int32)
        seq = np.asarray([S], np.int32)
        out = np.asarray(duo_attend(
            q, k, v, pos, seq, np.zeros(Hk, bool), sink, recent, 0.5))
        for t in range(S):
            for h in range(Hq):
                keep = [tt for tt in range(t + 1)
                        if tt < sink or tt > t - recent]
                sc = (q[0, t, h] @ k[0, keep, h].T) * 0.5
                p = np.exp(sc - sc.max()); p /= p.sum()
                ref = p @ v[0, keep, h]
                np.testing.assert_allclose(out[0, t, h], ref,
                                           rtol=1e-5, atol=1e-5)


class TestDuoEngine:
    def test_all_full_matches_plain_llama(self):
        """sparsity=0 keeps every head full -> identical to plain ref."""
        base = tiny_engine()
        o1 = base.generate(input_ids=PROMPT, sampling_params=SP)
        e = tiny_engine(duo_cfg(
            head_scores=[[1.0, 1.0], [1.0, 1.0]], sparsity=0.0,
            sink=1, recent=1,
        ))
        from sglang_fluentllm_tpu.ops.attention.duo import (
            DuoAttentionBackend,
        )

        assert isinstance(e.runner.attn_backend, DuoAttentionBackend)
        o2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert o1["output_ids"] == o2["output_ids"]

    def test_mixed_heads_decode_matches_prefill(self):
        e = tiny_engine(duo_cfg(
            head_scores=[[0.9, 0.1], [0.2, 0.8]], sparsity=0.5,
            sink=2, recent=4,
        ))
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[4]
