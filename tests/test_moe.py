"""MoE router + grouped expert computation vs a naive per-token loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.ops.moe.topk import select_experts


def mk_config(**kw):
    base = dict(
        architectures=["X"], model_type="deepseek_v2", hidden_size=32,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        head_dim=8, intermediate_size=64, vocab_size=100,
        max_position_embeddings=128,
    )
    cfg = ModelConfig(**base)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def naive_moe(x, logits, w1, w2, topk_w, topk_ids):
    T, H = x.shape
    out = np.zeros((T, H), np.float32)
    for t in range(T):
        for k in range(topk_ids.shape[1]):
            e = int(topk_ids[t, k])
            w = float(topk_w[t, k])
            h = x[t].astype(np.float32) @ w1[e].astype(np.float32)
            gate, up = np.split(h, 2)
            act = gate / (1 + np.exp(-gate)) * up
            out[t] += w * (act @ w2[e].astype(np.float32))
    return out


class TestTopK:
    def test_softmax_greedy(self):
        cfg = mk_config(num_experts=8, num_experts_per_tok=2,
                        norm_topk_prob=True)
        logits = jnp.asarray(np.random.RandomState(0).standard_normal((5, 8)),
                             jnp.float32)
        w, ids = select_experts(logits, cfg)
        assert w.shape == (5, 2) and ids.shape == (5, 2)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, rtol=1e-5)
        # ids are argmax-ordered
        probs = np.asarray(jax.nn.softmax(logits, -1))
        assert (np.asarray(ids)[:, 0] == probs.argmax(-1)).all()

    def test_group_limited(self):
        cfg = mk_config(num_experts=8, num_experts_per_tok=2,
                        topk_method="group_limited_greedy", n_group=4,
                        topk_group=1, norm_topk_prob=False)
        logits = jnp.asarray(np.random.RandomState(1).standard_normal((6, 8)),
                             jnp.float32)
        _, ids = select_experts(logits, cfg)
        ids = np.asarray(ids)
        # both selected experts must come from the same (winning) group of 2
        assert ((ids[:, 0] // 2) == (ids[:, 1] // 2)).all()

    def test_noaux_tc_bias_changes_selection(self):
        cfg = mk_config(num_experts=8, num_experts_per_tok=1,
                        topk_method="noaux_tc", scoring_func="sigmoid",
                        norm_topk_prob=False)
        logits = jnp.zeros((4, 8), jnp.float32)
        bias = jnp.asarray(np.eye(8)[3] * 10, jnp.float32)
        w, ids = select_experts(logits, cfg, correction_bias=bias)
        assert (np.asarray(ids) == 3).all()
        # weights use raw (uncorrected) scores
        np.testing.assert_allclose(np.asarray(w), 0.5, rtol=1e-5)


class TestMoELayer:
    @pytest.mark.parametrize("zero_experts", [0, 2])
    def test_matches_naive(self, zero_experts):
        E, H, I, T, K = 4, 32, 64, 10, 2
        cfg = mk_config(num_experts=E, num_experts_per_tok=K,
                        moe_intermediate_size=I, norm_topk_prob=True,
                        num_zero_experts=zero_experts)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        logits = jnp.asarray(
            rng.standard_normal((T, E + zero_experts)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                         jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)

        out = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)

        topk_w, topk_ids = select_experts(logits, cfg)
        topk_w, topk_ids = np.asarray(topk_w), np.asarray(topk_ids)
        ref = np.zeros((T, H), np.float32)
        for t in range(T):
            for k in range(K):
                e = int(topk_ids[t, k])
                w = float(topk_w[t, k])
                if e >= E:  # zero expert: identity contribution
                    ref[t] += w * np.asarray(x[t], np.float32)
                    continue
                h = np.asarray(x[t], np.float32) @ np.asarray(w1[e])
                gate, up = np.split(h, 2)
                act = gate / (1 + np.exp(-gate)) * up
                ref[t] += w * (act @ np.asarray(w2[e]))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                                   atol=2e-4)

    def test_gmm_matches_fallback(self):
        """megablox grouped GEMM path == gather fallback (interpret mode)."""
        E, H, I, T, K = 4, 128, 128, 16, 2
        cfg = mk_config(num_experts=E, num_experts_per_tok=K,
                        moe_intermediate_size=I, norm_topk_prob=True)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                         jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
        ref = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)
        import sglang_fluentllm_tpu.ops.moe.layer as ml
        orig = ml._gmm
        try:
            ml._gmm = lambda lhs, rhs, gs: orig(lhs, rhs, gs, interpret=True)
            out = moe_forward(x, logits, w1, w2, cfg, use_gmm=True)
        finally:
            ml._gmm = orig
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
