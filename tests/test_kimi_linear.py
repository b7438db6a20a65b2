"""Kimi-Linear (KDA hybrid) tests.

``kda_delta_rule`` is checked against an independent numpy oracle that
transcribes the reference Triton kernel math
(``fla/fused_recurrent.py`` with IS_KDA: per-key-channel decay);
engine-level invariants (decode == prefill, chunked == unchunked,
request isolation) then validate the full serving path, since
transformers has no KimiLinear implementation to diff against.
"""

import numpy as np
import pytest

from tests.utils import tiny_engine

TINY_KIMI_CFG = {
    "architectures": ["KimiLinearForCausalLM"],
    "model_type": "kimi_linear",
    "hidden_size": 64,
    "intermediate_size": 96,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "num_hidden_layers": 2,
    "vocab_size": 128,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "q_lora_rank": 48,
    "kv_lora_rank": 64,
    "qk_nope_head_dim": 32,
    "qk_rope_head_dim": 16,
    "v_head_dim": 32,
    "mla_use_nope": True,
    "num_experts": 4,
    "num_experts_per_token": 2,
    "moe_intermediate_size": 32,
    "num_shared_experts": 1,
    "first_k_dense_replace": 0,
    "moe_renormalize": True,
    "moe_router_activation_func": "sigmoid",
    "num_expert_group": 2,
    "topk_group": 1,
    "linear_attn_config": {
        "kda_layers": [1],
        "full_attn_layers": [2],
        "num_heads": 2,
        "head_dim": 8,
        "short_conv_kernel_size": 4,
    },
    "tie_word_embeddings": False,
}

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23]
SP = {"max_new_tokens": 6, "temperature": 0.0}


def kda_oracle(q, k, v, g, beta, state):
    """Reference Triton kernel math, straight-line numpy."""
    B, S, H, Dk = q.shape
    Dv = v.shape[-1]
    st = state.astype(np.float64).copy()
    out = np.zeros((B, S, H, Dv))
    scale = Dk ** -0.5
    for b in range(B):
        for t in range(S):
            for h in range(H):
                qt = q[b, t, h] / np.sqrt((q[b, t, h] ** 2).sum() + 1e-6)
                kt = k[b, t, h] / np.sqrt((k[b, t, h] ** 2).sum() + 1e-6)
                qt = qt * scale
                st[b, h] *= np.exp(g[b, t, h])[:, None]
                kv_mem = (st[b, h] * kt[:, None]).sum(0)
                delta = (v[b, t, h] - kv_mem) * beta[b, t, h]
                st[b, h] += kt[:, None] * delta[None, :]
                out[b, t, h] = (st[b, h] * qt[:, None]).sum(0)
    return out, st


class TestKdaOp:
    def test_matches_oracle(self):
        from sglang_fluentllm_tpu.ops.linear_attn import kda_delta_rule

        rng = np.random.RandomState(0)
        B, S, H, Dk, Dv = 2, 9, 3, 8, 8
        q = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
        k = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
        v = rng.standard_normal((B, S, H, Dv)).astype(np.float32)
        g = -np.abs(rng.standard_normal((B, S, H, Dk))).astype(
            np.float32) * 0.3
        beta = (1 / (1 + np.exp(-rng.standard_normal((B, S, H))))
                ).astype(np.float32)
        st0 = rng.standard_normal((B, H, Dk, Dv)).astype(np.float32) * 0.1
        out, st = kda_delta_rule(q, k, v, g, beta, st0)
        ref_out, ref_st = kda_oracle(q, k, v, g, beta, st0)
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(st), ref_st,
                                   rtol=1e-4, atol=1e-4)

    def test_ragged_q_len(self):
        from sglang_fluentllm_tpu.ops.linear_attn import kda_delta_rule

        rng = np.random.RandomState(1)
        B, S, H, Dk, Dv = 2, 8, 2, 4, 4
        q = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
        k = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
        v = rng.standard_normal((B, S, H, Dv)).astype(np.float32)
        g = -np.abs(rng.standard_normal((B, S, H, Dk))).astype(
            np.float32) * 0.2
        beta = np.full((B, S, H), 0.7, np.float32)
        zero = np.zeros((B, H, Dk, Dv), np.float32)
        q_len = np.asarray([8, 5], np.int32)
        _, st = kda_delta_rule(q, k, v, g, beta, zero, q_len=q_len)
        _, st_row1 = kda_delta_rule(
            q[1:, :5], k[1:, :5], v[1:, :5], g[1:, :5], beta[1:, :5],
            zero[1:])
        np.testing.assert_allclose(np.asarray(st)[1],
                                   np.asarray(st_row1)[0],
                                   rtol=1e-5, atol=1e-5)


class TestKimiEngine:
    def test_generates_deterministically(self):
        e = tiny_engine(TINY_KIMI_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert len(out["output_ids"]) == 6
        out2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert out["output_ids"] == out2["output_ids"]

    def test_decode_matches_prefill(self):
        e = tiny_engine(TINY_KIMI_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[4]

    def test_chunked_prefill_matches_unchunked(self):
        long_prompt = [int(x) for x in
                       np.random.RandomState(0).randint(1, 127, 40)]
        e1 = tiny_engine(TINY_KIMI_CFG)
        o1 = e1.generate(input_ids=long_prompt, sampling_params=SP)
        e2 = tiny_engine(TINY_KIMI_CFG, chunked_prefill_size=16)
        o2 = e2.generate(input_ids=long_prompt, sampling_params=SP)
        assert o1["output_ids"] == o2["output_ids"]

    def test_batch_isolation(self):
        e = tiny_engine(TINY_KIMI_CFG)
        p1, p2 = [3, 11, 42, 7], [88, 5, 23, 54, 17]
        solo1 = e.generate(input_ids=p1, sampling_params=SP)
        solo2 = e.generate(input_ids=p2, sampling_params=SP)
        both = e.generate(input_ids=[p1, p2], sampling_params=SP)
        assert both[0]["output_ids"] == solo1["output_ids"]
        assert both[1]["output_ids"] == solo2["output_ids"]
