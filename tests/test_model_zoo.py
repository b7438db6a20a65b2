"""Engine smoke tests across the model zoo (one per architecture family)."""

import numpy as np
import pytest

from tests.utils import tiny_engine

PROMPT = [3, 11, 42, 7, 19]
SP = {"max_new_tokens": 5, "temperature": 0.0}

BASE = dict(
    hidden_size=64, intermediate_size=128, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, vocab_size=128,
    max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
    tie_word_embeddings=False,
)

CONFIGS = {
    "qwen2moe": {
        **BASE, "architectures": ["Qwen2MoeForCausalLM"],
        "model_type": "qwen2_moe", "num_experts": 4,
        "num_experts_per_tok": 2, "moe_intermediate_size": 32,
        "shared_expert_intermediate_size": 64, "norm_topk_prob": False,
    },
    "qwen3moe": {
        **BASE, "architectures": ["Qwen3MoeForCausalLM"],
        "model_type": "qwen3_moe", "num_experts": 4,
        "num_experts_per_tok": 2, "moe_intermediate_size": 32,
        "norm_topk_prob": True, "head_dim": 16,
    },
    "gemma": {
        **BASE, "architectures": ["GemmaForCausalLM"],
        "model_type": "gemma", "tie_word_embeddings": True,
        "head_dim": 16, "hidden_act": "gelu_pytorch_tanh",
    },
    "gemma2": {
        **BASE, "architectures": ["Gemma2ForCausalLM"],
        "model_type": "gemma2", "tie_word_embeddings": True,
        "head_dim": 16, "query_pre_attn_scalar": 16,
        "attn_logit_softcapping": 50.0, "final_logit_softcapping": 30.0,
        "hidden_act": "gelu_pytorch_tanh",
    },
    "phi3": {
        **BASE, "architectures": ["Phi3ForCausalLM"], "model_type": "phi3",
    },
    "internlm2": {
        **BASE, "architectures": ["InternLM2ForCausalLM"],
        "model_type": "internlm2",
    },
    "baichuan": {
        **BASE, "architectures": ["BaichuanForCausalLM"],
        "model_type": "baichuan", "num_key_value_heads": 4,
    },
    "exaone": {
        **BASE, "architectures": ["ExaoneForCausalLM"],
        "model_type": "exaone",
    },
    "granite": {
        **BASE, "architectures": ["GraniteForCausalLM"],
        "model_type": "granite", "embedding_multiplier": 12.0,
        "residual_multiplier": 0.22, "logits_scaling": 8.0,
        "attention_multiplier": 0.25,
    },
    "minicpm": {
        **BASE, "architectures": ["MiniCPMForCausalLM"],
        "model_type": "minicpm", "scale_emb": 12.0, "scale_depth": 1.4,
        "dim_model_base": 32,
    },
    "olmo2": {
        **BASE, "architectures": ["Olmo2ForCausalLM"],
        "model_type": "olmo2",
    },
    "commandr": {
        **BASE, "architectures": ["CohereForCausalLM"],
        "model_type": "cohere", "layer_norm_eps": 1e-5,
        "logit_scale": 0.25, "tie_word_embeddings": True,
    },
    "qwen3_next": {
        **BASE, "architectures": ["Qwen3NextForCausalLM"],
        "model_type": "qwen3_next", "head_dim": 16,
        "num_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 32,
        "shared_expert_intermediate_size": 32,
        "linear_num_key_heads": 2, "linear_num_value_heads": 4,
        "linear_key_head_dim": 8, "linear_value_head_dim": 8,
        "linear_conv_kernel_dim": 4,
        "full_attention_interval": 2, "partial_rotary_factor": 0.25,
        "layer_types": ["linear_attention", "full_attention"],
        "norm_topk_prob": True,
    },
    "glm4_moe": {
        **BASE, "architectures": ["Glm4MoeForCausalLM"],
        "model_type": "glm4_moe", "head_dim": 16,
        "n_routed_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 32, "n_shared_experts": 1,
        "first_k_dense_replace": 1, "n_group": 2, "topk_group": 1,
        "routed_scaling_factor": 1.5, "norm_topk_prob": True,
        "use_qk_norm": True, "attention_bias": True,
        "partial_rotary_factor": 0.5,
    },
    "gpt_oss": {
        **BASE, "architectures": ["GptOssForCausalLM"],
        "model_type": "gpt_oss", "head_dim": 16,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "sliding_window": 8,
        "layer_types": ["sliding_attention", "full_attention"],
        "swiglu_limit": 7.0,
    },
    "longcat_large": {
        **BASE, "architectures": ["LlamaForCausalLMMoE"],
        "model_type": "llama",
        "num_experts": [None, 4], "moe_topk": 2,
        "moe_intermediate_size": 32, "router_dtype": "float32",
        "norm_topk_prob": True, "scoring_func": "softmax",
    },
    "grok": {
        **BASE, "architectures": ["Grok1ForCausalLM"],
        "model_type": "grok-1", "head_dim": 16,
        "num_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 32,
        "attn_logit_softcapping": 30.0,
        "router_logit_softcapping": 30.0,
        "embedding_multiplier_scale": 78.38,
        "output_multiplier_scale": 0.5773,
    },
    "gpt2": {
        "architectures": ["GPT2LMHeadModel"], "model_type": "gpt2",
        "n_embd": 64, "n_head": 4, "n_layer": 2, "n_positions": 256,
        "vocab_size": 128, "layer_norm_epsilon": 1e-5,
        "hidden_size": 64, "num_attention_heads": 4,
        "num_hidden_layers": 2, "num_key_value_heads": 4,
        "max_position_embeddings": 256,
    },
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_arch_generates(name):
    e = tiny_engine(CONFIGS[name])
    out = e.generate(input_ids=PROMPT, sampling_params=SP)
    assert len(out["output_ids"]) == 5
    # determinism
    out2 = e.generate(input_ids=PROMPT, sampling_params=SP)
    assert out["output_ids"] == out2["output_ids"]


def test_registry_coverage():
    from sglang_fluentllm_tpu.models.registry import _REGISTRY, get_model_class

    get_model_class(["LlamaForCausalLM"])  # trigger imports
    expected = {
        "LlamaForCausalLM", "MistralForCausalLM", "Qwen2ForCausalLM",
        "Qwen3ForCausalLM", "DeepseekV2ForCausalLM",
        "DeepseekV3ForCausalLM", "Qwen2MoeForCausalLM",
        "Qwen3MoeForCausalLM", "GemmaForCausalLM", "Gemma2ForCausalLM",
        "GPT2LMHeadModel", "Phi3ForCausalLM", "InternLM2ForCausalLM",
        "BaichuanForCausalLM", "ExaoneForCausalLM", "GraniteForCausalLM",
        "MiniCPMForCausalLM", "Olmo2ForCausalLM", "CohereForCausalLM",
        "Cohere2ForCausalLM", "MistralForCausalLM", "GptOssForCausalLM",
        "Glm4MoeForCausalLM", "Qwen3NextForCausalLM",
        "KimiLinearForCausalLM", "LlamaForCausalLMMoE",
        "Grok1ForCausalLM", "ShortcutMoEForCausalLM",
        "DeepseekMhaNsaForCausalLM", "Qwen3NSAForCausalLM",
        "LlamaForSequenceClassification",
    }
    assert expected <= set(_REGISTRY)


LONGCAT_CFG = {
    "architectures": ["FLASHForCausalLM"],
    "model_type": "longcat_flash",
    "hidden_size": 64,
    "ffn_hidden_size": 96,
    "expert_ffn_hidden_size": 48,
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
    "n_routed_experts": 4,
    "moe_topk": 2,
    "zero_expert_num": 2,
    "norm_topk_prob": False,
    "scoring_func": "softmax",
    "topk_method": "noaux_tc",
    "tie_word_embeddings": False,
}


LONGCAT_ULTRA_CFG = {
    "architectures": ["ShortcutMoEForCausalLM"],
    "model_type": "shortcut_moe",
    "hidden_size": 64,
    "intermediate_size": 96,
    "expert_ffn_hidden_size": 48,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 2,
    "vocab_size": 128,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "n_routed_experts": 4,
    "moe_topk": 2,
    "zero_expert_num": 2,
    "norm_topk_prob": False,
    "scoring_func": "softmax",
    "topk_method": "noaux_tc",
    "tie_word_embeddings": False,
}


class TestLongcatUltra:
    def test_scmoe_gqa_generates(self):
        e = tiny_engine(LONGCAT_ULTRA_CFG)
        assert e.model_config.num_kv_layers == 4
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert len(out["output_ids"]) == 5
        out2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert out["output_ids"] == out2["output_ids"]

    def test_decode_matches_prefill(self):
        e = tiny_engine(LONGCAT_ULTRA_CFG)
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        out = e.generate(input_ids=PROMPT, sampling_params=sp)
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:3],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[3]


class TestLongcatFlash:
    def test_scmoe_generates(self):
        e = tiny_engine(LONGCAT_CFG)
        # KV pool depth doubled (2 attentions per ScMoE layer)
        assert e.model_config.num_kv_layers == 4
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert len(out["output_ids"]) == 5
        out2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert out["output_ids"] == out2["output_ids"]

    def test_scmoe_decode_matches_prefill(self):
        e = tiny_engine(LONGCAT_CFG)
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        out = e.generate(input_ids=PROMPT, sampling_params=sp)
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:3],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[3]


class TestQwen3NextHybrid:
    """Hybrid GDN state-pool behaviors beyond single-request greedy."""

    def test_chunked_prefill_matches_unchunked(self):
        long_prompt = [int(x) for x in
                       np.random.RandomState(0).randint(1, 127, 40)]
        e1 = tiny_engine(CONFIGS["qwen3_next"])
        o1 = e1.generate(input_ids=long_prompt, sampling_params=SP)
        e2 = tiny_engine(CONFIGS["qwen3_next"], chunked_prefill_size=16)
        o2 = e2.generate(input_ids=long_prompt, sampling_params=SP)
        assert o1["output_ids"] == o2["output_ids"]

    def test_concurrent_requests_isolated_state(self):
        e = tiny_engine(CONFIGS["qwen3_next"])
        p1, p2 = [3, 11, 42, 7], [88, 5, 23, 54, 17]
        solo1 = e.generate(input_ids=p1, sampling_params=SP)
        solo2 = e.generate(input_ids=p2, sampling_params=SP)
        both = e.generate(input_ids=[p1, p2],
                          sampling_params=SP)
        assert both[0]["output_ids"] == solo1["output_ids"]
        assert both[1]["output_ids"] == solo2["output_ids"]

    def test_radix_forced_off(self):
        e = tiny_engine(CONFIGS["qwen3_next"])
        assert e.server_args.disable_radix_cache is True
        out = e.generate(input_ids=[3, 11, 42, 7, 19], sampling_params=SP)
        # repeat: no prefix cache, but deterministic
        out2 = e.generate(input_ids=[3, 11, 42, 7, 19], sampling_params=SP)
        assert out["output_ids"] == out2["output_ids"]
        assert out2["meta_info"]["cached_tokens"] == 0


class TestQwen1:
    """Qwen-1 legacy arch (reference srt/models/qwen.py)."""

    CFG = {
        "architectures": ["QWenLMHeadModel"],
        "model_type": "qwen",
        "hidden_size": 64,
        "intermediate_size": 256,     # 2x the true MLP width
        "num_attention_heads": 4,
        "num_hidden_layers": 2,
        "vocab_size": 128,
        "seq_length": 256,
        "layer_norm_epsilon": 1e-6,
        "rotary_emb_base": 10000.0,
        "no_bias": True,
        "tie_word_embeddings": False,
    }

    def test_generates(self):
        e = tiny_engine(self.CFG)
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        a = e.generate(input_ids=[3, 9, 27], sampling_params=sp)
        b = e.generate(input_ids=[3, 9, 27], sampling_params=sp)
        assert a["output_ids"] == b["output_ids"]
        assert len(a["output_ids"]) == 5

    def test_checkpoint_name_mapping(self):
        """transformer.h c_attn/w1/w2 checkpoints land in the llama
        parameter layout (fused qkv split + gate/up order)."""
        import numpy as np

        e = tiny_engine(self.CFG)
        model = e.runner.model
        c = e.runner.model_config
        assert c.intermediate_size == 128       # halved at parse
        rng = np.random.RandomState(0)
        H, I, V, L = 64, 128, 128, 2
        named = [("transformer.wte.weight",
                  rng.standard_normal((V, H)).astype(np.float32)),
                 ("transformer.ln_f.weight", np.ones(H, np.float32)),
                 ("lm_head.weight",
                  rng.standard_normal((V, H)).astype(np.float32))]
        gate = {}
        for i in range(L):
            pre = f"transformer.h.{i}."
            named += [
                (pre + "ln_1.weight", np.ones(H, np.float32)),
                (pre + "ln_2.weight", np.ones(H, np.float32)),
                (pre + "attn.c_attn.weight",
                 rng.standard_normal((3 * H, H)).astype(np.float32)),
                (pre + "attn.c_attn.bias",
                 rng.standard_normal((3 * H,)).astype(np.float32)),
                (pre + "attn.c_proj.weight",
                 rng.standard_normal((H, H)).astype(np.float32)),
                (pre + "mlp.w1.weight",
                 rng.standard_normal((I, H)).astype(np.float32)),
                (pre + "mlp.w2.weight",
                 rng.standard_normal((I, H)).astype(np.float32)),
                (pre + "mlp.c_proj.weight",
                 rng.standard_normal((H, I)).astype(np.float32)),
            ]
            gate[i] = named[-2][1]              # w2 = gate
        params = model.load_weights(named, dtype=np.float32)
        import numpy as np

        got_gate = np.asarray(params["layers"]["gate_proj"][0])
        np.testing.assert_allclose(got_gate, gate[0].T, rtol=1e-6)
