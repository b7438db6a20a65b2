"""Test helpers: tiny model configs + engine fixtures.

Analog of the reference's ``sglang.test.test_utils`` harness (SURVEY §4 —
the reference's tests import popen_launch_server/DEFAULT_*_MODEL helpers).
"""

from __future__ import annotations

import json
import os
import tempfile

TINY_LLAMA_CFG = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 2,
    "vocab_size": 128,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "torch_dtype": "float32",
}

TINY_QWEN2_CFG = {
    **TINY_LLAMA_CFG,
    "architectures": ["Qwen2ForCausalLM"],
    "model_type": "qwen2",
    "attention_bias": True,
}

TINY_QWEN3_CFG = {
    **TINY_LLAMA_CFG,
    "architectures": ["Qwen3ForCausalLM"],
    "model_type": "qwen3",
    "head_dim": 16,
}

TINY_DEEPSEEK_CFG = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "model_type": "deepseek_v2",
    "hidden_size": 64,
    "intermediate_size": 128,
    "moe_intermediate_size": 64,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "num_hidden_layers": 3,
    "vocab_size": 128,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "q_lora_rank": None,
    "kv_lora_rank": 64,
    "qk_nope_head_dim": 32,
    "qk_rope_head_dim": 16,
    "v_head_dim": 32,
    "n_routed_experts": 4,
    "num_experts_per_tok": 2,
    "n_shared_experts": 1,
    "first_k_dense_replace": 1,
    "moe_layer_freq": 1,
    "routed_scaling_factor": 1.0,
    "topk_method": "greedy",
    "norm_topk_prob": False,
    "scoring_func": "softmax",
    "tie_word_embeddings": False,
}


def write_model_dir(cfg: dict, tmpdir: str | None = None) -> str:
    d = tmpdir or tempfile.mkdtemp(prefix="sft_model_")
    with open(os.path.join(d, "config.json"), "w") as fp:
        json.dump(cfg, fp)
    return d


def tiny_engine(cfg=None, model_path_override=None, **kwargs):
    from sglang_fluentllm_tpu.engine import Engine

    model_dir = model_path_override or write_model_dir(cfg or TINY_LLAMA_CFG)
    defaults = dict(
        model_path=model_dir,
        load_format="dummy",
        skip_tokenizer_init=True,
        dtype="float32",
        max_total_tokens=4096,
        page_size=4,
        random_seed=7,
        disable_jit_warmup=True,
    )
    defaults.update(kwargs)
    return Engine(**defaults)
