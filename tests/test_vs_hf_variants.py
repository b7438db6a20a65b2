"""Checkpoint round-trip parity for llama-variant architectures.

Stronger than the dummy-weight smoke tests: a real HF model is
``save_pretrained``-ed (safetensors + config.json) and loaded through the
production weight loader, so the per-variant ``load_weights`` remapping
(fused-qkv splits, name maps) AND the forward math are both exercised —
the analog of the reference's cross-impl logits diffing (SURVEY §4).
"""

import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 17]
N_NEW = 8

COMMON = dict(
    hidden_size=64, intermediate_size=128, num_attention_heads=4,
    num_key_value_heads=2, num_hidden_layers=2, vocab_size=128,
    max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
    tie_word_embeddings=False,
    pad_token_id=0, bos_token_id=1, eos_token_id=2,
)


def _build(arch):
    if arch == "phi3":
        from transformers import Phi3Config, Phi3ForCausalLM

        return Phi3ForCausalLM(
            Phi3Config(**COMMON, attn_implementation="eager")
        )
    if arch == "granite":
        from transformers import GraniteConfig, GraniteForCausalLM

        return GraniteForCausalLM(GraniteConfig(
            **COMMON, embedding_multiplier=12.0, residual_multiplier=0.22,
            logits_scaling=8.0, attention_multiplier=0.25,
            attn_implementation="eager",
        ))
    if arch == "olmo2":
        from transformers import Olmo2Config, Olmo2ForCausalLM

        return Olmo2ForCausalLM(
            Olmo2Config(**COMMON, attn_implementation="eager")
        )
    if arch == "qwen3_next":
        from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

        return Qwen3NextForCausalLM(Qwen3NextConfig(
            **COMMON, head_dim=16, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=32,
            shared_expert_intermediate_size=32,
            linear_num_key_heads=2, linear_num_value_heads=4,
            linear_key_head_dim=8, linear_value_head_dim=8,
            linear_conv_kernel_dim=4, decoder_sparse_step=1,
            layer_types=["linear_attention", "full_attention"],
            partial_rotary_factor=0.25, norm_topk_prob=True,
            rope_scaling=None, attn_implementation="eager",
        ))
    if arch == "glm4_moe":
        from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

        return Glm4MoeForCausalLM(Glm4MoeConfig(
            **COMMON, head_dim=16, n_routed_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=32,
            n_shared_experts=1, first_k_dense_replace=1,
            n_group=2, topk_group=1, routed_scaling_factor=1.5,
            norm_topk_prob=True, use_qk_norm=True, attention_bias=True,
            partial_rotary_factor=0.5, rope_scaling=None,
            attn_implementation="eager",
        ))
    if arch == "gpt_oss":
        from transformers import GptOssConfig, GptOssForCausalLM

        return GptOssForCausalLM(GptOssConfig(
            **COMMON, head_dim=16, num_local_experts=4,
            num_experts_per_tok=2, sliding_window=8,
            layer_types=["sliding_attention", "full_attention"],
            swiglu_limit=7.0, rope_scaling=None,
            attn_implementation="eager",
        ))
    if arch == "cohere":
        from transformers import CohereConfig, CohereForCausalLM

        cfg = {k: v for k, v in COMMON.items()
               if k not in ("rms_norm_eps", "tie_word_embeddings")}
        return CohereForCausalLM(CohereConfig(
            **cfg, layer_norm_eps=1e-5, logit_scale=0.25,
            tie_word_embeddings=True, attn_implementation="eager",
        ))
    raise AssertionError(arch)


@pytest.mark.parametrize(
    "arch",
    ["phi3", "granite", "olmo2", "cohere", "gpt_oss", "glm4_moe",
     "qwen3_next"])
def test_checkpoint_roundtrip_greedy_matches_hf(arch):
    from tests.utils import tiny_engine

    torch.manual_seed(11)
    hf = _build(arch)
    hf.eval()
    d = tempfile.mkdtemp()
    hf.save_pretrained(d)

    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([PROMPT]), max_new_tokens=N_NEW, do_sample=False
        )[0, len(PROMPT):].tolist()
        hf_logits = hf(torch.tensor([PROMPT])).logits[0, -1].numpy()

    engine = tiny_engine(model_path_override=d, load_format="safetensors")
    out = engine.generate(
        input_ids=PROMPT,
        sampling_params={"max_new_tokens": N_NEW, "temperature": 0.0},
        return_logprob=True,
    )
    assert out["output_ids"] == ref
    # first-token logprob parity (logits path, incl. logit_scale handling)
    tok = out["output_ids"][0]
    our_lp = out["meta_info"]["output_token_logprobs"][0][0]
    hf_lp = float(
        torch.log_softmax(torch.from_numpy(hf_logits), -1)[tok]
    )
    assert abs(our_lp - hf_lp) < 3e-3
