"""Numerical parity vs HuggingFace transformers (torch CPU).

The analog of the reference's debug-tensor-dump cross-impl diffing
(``--debug-tensor-dump-*`` + ModelTensorTracer, SURVEY §4): our dummy-weight
model is exported to a torch HF model and greedy continuations + prefill
logits must match.
"""

import numpy as np
import pytest

from tests.utils import TINY_LLAMA_CFG, TINY_QWEN2_CFG, tiny_engine

torch = pytest.importorskip("torch")

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 17, 64, 99]


def to_hf_state_dict(params, has_bias):
    sd = {}
    sd["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"])
    sd["model.norm.weight"] = np.asarray(params["norm"])
    sd["lm_head.weight"] = np.asarray(params["lm_head"]).T
    L = params["layers"]["q_proj"].shape[0]
    for i in range(L):
        p = f"model.layers.{i}."
        lp = params["layers"]
        sd[p + "self_attn.q_proj.weight"] = np.asarray(lp["q_proj"][i]).T
        sd[p + "self_attn.k_proj.weight"] = np.asarray(lp["k_proj"][i]).T
        sd[p + "self_attn.v_proj.weight"] = np.asarray(lp["v_proj"][i]).T
        sd[p + "self_attn.o_proj.weight"] = np.asarray(lp["o_proj"][i]).T
        if has_bias:
            sd[p + "self_attn.q_proj.bias"] = np.asarray(lp["q_bias"][i])
            sd[p + "self_attn.k_proj.bias"] = np.asarray(lp["k_bias"][i])
            sd[p + "self_attn.v_proj.bias"] = np.asarray(lp["v_bias"][i])
        sd[p + "mlp.gate_proj.weight"] = np.asarray(lp["gate_proj"][i]).T
        sd[p + "mlp.up_proj.weight"] = np.asarray(lp["up_proj"][i]).T
        sd[p + "mlp.down_proj.weight"] = np.asarray(lp["down_proj"][i]).T
        sd[p + "input_layernorm.weight"] = np.asarray(lp["input_layernorm"][i])
        sd[p + "post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"][i]
        )
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def build_hf_model(cfg_dict, params):
    from transformers import LlamaConfig, LlamaForCausalLM, Qwen2Config, Qwen2ForCausalLM

    is_qwen = cfg_dict["architectures"][0] == "Qwen2ForCausalLM"
    common = dict(
        hidden_size=cfg_dict["hidden_size"],
        intermediate_size=cfg_dict["intermediate_size"],
        num_attention_heads=cfg_dict["num_attention_heads"],
        num_key_value_heads=cfg_dict["num_key_value_heads"],
        num_hidden_layers=cfg_dict["num_hidden_layers"],
        vocab_size=cfg_dict["vocab_size"],
        max_position_embeddings=cfg_dict["max_position_embeddings"],
        rms_norm_eps=cfg_dict["rms_norm_eps"],
        rope_theta=cfg_dict["rope_theta"],
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    if is_qwen:
        hf = Qwen2ForCausalLM(Qwen2Config(**common))
    else:
        hf = LlamaForCausalLM(
            LlamaConfig(**common, attention_bias=cfg_dict.get(
                "attention_bias", False))
        )
    sd = to_hf_state_dict(params, is_qwen or cfg_dict.get("attention_bias"))
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing
    hf.eval()
    return hf


@pytest.mark.parametrize("cfg", [TINY_LLAMA_CFG, TINY_QWEN2_CFG],
                         ids=["llama", "qwen2"])
def test_greedy_matches_hf(cfg):
    engine = tiny_engine(cfg)
    params = engine.runner.params
    hf = build_hf_model(cfg, params)

    N_NEW = 8
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([PROMPT]), max_new_tokens=N_NEW, do_sample=False
        )[0, len(PROMPT):].tolist()

    ours = engine.generate(
        input_ids=PROMPT,
        sampling_params={"max_new_tokens": N_NEW, "temperature": 0.0},
    )["output_ids"]
    assert ours == hf_out


def test_prefill_logits_match_hf():
    engine = tiny_engine(TINY_LLAMA_CFG)
    params = engine.runner.params
    hf = build_hf_model(TINY_LLAMA_CFG, params)
    with torch.no_grad():
        hf_logits = hf(torch.tensor([PROMPT])).logits[0, -1].numpy()

    out = engine.generate(
        input_ids=PROMPT,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True,
    )
    tok = out["output_ids"][0]
    our_lp = out["meta_info"]["output_token_logprobs"][0][0]
    hf_lp = torch.log_softmax(torch.from_numpy(hf_logits), -1)[tok].item()
    assert tok == int(np.argmax(hf_logits))
    assert abs(our_lp - hf_lp) < 2e-3


def test_gpt2_greedy_matches_hf():
    """GPT-2 structural parity (Conv1D layout, learned positions, LN)."""
    from transformers import GPT2Config, GPT2LMHeadModel as HFGPT2

    from tests.test_model_zoo import CONFIGS
    from tests.utils import tiny_engine

    cfg = CONFIGS["gpt2"]
    engine = tiny_engine(cfg)
    p = engine.runner.params

    hf = HFGPT2(GPT2Config(
        vocab_size=128, n_positions=256, n_embd=64, n_layer=2, n_head=4,
        attn_implementation="eager",
    ))
    sd = {}
    sd["transformer.wte.weight"] = np.asarray(p["wte"])
    sd["transformer.wpe.weight"] = np.asarray(p["wpe"])
    sd["transformer.ln_f.weight"] = np.asarray(p["ln_f_w"])
    sd["transformer.ln_f.bias"] = np.asarray(p["ln_f_b"])
    lp = p["layers"]
    names = {
        "ln_1_w": "ln_1.weight", "ln_1_b": "ln_1.bias",
        "ln_2_w": "ln_2.weight", "ln_2_b": "ln_2.bias",
        "c_attn_w": "attn.c_attn.weight", "c_attn_b": "attn.c_attn.bias",
        "attn_proj_w": "attn.c_proj.weight",
        "attn_proj_b": "attn.c_proj.bias",
        "c_fc_w": "mlp.c_fc.weight", "c_fc_b": "mlp.c_fc.bias",
        "mlp_proj_w": "mlp.c_proj.weight", "mlp_proj_b": "mlp.c_proj.bias",
    }
    for i in range(2):
        for ours, theirs in names.items():
            sd[f"transformer.h.{i}.{theirs}"] = np.asarray(lp[ours][i])
    sd["lm_head.weight"] = sd["transformer.wte.weight"]
    hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    hf.eval()
    with torch.no_grad():
        ref = hf.generate(torch.tensor([PROMPT]), max_new_tokens=6,
                          do_sample=False)[0, len(PROMPT):].tolist()
    ours = engine.generate(
        input_ids=PROMPT,
        sampling_params={"max_new_tokens": 6, "temperature": 0.0},
    )["output_ids"]
    assert ours == ref
