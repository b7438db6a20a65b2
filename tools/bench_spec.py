"""Speculative-decoding hardware bench (VERDICT r2 #2): accept length +
end-to-end speedup through the serving engine.

Two arms, both dummy-weight (no trained draft exists in this environment,
so the arms bracket the deployment range):

- NEXTN on the DeepSeek-MLA geometry: dummy draft => accept length floors
  near 1 (the guaranteed bonus token). This measures the spec MACHINERY
  cost: window step time vs plain decode gives the break-even accept
  length a trained draft must clear.
- STANDALONE spec with draft == target (oracle draft): greedy drafts
  always verify => accept length = num_steps+1, the e2e speedup upper
  bound of the fused draft+target-verify path.

Prints one JSON line per arm.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DS_CFG = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "model_type": "deepseek_v2",
    "hidden_size": 1024,
    "intermediate_size": 2816,
    "moe_intermediate_size": 704,
    "num_attention_heads": 16,
    "num_key_value_heads": 16,
    "num_hidden_layers": 6,
    "first_k_dense_replace": 6,
    "n_routed_experts": 8,
    "num_experts_per_tok": 2,
    "n_shared_experts": 1,
    "vocab_size": 32000,
    "max_position_embeddings": 8192,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "q_lora_rank": None,
    "kv_lora_rank": 512,
    "qk_nope_head_dim": 128,
    "qk_rope_head_dim": 64,
    "v_head_dim": 128,
    "norm_topk_prob": False,
    "tie_word_embeddings": False,
    "num_nextn_predict_layers": 1,
}

BATCH = int(os.environ.get("SPEC_BENCH_BATCH", 16))
PREFILL = 256
NEW = 96


def build(spec=None, steps=3, self_draft=False):
    from sglang_fluentllm_tpu.engine import Engine

    d = tempfile.mkdtemp(prefix="bench_spec_")
    with open(os.path.join(d, "config.json"), "w") as fp:
        json.dump(DS_CFG, fp)
    kw = {}
    if spec:
        kw = dict(speculative_algorithm=spec, speculative_num_steps=steps)
        if self_draft:
            kw["speculative_draft_model_path"] = d
    return Engine(
        model_path=d, load_format="dummy", skip_tokenizer_init=True,
        dtype="bfloat16", page_size=32,
        max_total_tokens=BATCH * (PREFILL + NEW + 96),
        max_running_requests=2 * BATCH, random_seed=0, **kw,
    )


def run_once(engine, prompt_fn, new, seed=0):
    sp = {"max_new_tokens": new, "temperature": 0.0, "ignore_eos": True}
    prompts = [prompt_fn(seed * 100 + i) for i in range(BATCH)]
    t0 = time.perf_counter()
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    assert sum(len(o["output_ids"]) for o in outs) == BATCH * new
    engine.flush_cache()
    return dt


def run(engine, prompt_fn, n=None, new=None):
    """Decode tok/s via the short/long delta (prefill + compile cancel)."""
    if new is not None:  # warmup call compatibility
        return run_once(engine, prompt_fn, new)
    best = float("inf")
    for rep in range(2):
        t_s = run_once(engine, prompt_fn, NEW // 3, seed=1 + rep)
        t_l = run_once(engine, prompt_fn, NEW, seed=2 + rep)
        best = min(best, t_l - t_s)
    return BATCH * (NEW - NEW // 3) / best


def rand_prompt(i):
    r = np.random.RandomState(i)
    return [int(x) for x in r.randint(1, DS_CFG["vocab_size"], PREFILL)]


def loop_prompt(i):
    # strongly periodic prompt: PLD n-gram lookup proposes the loop
    r = np.random.RandomState(i)
    motif = [int(x) for x in r.randint(1, DS_CFG["vocab_size"], 8)]
    return (motif * (PREFILL // 8))[:PREFILL]


def accept_len(engine):
    s = engine.scheduler
    return (s.spec_accept_sum / s.spec_accept_ct
            if s.spec_accept_ct else 0.0)


def main():
    base = build()
    run_once(base, rand_prompt, NEW // 3)   # warmup both window shapes
    run_once(base, rand_prompt, NEW)
    base_tps = run(base, rand_prompt)
    print(json.dumps({"metric": "decode_tok_s_no_spec",
                      "value": round(base_tps, 1), "unit": "tok/s"}),
          flush=True)
    del base

    nextn = build(spec="NEXTN", steps=3)
    run_once(nextn, rand_prompt, NEW // 3)
    run_once(nextn, rand_prompt, NEW)
    nextn_tps = run(nextn, rand_prompt)
    print(json.dumps({
        "metric": "nextn_spec",
        "tok_s": round(nextn_tps, 1),
        "accept_len": round(accept_len(nextn), 3),
        "speedup_vs_plain": round(nextn_tps / base_tps, 3),
        "note": "dummy draft: accept ~1 floor; break-even accept = "
                "plain/spec step-cost ratio x window",
    }), flush=True)
    del nextn

    oracle = build(spec="STANDALONE", steps=3, self_draft=True)
    run_once(oracle, rand_prompt, NEW // 3)
    run_once(oracle, rand_prompt, NEW)
    oracle_tps = run(oracle, rand_prompt)
    print(json.dumps({
        "metric": "standalone_spec_oracle_draft",
        "tok_s": round(oracle_tps, 1),
        "accept_len": round(accept_len(oracle), 3),
        "speedup_vs_plain": round(oracle_tps / base_tps, 3),
        "note": "draft == target: every greedy draft verifies — the "
                "accept/e2e-speedup UPPER BOUND of the fused verify path",
    }), flush=True)


if __name__ == "__main__":
    main()
