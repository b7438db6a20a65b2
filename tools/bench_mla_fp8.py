"""North-star bench (VERDICT r2 #2): MLA decode tok/s/chip, bf16-KV vs
FP8 per-token-quantized KV, through the FULL serving engine on
DeepSeek-V2-Lite ATTENTION geometry (kv_lora_rank 512, qk_nope 128,
qk_rope 64, v 128, 16 heads, H 2048 — layer count scaled to fit one chip
with dummy weights; the MLA kernel's working set per token is exact).

Long contexts make the KV stream the dominant HBM term so the fp8-vs-bf16
ratio reflects the kernel, not weight streaming.

Prints one JSON line per arm plus a summary with the fp8/bf16 ratio and
the % of measured roofline. Reference contract: flashmla_backend.py:127 —
the fp8 module exists to be FASTER, not just smaller.
"""

import gc
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V2_LITE_ATTN = {
    "architectures": ["DeepseekV2ForCausalLM"],
    "model_type": "deepseek_v2",
    "hidden_size": 2048,
    "intermediate_size": 5632,
    "moe_intermediate_size": 1408,
    "num_attention_heads": 16,
    "num_key_value_heads": 16,
    "num_hidden_layers": 8,          # V2-Lite has 27; scaled to fit bf16
    "first_k_dense_replace": 8,      # dense MLPs: isolate the MLA kernel
    "n_routed_experts": 8,
    "num_experts_per_tok": 2,
    "n_shared_experts": 1,
    "vocab_size": 102400,
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
    "torch_dtype": "bfloat16",
}

BATCH = int(os.environ.get("MLA_BENCH_BATCH", 32))
PREFILL = int(os.environ.get("MLA_BENCH_PREFILL", 1024))
SHORT_NEW, LONG_NEW = 16, 80
PAGE = 32


def build_engine(kv_dtype):
    from sglang_fluentllm_tpu.engine import Engine

    d = tempfile.mkdtemp(prefix="bench_mla_")
    with open(os.path.join(d, "config.json"), "w") as fp:
        json.dump(V2_LITE_ATTN, fp)
    return Engine(
        model_path=d, load_format="dummy", skip_tokenizer_init=True,
        dtype="bfloat16", page_size=PAGE,
        max_total_tokens=BATCH * (PREFILL + LONG_NEW + 2 * PAGE),
        max_running_requests=2 * BATCH,
        decode_steps_per_launch=16,
        random_seed=0, kv_cache_dtype=kv_dtype,
    )


def run(engine, prompts, max_new):
    sp = {"max_new_tokens": max_new, "temperature": 0.0,
          "ignore_eos": True}
    t0 = time.perf_counter()
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    assert sum(len(o["output_ids"]) for o in outs) == len(prompts) * max_new
    return dt


def prompts(seed):
    r = np.random.RandomState(seed)
    return [[int(x) for x in r.randint(0, V2_LITE_ATTN["vocab_size"],
                                       PREFILL)] for _ in range(BATCH)]


def bench_arm(kv_dtype):
    import jax

    from sglang_fluentllm_tpu.mem.kv_cache import kv_cell_bytes_per_token

    engine = build_engine(kv_dtype)
    run(engine, prompts(99), SHORT_NEW)
    engine.flush_cache()
    run(engine, prompts(98), LONG_NEW)
    engine.flush_cache()
    best = float("inf")
    for rep in range(3):
        t_s = run(engine, prompts(1 + 10 * rep), SHORT_NEW)
        engine.flush_cache()
        t_l = run(engine, prompts(2 + 10 * rep), LONG_NEW)
        engine.flush_cache()
        best = min(best, t_l - t_s)
    tps = BATCH * (LONG_NEW - SHORT_NEW) / best
    param_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(engine.runner.params))
    cell = kv_cell_bytes_per_token(engine.model_config, 2, kv_dtype)
    avg_ctx = PREFILL + (SHORT_NEW + LONG_NEW) // 2
    step_bytes = param_bytes + BATCH * avg_ctx * cell
    rec = {
        "metric": f"mla_decode_tok_s_{kv_dtype if kv_dtype != 'auto' else 'bf16'}_kv",
        "value": round(tps, 1),
        "unit": "tok/s/chip",
        "detail": {
            "geometry": "deepseek-v2-lite attention (8 layers, dense MLP)",
            "batch": BATCH, "avg_ctx": avg_ctx,
            "step_ms": round(1000 * best / (LONG_NEW - SHORT_NEW), 3),
            "kv_bytes_per_token": cell,
            "step_bytes_mb": round(step_bytes / 1e6, 1),
        },
    }
    print(json.dumps(rec), flush=True)
    del engine
    gc.collect()
    return rec, step_bytes


def main():
    bf16, bytes_bf16 = bench_arm("auto")
    fp8, bytes_fp8 = bench_arm("fp8")

    # measured-bandwidth roofline (same probe as bench.py)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench as rootbench

    bw = rootbench.measure_hbm_bw()
    roof_bf16 = BATCH / (bytes_bf16 / bw)
    roof_fp8 = BATCH / (bytes_fp8 / bw)
    print(json.dumps({
        "metric": "mla_fp8_vs_bf16_decode",
        "value": round(fp8["value"] / bf16["value"], 3),
        "unit": "x (>1 = fp8 faster)",
        "detail": {
            "bf16_tok_s": bf16["value"],
            "fp8_tok_s": fp8["value"],
            "hbm_bw_measured_gb_s": round(bw / 1e9, 1),
            "bf16_pct_of_roofline": round(bf16["value"] / roof_bf16, 3),
            "fp8_pct_of_roofline": round(fp8["value"] / roof_fp8, 3),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
