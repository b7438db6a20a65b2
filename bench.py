"""Driver benchmark: serving decode throughput on one TPU chip.

Runs the REAL serving path — Engine -> overlap Scheduler -> jitted runner ->
Pallas paged attention — on a Qwen2.5-0.5B-geometry model with dummy weights
(reference ``bench_one_batch.py`` role, but through the scheduler so host
overheads count, like ``bench_serving.py`` does for the reference).

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N}

``vs_baseline`` is measured / HBM-roofline estimate for this chip (decode is
bandwidth-bound: every step streams all weights + the batch's KV). The
reference publishes no absolute tok/s (SURVEY §6), so speed-of-light fraction
is the stable comparison point.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

QWEN25_05B = {
    "architectures": ["Qwen2ForCausalLM"],
    "model_type": "qwen2",
    "hidden_size": 896,
    "intermediate_size": 4864,
    "num_attention_heads": 14,
    "num_key_value_heads": 2,
    "num_hidden_layers": 24,
    "vocab_size": 151936,
    "max_position_embeddings": 32768,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "attention_bias": True,
    "tie_word_embeddings": True,
}

BATCH_SIZE = 64
PREFILL_LEN = 128
# whole fused-decode windows (k=32 default) in both phases: the delta
# then isolates 128 steady-state decode tokens without partial-window
# skew
SHORT_NEW = 32
LONG_NEW = 160
PAGE_SIZE = 32

# TPU v5e spec sheet: ~819 GB/s HBM. The axon-tunneled chip sustains
# far less on real weight-streaming GEMMs, so the roofline denominator
# uses a MEASURED bandwidth probe (in-jit repeated 1 GB GEMM with a data
# dependency — tools/profile_matmul.py methodology); the spec number is
# still reported in detail for reference.
HBM_BW_SPEC = 819e9


def measure_hbm_bw() -> float:
    """Achieved GB/s on a 1 GiB bf16 weight-streaming GEMM (best of two
    batch shapes)."""
    import jax
    import jax.numpy as jnp

    K, N, R = 16384, 32768, 20
    w = jnp.asarray(
        np.random.RandomState(0).standard_normal((K, N)).astype(
            np.float32), jnp.bfloat16,
    )

    def run(x, w):
        def body(h, _):
            y = jnp.dot(h, w, preferred_element_type=jnp.float32)
            return h + y[:, :K].astype(jnp.bfloat16) * 1e-6, None

        h, _ = jax.lax.scan(body, x, None, length=R)
        return jnp.sum(h.astype(jnp.float32))

    jrun = jax.jit(run)
    best = 0.0
    for B in (64, 256, 512):
        x = jnp.asarray(
            np.random.RandomState(1).standard_normal((B, K)),
            jnp.bfloat16,
        )
        jax.device_get(jrun(x, w))  # compile + settle
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(jrun(x, w))
            dt = (time.perf_counter() - t0) / R
            best = max(best, w.size * 2 / dt)
    del w
    return best


def build_engine():
    from sglang_fluentllm_tpu.engine import Engine

    model_dir = tempfile.mkdtemp(prefix="bench_model_")
    with open(os.path.join(model_dir, "config.json"), "w") as fp:
        json.dump(QWEN25_05B, fp)
    return Engine(
        model_path=model_dir,
        load_format="dummy",
        skip_tokenizer_init=True,
        dtype="bfloat16",
        page_size=PAGE_SIZE,
        max_total_tokens=BATCH_SIZE * (PREFILL_LEN + LONG_NEW + 64),
        max_running_requests=2 * BATCH_SIZE,
        decode_steps_per_launch=int(
            os.environ.get("SFT_BENCH_DECODE_STEPS", "32")),
        overlap_pipeline_depth=int(
            os.environ.get("SFT_BENCH_PIPELINE_DEPTH", "4")),
        random_seed=0,
        quantization=os.environ.get("SFT_BENCH_QUANT") or None,
        kv_cache_dtype=os.environ.get("SFT_BENCH_KV_DTYPE", "auto"),
    )


def run(engine, prompts, max_new):
    sp = {"max_new_tokens": max_new, "temperature": 0.0, "ignore_eos": True}
    t0 = time.perf_counter()
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    dt = time.perf_counter() - t0
    n_out = sum(len(o["output_ids"]) for o in outs)
    assert n_out == len(prompts) * max_new, n_out
    return dt


def main():
    import jax

    from sglang_fluentllm_tpu.mem.kv_cache import kv_cell_bytes_per_token

    engine = build_engine()
    rng = np.random.RandomState(0)
    vocab = QWEN25_05B["vocab_size"]

    def prompts(seed):
        r = np.random.RandomState(seed)
        return [
            [int(x) for x in r.randint(0, vocab, PREFILL_LEN)]
            for _ in range(BATCH_SIZE)
        ]

    # warmup: compile every (prefill, decode-window) shape both phases hit
    run(engine, prompts(99), SHORT_NEW)
    engine.flush_cache()
    run(engine, prompts(98), LONG_NEW)
    engine.flush_cache()

    # the tunneled chip is shared: run the pair several times. Contention
    # only ever INFLATES a timing, so min() of each phase is the clean
    # estimate; min of per-rep (t_long - t_short) would be biased LOW
    # whenever contention hit the short phase of one rep (an inflated
    # t_short fakes a small delta — caught round 5).
    t_short_best = float("inf")
    t_long_best = float("inf")
    for rep in range(3):
        t_short = run(engine, prompts(1 + 10 * rep), SHORT_NEW)
        engine.flush_cache()
        t_long = run(engine, prompts(2 + 10 * rep), LONG_NEW)
        engine.flush_cache()
        t_short_best = min(t_short_best, t_short)
        t_long_best = min(t_long_best, t_long)
    best_delta = t_long_best - t_short_best

    n_decode_tokens = BATCH_SIZE * (LONG_NEW - SHORT_NEW)
    decode_tps = n_decode_tokens / best_delta
    prefill_tps = BATCH_SIZE * PREFILL_LEN / t_short_best  # upper bound-ish

    # ---- roofline ----
    param_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(engine.runner.params)
    )
    config = engine.model_config
    cell = kv_cell_bytes_per_token(config, 2, "auto")
    avg_ctx = PREFILL_LEN + (SHORT_NEW + LONG_NEW) // 2
    step_bytes = param_bytes + BATCH_SIZE * avg_ctx * cell
    hbm_bw = measure_hbm_bw()
    roofline_tps = BATCH_SIZE / (step_bytes / hbm_bw)
    roofline_tps_spec = BATCH_SIZE / (step_bytes / HBM_BW_SPEC)

    result = {
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(decode_tps / roofline_tps, 4),
        "detail": {
            "model": "qwen2.5-0.5b-geometry (dummy weights)",
            "batch_size": BATCH_SIZE,
            "decode_step_ms": round(
                1000 * best_delta / (LONG_NEW - SHORT_NEW), 3
            ),
            "prefill_tokens_per_sec": round(prefill_tps, 1),
            "roofline_tokens_per_sec": round(roofline_tps, 1),
            "roofline_tokens_per_sec_at_spec_bw": round(
                roofline_tps_spec, 1),
            "hbm_bw_measured_gb_s": round(hbm_bw / 1e9, 1),
            "platform": jax.devices()[0].platform,
            "serving_path": "engine+overlap_scheduler",
        },
    }
    if os.environ.get("SFT_BENCH_QUANT"):
        result["detail"]["quantization"] = os.environ["SFT_BENCH_QUANT"]
    if os.environ.get("SFT_BENCH_KV_DTYPE", "auto") != "auto":
        result["detail"]["kv_cache_dtype"] = os.environ[
            "SFT_BENCH_KV_DTYPE"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
