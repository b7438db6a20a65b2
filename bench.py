"""Driver benchmark: decode throughput on one TPU chip.

Offline per-batch latency/throughput harness — the analog of the reference's
``bench_one_batch.py`` (``latency_test:409``, prints prefill/decode tok/s),
run against a Qwen2.5-0.5B-geometry model with dummy weights (reference
``DummyModelLoader`` pattern — perf without checkpoints).

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": N}

``vs_baseline`` is measured / HBM-roofline estimate for this chip (decode is
bandwidth-bound: every step streams all weights + the batch's KV), i.e. the
fraction of speed-of-light achieved. The reference publishes no absolute
tok/s (SURVEY §6), so the roofline is the stable comparison point.
"""

from __future__ import annotations

import json
import sys
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
DECODE_WARMUP = 8
DECODE_STEPS = 64
PAGE_SIZE = 16

# TPU v5e (1 chip): HBM bandwidth ~819 GB/s
HBM_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.config import ModelConfig, ServerArgs
    from sglang_fluentllm_tpu.mem.kv_cache import kv_cell_bytes_per_token
    from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata
    from sglang_fluentllm_tpu.runtime.batch_builder import (
        DecodeItem,
        ExtendItem,
    )
    from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner

    import os
    import tempfile

    model_dir = tempfile.mkdtemp(prefix="bench_model_")
    with open(os.path.join(model_dir, "config.json"), "w") as fp:
        json.dump(QWEN25_05B, fp)

    server_args = ServerArgs(
        model_path=model_dir,
        load_format="dummy",
        skip_tokenizer_init=True,
        dtype="bfloat16",
        page_size=PAGE_SIZE,
        max_total_tokens=BATCH_SIZE * (PREFILL_LEN + DECODE_STEPS + 64),
        max_running_requests=2 * BATCH_SIZE,
        random_seed=0,
    )
    config = ModelConfig.from_server_args(server_args)
    runner = ModelRunner(server_args, config)

    B = BATCH_SIZE
    sampling = SamplingMetadata.from_lists(
        [0.0] * B, [1.0] * B, [1] * B, [0.0] * B, B
    )

    # ---- prefill ----
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(B):
        idx = runner.req_pool.alloc()
        ids = rng.randint(0, config.vocab_size, PREFILL_LEN).astype(np.int32)
        slots = runner.allocator.alloc_extend(idx, 0, PREFILL_LEN)
        reqs.append(
            dict(idx=idx, ids=ids, slots=slots, seq_len=PREFILL_LEN)
        )
    items = [
        ExtendItem(
            input_ids=r["ids"],
            prefix_len=0,
            slots=r["slots"],
            pages=runner.allocator.req_pages(r["idx"], PREFILL_LEN),
        )
        for r in reqs
    ]
    batch = runner.batch_builder.build_extend(items)
    t0 = time.perf_counter()
    ids, _ = runner.forward_batch_generation(batch, sampling)
    ids = np.asarray(ids)
    prefill_time = time.perf_counter() - t0  # includes compile
    # second prefill for compile-free timing
    t0 = time.perf_counter()
    ids2, _ = runner.forward_batch_generation(batch, sampling)
    np.asarray(ids2)
    prefill_time = time.perf_counter() - t0
    prefill_tps = B * PREFILL_LEN / prefill_time

    # ---- decode ----
    last_ids = ids
    def decode_once(last_ids):
        items = []
        for i, r in enumerate(reqs):
            pos = r["seq_len"]
            slots = runner.allocator.alloc_extend(r["idx"], pos, 1)
            r["seq_len"] = pos + 1
            items.append(
                DecodeItem(
                    input_id=int(last_ids[i]),
                    seq_len=r["seq_len"],
                    slot=int(slots[0]),
                    pages=runner.allocator.req_pages(r["idx"], r["seq_len"]),
                )
            )
        b = runner.batch_builder.build_decode(items)
        out, _ = runner.forward_batch_generation(b, sampling)
        return np.asarray(out)[:B]

    for _ in range(DECODE_WARMUP):
        last_ids = decode_once(last_ids)
    t0 = time.perf_counter()
    for _ in range(DECODE_STEPS):
        last_ids = decode_once(last_ids)
    decode_time = time.perf_counter() - t0
    decode_tps = B * DECODE_STEPS / decode_time

    # ---- roofline ----
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(runner.params)
    )
    cell = kv_cell_bytes_per_token(config, 2, server_args.kv_cache_dtype)
    avg_ctx = PREFILL_LEN + DECODE_WARMUP + DECODE_STEPS // 2
    step_bytes = param_bytes + B * avg_ctx * cell
    roofline_tps = B / (step_bytes / HBM_BW)
    result = {
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(decode_tps / roofline_tps, 4),
        "detail": {
            "model": "qwen2.5-0.5b-geometry (dummy weights)",
            "batch_size": B,
            "prefill_tokens_per_sec": round(prefill_tps, 1),
            "decode_step_ms": round(1000 * decode_time / DECODE_STEPS, 3),
            "roofline_tokens_per_sec": round(roofline_tps, 1),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
