"""Offline single-batch latency/correctness harness (no server).

Analog of the reference's ``python/sglang/bench_one_batch.py``
(``latency_test:409`` — per-(batch, input, output) prefill & decode tok/s;
``correctness_test:260``). Drives the Engine directly.

Run: python -m sglang_fluentllm_tpu.bench_one_batch --model-path M \
        --batch-size 8 --input-len 128 --output-len 32 [--load-format dummy]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import List

import numpy as np


def latency_test(engine, batch_size: int, input_len: int, output_len: int,
                 vocab_size: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    prompts = [
        [int(x) for x in rng.randint(0, vocab_size, input_len)]
        for _ in range(batch_size)
    ]
    short, long_ = max(1, output_len // 8), output_len
    sp = {"temperature": 0.0, "ignore_eos": True}

    # warmup both shapes
    engine.generate(input_ids=prompts,
                    sampling_params={**sp, "max_new_tokens": short})
    engine.flush_cache()
    engine.generate(input_ids=prompts,
                    sampling_params={**sp, "max_new_tokens": long_})
    engine.flush_cache()

    t0 = time.perf_counter()
    engine.generate(input_ids=prompts,
                    sampling_params={**sp, "max_new_tokens": short})
    t_short = time.perf_counter() - t0
    engine.flush_cache()
    t0 = time.perf_counter()
    engine.generate(input_ids=prompts,
                    sampling_params={**sp, "max_new_tokens": long_})
    t_long = time.perf_counter() - t0
    engine.flush_cache()

    decode_tps = batch_size * (long_ - short) / (t_long - t_short)
    prefill_tps = batch_size * input_len / t_short
    return {
        "batch_size": batch_size,
        "input_len": input_len,
        "output_len": output_len,
        "prefill_tokens_per_sec": round(prefill_tps, 1),
        "decode_tokens_per_sec": round(decode_tps, 1),
        "decode_ms_per_step": round(
            1000 * (t_long - t_short) / (long_ - short), 3),
    }


def correctness_test(engine, vocab_size: int):
    """Greedy continuation consistency: batched == single, cached ==
    uncached (the harness-level sanity the reference runs)."""
    p = [int(x) for x in
         np.random.RandomState(1).randint(0, vocab_size, 32)]
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    single = engine.generate(input_ids=p, sampling_params=sp)["output_ids"]
    again = engine.generate(input_ids=p, sampling_params=sp)["output_ids"]
    engine.flush_cache()
    batched = engine.generate(
        input_ids=[p, p[:16]], sampling_params=sp)[0]["output_ids"]
    ok = single == again == batched
    return {"correct": ok, "output_ids": single}


def main(argv=None):
    from sglang_fluentllm_tpu.config.server_args import ServerArgs
    from sglang_fluentllm_tpu.engine import Engine
    from sglang_fluentllm_tpu.launch_server import _apply_platform_choice

    parser = argparse.ArgumentParser()
    ServerArgs.add_cli_args(parser)
    parser.add_argument("--batch-size", type=int, nargs="+", default=[8])
    parser.add_argument("--input-len", type=int, nargs="+", default=[128])
    parser.add_argument("--output-len", type=int, nargs="+", default=[32])
    parser.add_argument("--correctness", action="store_true")
    args = parser.parse_args(argv)
    server_args = ServerArgs.from_cli_args(args)
    server_args.skip_tokenizer_init = True
    _apply_platform_choice(server_args.device)
    engine = Engine(server_args)
    vocab = engine.model_config.vocab_size

    if args.correctness:
        print(json.dumps(correctness_test(engine, vocab)))
    for bs in args.batch_size:
        for il in args.input_len:
            for ol in args.output_len:
                print(json.dumps(latency_test(engine, bs, il, ol, vocab)))


if __name__ == "__main__":
    main()
