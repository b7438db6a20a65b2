"""HTTP serving load generator.

Analog of the reference's ``python/sglang/bench_serving.py``
(``BenchmarkMetrics:533`` — TTFT/TPOT/ITL mean/median/p95/p99, input/output
token throughput, concurrency, cache-hit rate). Hits ``/generate`` with SSE
streaming and measures per-token arrival times.

Run: python -m sglang_fluentllm_tpu.bench_serving --base-url URL \
        --num-prompts 64 --input-len 128 --output-len 64 --request-rate 8
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import json
import random
import sys
import time
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class RequestResult:
    success: bool = False
    ttft: float = 0.0
    latency: float = 0.0
    itl: List[float] = dataclasses.field(default_factory=list)
    prompt_tokens: int = 0
    output_tokens: int = 0
    cached_tokens: int = 0
    error: str = ""


def _pct(xs, p):
    return float(np.percentile(xs, p)) if xs else 0.0


@dataclasses.dataclass
class BenchmarkMetrics:
    completed: int
    failed: int
    duration: float
    total_input_tokens: int
    total_output_tokens: int
    request_throughput: float
    input_token_throughput: float
    output_token_throughput: float
    mean_ttft_ms: float
    median_ttft_ms: float
    p95_ttft_ms: float
    p99_ttft_ms: float
    mean_tpot_ms: float
    median_tpot_ms: float
    p95_tpot_ms: float
    p99_tpot_ms: float
    mean_itl_ms: float
    p95_itl_ms: float
    p99_itl_ms: float
    mean_e2e_ms: float
    p99_e2e_ms: float
    cache_hit_rate: float

    @classmethod
    def from_results(cls, results: List[RequestResult], duration: float):
        ok = [r for r in results if r.success]
        ttfts = [r.ttft for r in ok]
        e2es = [r.latency for r in ok]
        tpots = [
            (r.latency - r.ttft) / max(r.output_tokens - 1, 1)
            for r in ok if r.output_tokens > 1
        ]
        itls = [x for r in ok for x in r.itl]
        tin = sum(r.prompt_tokens for r in ok)
        tout = sum(r.output_tokens for r in ok)
        cached = sum(r.cached_tokens for r in ok)
        return cls(
            completed=len(ok),
            failed=len(results) - len(ok),
            duration=duration,
            total_input_tokens=tin,
            total_output_tokens=tout,
            request_throughput=len(ok) / duration,
            input_token_throughput=tin / duration,
            output_token_throughput=tout / duration,
            mean_ttft_ms=1e3 * float(np.mean(ttfts)) if ttfts else 0,
            median_ttft_ms=1e3 * _pct(ttfts, 50),
            p95_ttft_ms=1e3 * _pct(ttfts, 95),
            p99_ttft_ms=1e3 * _pct(ttfts, 99),
            mean_tpot_ms=1e3 * float(np.mean(tpots)) if tpots else 0,
            median_tpot_ms=1e3 * _pct(tpots, 50),
            p95_tpot_ms=1e3 * _pct(tpots, 95),
            p99_tpot_ms=1e3 * _pct(tpots, 99),
            mean_itl_ms=1e3 * float(np.mean(itls)) if itls else 0,
            p95_itl_ms=1e3 * _pct(itls, 95),
            p99_itl_ms=1e3 * _pct(itls, 99),
            mean_e2e_ms=1e3 * float(np.mean(e2es)) if e2es else 0,
            p99_e2e_ms=1e3 * _pct(e2es, 99),
            cache_hit_rate=cached / tin if tin else 0.0,
        )


async def _one_request(client, base_url, input_ids, output_len,
                       result: RequestResult):
    import httpx  # noqa: F401

    t0 = time.perf_counter()
    last = t0
    try:
        async with client.stream(
            "POST", base_url + "/generate",
            json={
                "input_ids": input_ids,
                "stream": True,
                "sampling_params": {
                    "max_new_tokens": output_len,
                    "temperature": 0.0,
                    "ignore_eos": True,
                },
            },
            timeout=600,
        ) as resp:
            if resp.status_code != 200:
                result.error = f"HTTP {resp.status_code}"
                return
            async for line in resp.aiter_lines():
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                now = time.perf_counter()
                chunk = json.loads(line[6:])
                if result.ttft == 0.0:
                    result.ttft = now - t0
                else:
                    result.itl.append(now - last)
                last = now
                meta = chunk.get("meta_info", {})
                result.prompt_tokens = meta.get("prompt_tokens", 0)
                result.output_tokens = meta.get("completion_tokens", 0)
                result.cached_tokens = meta.get("cached_tokens", 0)
            result.latency = time.perf_counter() - t0
            result.success = result.output_tokens > 0
    except Exception as e:  # noqa: BLE001
        result.error = str(e)


async def run_benchmark(args) -> BenchmarkMetrics:
    import httpx

    rng = random.Random(args.seed)
    prompts = [
        [rng.randrange(0, args.vocab_size) for _ in range(args.input_len)]
        for _ in range(args.num_prompts)
    ]
    results = [RequestResult() for _ in prompts]
    sem = asyncio.Semaphore(args.max_concurrency)

    async with httpx.AsyncClient() as client:
        t0 = time.perf_counter()

        async def worker(i):
            async with sem:
                await _one_request(
                    client, args.base_url, prompts[i], args.output_len,
                    results[i],
                )

        tasks = []
        for i in range(len(prompts)):
            tasks.append(asyncio.create_task(worker(i)))
            if args.request_rate > 0:
                await asyncio.sleep(
                    rng.expovariate(args.request_rate)
                )
        await asyncio.gather(*tasks)
        duration = time.perf_counter() - t0
    return BenchmarkMetrics.from_results(results, duration)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-url", default="http://127.0.0.1:30000")
    parser.add_argument("--num-prompts", type=int, default=64)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=64)
    parser.add_argument("--request-rate", type=float, default=0.0,
                        help="poisson arrival rate; 0 = all at once")
    parser.add_argument("--max-concurrency", type=int, default=64)
    parser.add_argument("--vocab-size", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-json", action="store_true")
    args = parser.parse_args(argv)

    m = asyncio.run(run_benchmark(args))
    if args.output_json:
        print(json.dumps(dataclasses.asdict(m)))
    else:
        print(f"Completed:                {m.completed} "
              f"(failed {m.failed}) in {m.duration:.2f}s")
        print(f"Request throughput:       {m.request_throughput:.2f} req/s")
        print(f"Input token throughput:   "
              f"{m.input_token_throughput:.1f} tok/s")
        print(f"Output token throughput:  "
              f"{m.output_token_throughput:.1f} tok/s")
        print(f"TTFT  mean/p50/p95/p99:   {m.mean_ttft_ms:.1f} / "
              f"{m.median_ttft_ms:.1f} / {m.p95_ttft_ms:.1f} / "
              f"{m.p99_ttft_ms:.1f} ms")
        print(f"TPOT  mean/p50/p95/p99:   {m.mean_tpot_ms:.1f} / "
              f"{m.median_tpot_ms:.1f} / {m.p95_tpot_ms:.1f} / "
              f"{m.p99_tpot_ms:.1f} ms")
        print(f"ITL   mean/p95/p99:       {m.mean_itl_ms:.1f} / "
              f"{m.p95_itl_ms:.1f} / {m.p99_itl_ms:.1f} ms")
        print(f"E2E   mean/p99:           {m.mean_e2e_ms:.1f} / "
              f"{m.p99_e2e_ms:.1f} ms")
        print(f"Cache hit rate:           {m.cache_hit_rate:.2%}")
    return m


if __name__ == "__main__":
    main()
