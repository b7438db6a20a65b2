"""Run an accuracy eval against a served model.

Analog of the reference's ``python/sglang/test/run_eval.py``:

    python -m sglang_fluentllm_tpu.evals.run_eval \
        --base-url http://127.0.0.1:30000 --eval-name mmlu \
        --data-path mmlu.csv --num-examples 64

Prints one JSON line with the score (the accuracy gate for FP8-KV claims:
BASELINE.json requires MMLU/GSM8K within +-0.3 of bf16).
"""

from __future__ import annotations

import argparse
import json

from sglang_fluentllm_tpu.evals.common import ChatSampler


def build_eval(name: str, data_path: str, few_shot: int):
    if name == "mmlu":
        from sglang_fluentllm_tpu.evals.simple_eval_mmlu import MMLUEval

        return MMLUEval(data_path)
    if name == "gsm8k":
        from sglang_fluentllm_tpu.evals.simple_eval_gsm8k import GSM8KEval

        return GSM8KEval(data_path, few_shot=few_shot)
    raise ValueError(f"unknown eval {name}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://127.0.0.1:30000")
    p.add_argument("--eval-name", choices=["mmlu", "gsm8k"], required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-examples", type=int, default=None)
    p.add_argument("--few-shot", type=int, default=0)
    p.add_argument("--max-tokens", type=int, default=512)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--num-threads", type=int, default=8)
    p.add_argument("--api-key", default=None)
    p.add_argument("--no-chat", action="store_true",
                   help="use /generate with raw prompts")
    args = p.parse_args(argv)

    ev = build_eval(args.eval_name, args.data_path, args.few_shot)
    sampler = ChatSampler(
        args.base_url, temperature=args.temperature,
        max_tokens=args.max_tokens, api_key=args.api_key,
        use_chat=not args.no_chat,
    )
    res = ev.run(sampler, num_examples=args.num_examples,
                 num_threads=args.num_threads)
    print(json.dumps({
        "eval": args.eval_name, "score": round(res.score, 4),
        "n": res.n, "latency_s": round(res.latency, 2),
        **res.metrics,
    }))
    return res


if __name__ == "__main__":
    main()
