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
    if few_shot and name not in ("gsm8k",):
        import warnings

        warnings.warn(
            f"--few-shot is not supported for eval {name!r}; "
            "running 0-shot", stacklevel=2,
        )
    if name == "mmlu":
        from sglang_fluentllm_tpu.evals.simple_eval_mmlu import MMLUEval

        return MMLUEval(data_path)
    if name == "gsm8k":
        from sglang_fluentllm_tpu.evals.simple_eval_gsm8k import GSM8KEval

        return GSM8KEval(data_path, few_shot=few_shot)
    if name == "gpqa":
        from sglang_fluentllm_tpu.evals.simple_eval_gpqa import GPQAEval

        return GPQAEval(data_path)
    if name == "math":
        from sglang_fluentllm_tpu.evals.simple_eval_math import MathEval

        return MathEval(data_path)
    if name == "mgsm":
        from sglang_fluentllm_tpu.evals.simple_eval_mgsm import MGSMEval

        return MGSMEval(data_path)
    if name == "humaneval":
        from sglang_fluentllm_tpu.evals.simple_eval_humaneval import (
            HumanEvalEval,
        )

        return HumanEvalEval(data_path)
    raise ValueError(f"unknown eval {name}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://127.0.0.1:30000")
    p.add_argument("--eval-name", required=True,
                   choices=["mmlu", "gsm8k", "gpqa", "math", "mgsm",
                            "humaneval"])
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-examples", type=int, default=None)
    p.add_argument("--few-shot", type=int, default=0)
    p.add_argument("--max-tokens", type=int, default=512)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--num-threads", type=int, default=8)
    p.add_argument("--api-key", default=None)
    p.add_argument("--no-chat", action="store_true",
                   help="use /generate with raw prompts")
    p.add_argument("--compare", default=None, metavar="fp8,bf16",
                   help="FP8-accuracy gate (BASELINE.md): run the eval "
                        "against in-process engines with each listed KV "
                        "dtype and assert the scores agree within "
                        "--gate. Requires --model-path.")
    p.add_argument("--model-path", default=None,
                   help="checkpoint for --compare mode")
    p.add_argument("--gate", type=float, default=0.003,
                   help="max |score delta| for --compare (0.003 = the "
                        "0.3-accuracy-point BASELINE gate)")
    p.add_argument("--load-format", default="auto",
                   help="--compare engines' weight load format")
    args = p.parse_args(argv)

    ev = build_eval(args.eval_name, args.data_path, args.few_shot)
    if args.compare:
        return run_compare(args, ev)
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


KV_DTYPE = {"bf16": "auto", "fp8": "fp8_e4m3", "fp8_e4m3": "fp8_e4m3",
            "auto": "auto"}


def run_compare(args, ev):
    """FP8-vs-BF16 accuracy gate (BASELINE.md; reference claim: MMLU 89
    == 89 with the FP8 HiCache path, benchmark/hicache/README.md:57).
    Loads the SAME weights twice with different KV-cache dtypes, runs the
    eval on each, and fails (exit 1) when the scores diverge past the
    gate. Runs the day real weights are available:

        python -m sglang_fluentllm_tpu.evals.run_eval \\
            --compare fp8,bf16 --model-path <ckpt> \\
            --eval-name gsm8k --data-path gsm8k.jsonl --num-examples 200
    """
    import sys

    from sglang_fluentllm_tpu.engine import Engine
    from sglang_fluentllm_tpu.evals.common import EngineSampler

    assert args.model_path, "--compare requires --model-path"
    arms = [a.strip() for a in args.compare.split(",") if a.strip()]
    scores = {}
    for arm in arms:
        engine = Engine(
            model_path=args.model_path,
            load_format=args.load_format,
            kv_cache_dtype=KV_DTYPE.get(arm, arm),
            random_seed=0,
        )
        sampler = EngineSampler(
            engine, temperature=args.temperature,
            max_tokens=args.max_tokens,
        )
        res = ev.run(sampler, num_examples=args.num_examples,
                     num_threads=1)
        scores[arm] = res.score
        engine.shutdown()
        del engine
    delta = max(scores.values()) - min(scores.values())
    ok = delta <= args.gate
    print(json.dumps({
        "eval": args.eval_name,
        "compare": {a: round(s, 4) for a, s in scores.items()},
        "delta": round(delta, 4),
        "gate": args.gate,
        "pass": ok,
    }))
    if not ok:
        sys.exit(1)
    return scores


if __name__ == "__main__":
    main()
