"""HumanEval — functional-correctness code eval (pass@k).

Behavioral analog of reference ``python/sglang/test/simple_eval_humaneval.py``.
The reference depends on the ``human_eval`` pip package for problem loading
and sandboxed execution; that package is not in this image, so both are
implemented natively: problems load from a LOCAL jsonl (the
HumanEval.jsonl.gz layout: prompt / test / entry_point), candidates run in
an isolated subprocess with a wall-clock timeout, and pass@k uses the
unbiased estimator from the HumanEval paper (1 - C(n-c,k)/C(n,k)).

SECURITY NOTE: generated code executes in a subprocess with no network in
this environment, but it is still arbitrary code — run only against models
and datasets you trust, exactly like the reference harness.
"""

from __future__ import annotations

import json
import math
import os
import re
import subprocess
import sys
import tempfile
from typing import Any, Dict, List, Optional

from sglang_fluentllm_tpu.evals.common import Eval

INSTRUCTION = (
    "Read the following function signature and docstring, and fully "
    "implement the function described. Your response should only contain "
    "the code for this function.\n"
)

_CODE_BLOCK = re.compile(r"```(?:python)?\n(.*?)```", re.DOTALL)


def find_code(completion: str) -> str:
    """ref simple_eval_humaneval.find_code:86-93 — prefer a fenced python
    block; strip everything up to the end of the signature line."""
    matches = _CODE_BLOCK.findall(completion or "")
    extracted = matches[0] if matches else (completion or "")
    cut = extracted.find(":\n    ")
    if cut >= 0:
        extracted = extracted[cut + 2:]
    return extracted


def check_correctness(sample: Dict[str, Any], completion: str,
                      timeout: float = 10.0) -> bool:
    """Run prompt+completion+test in a subprocess; passed = rc 0."""
    program = (
        sample["prompt"] + completion + "\n"
        + sample["test"] + "\n"
        + f"check({sample['entry_point']})\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as fp:
        fp.write(program)
        path = fp.name
    try:
        proc = subprocess.run(
            [sys.executable, "-I", path],
            capture_output=True, timeout=timeout,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def estimate_pass_at_k(n: int, c: int, k: int) -> float:
    """Unbiased pass@k (HumanEval paper eq. 1)."""
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


class HumanEvalEval(Eval):
    name = "humaneval"

    def __init__(self, data_path: str, num_samples_per_task: int = 1,
                 ks_passes: Optional[List[int]] = None,
                 timeout: float = 10.0):
        self.rows: List[Dict[str, Any]] = []
        with open(data_path) as fp:
            for line in fp:
                line = line.strip()
                if line:
                    self.rows.append(json.loads(line))
        self.num_samples_per_task = num_samples_per_task
        self.ks_passes = ks_passes or [1]
        self.timeout = timeout

    def examples(self):
        return self.rows

    def build_prompt(self, ex):
        return INSTRUCTION + ex["prompt"]

    def score_one(self, ex, response: str) -> float:
        return 1.0 if check_correctness(
            ex, find_code(response), self.timeout) else 0.0

    # -- multi-sample pass@k (reference __call__ semantics) -------------
    def run_pass_at_k(self, sampler, num_examples: Optional[int] = None):
        exs = self.rows[:num_examples] if num_examples else self.rows
        per_task: List[Dict[str, float]] = []
        for ex in exs:
            prompt = self.build_prompt(ex)
            n = self.num_samples_per_task
            c = sum(
                check_correctness(ex, find_code(sampler(prompt)),
                                  self.timeout)
                for _ in range(n)
            )
            per_task.append({f"pass@{k}": estimate_pass_at_k(n, c, k)
                             for k in self.ks_passes if k <= n})
        agg: Dict[str, float] = {}
        for key in per_task[0] if per_task else []:
            agg[key] = sum(t[key] for t in per_task) / len(per_task)
        return agg
