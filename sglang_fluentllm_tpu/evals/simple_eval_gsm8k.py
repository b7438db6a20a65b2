"""GSM8K numeric-answer eval.

Behavioral analog of the reference's gsm8k evals
(``python/sglang/test/few_shot_gsm8k.py`` / ``test_nightly_gsm8k_eval.py``):
few-shot prompting, final-number extraction, exact match against the
``#### answer`` ground truth. Data loads from a LOCAL jsonl with fields
{"question": ..., "answer": "...#### N"}.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List

from sglang_fluentllm_tpu.evals.common import ANSWER_PATTERN_NUMBER, Eval

PROMPT_SUFFIX = (
    "\nSolve the problem step by step, then give the final numeric "
    "answer on the last line as: Answer: N"
)


def _final_number(text: str):
    nums = ANSWER_PATTERN_NUMBER.findall((text or "").replace(",", ""))
    return nums[-1] if nums else None


class GSM8KEval(Eval):
    name = "gsm8k"

    def __init__(self, data_path: str, few_shot: int = 0):
        self.rows: List[Dict[str, Any]] = []
        with open(data_path) as fp:
            for line in fp:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                gt = d["answer"]
                m = re.search(r"####\s*(-?[\d,\.]+)", gt)
                self.rows.append({
                    "question": d["question"],
                    "target": (m.group(1) if m else gt).replace(",", ""),
                })
        self.shots = self.rows[:few_shot]
        self.rows = self.rows[few_shot:]

    def examples(self):
        return self.rows

    def build_prompt(self, ex):
        parts = []
        for s in self.shots:
            parts.append(
                f"Question: {s['question']}\nAnswer: {s['target']}"
            )
        parts.append(f"Question: {ex['question']}{PROMPT_SUFFIX}")
        return "\n\n".join(parts)

    def score_one(self, ex, response: str) -> float:
        got = _final_number(response)
        try:
            return float(
                got is not None
                and abs(float(got) - float(ex["target"])) < 1e-6
            )
        except ValueError:
            return 0.0
