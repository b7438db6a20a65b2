"""GPQA multiple-choice eval (graduate-level google-proof QA).

Behavioral analog of reference ``python/sglang/test/simple_eval_gpqa.py``:
each example's four options (1 correct + 3 incorrect) are shuffled with a
seeded permutation, the model answers A-D, `Answer: X` is extracted. Data
loads from a LOCAL csv with columns [Question, Correct Answer,
Incorrect Answer 1..3] (the GPQA release layout; the reference downloads
the same csv from a URL).
"""

from __future__ import annotations

import csv
import random
from typing import Any, Dict, List

from sglang_fluentllm_tpu.evals.common import (
    ANSWER_PATTERN_MULTICHOICE,
    Eval,
)

QUERY_TEMPLATE = """\
Answer the following multiple choice question. The last line of your \
response should be of the following format: 'Answer: $LETTER' (without \
quotes) where LETTER is one of ABCD. Think step by step before answering.

{Question}

A) {A}
B) {B}
C) {C}
D) {D}
""".strip()


class GPQAEval(Eval):
    name = "gpqa"

    def __init__(self, data_path: str, n_repeats: int = 1, seed: int = 0):
        rng = random.Random(seed)
        self.rows: List[Dict[str, Any]] = []
        with open(data_path, newline="") as fp:
            for raw in csv.DictReader(fp):
                choices = [
                    raw["Correct Answer"],
                    raw["Incorrect Answer 1"],
                    raw["Incorrect Answer 2"],
                    raw["Incorrect Answer 3"],
                ]
                for _ in range(n_repeats):
                    perm = rng.sample(range(4), 4)
                    shuffled = [choices[i] for i in perm]
                    self.rows.append({
                        "Question": raw["Question"],
                        "A": shuffled[0], "B": shuffled[1],
                        "C": shuffled[2], "D": shuffled[3],
                        "Answer": "ABCD"[shuffled.index(choices[0])],
                    })

    def examples(self):
        return self.rows

    def build_prompt(self, ex):
        return QUERY_TEMPLATE.format(**ex)

    def score_one(self, ex, response: str) -> float:
        m = ANSWER_PATTERN_MULTICHOICE.search(response or "")
        return 1.0 if (m and m.group(1).upper() == ex["Answer"]) else 0.0
