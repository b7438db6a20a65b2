"""MMLU multiple-choice eval.

Behavioral analog of the reference's ``python/sglang/test/simple_eval_mmlu.py``
(zero-shot chain-of-thought prompt, ``Answer: X`` extraction). Data loads
from a LOCAL csv with columns [Question, A, B, C, D, Answer] (the standard
MMLU release layout; the reference downloads the same csv from a URL).
"""

from __future__ import annotations

import csv
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


class MMLUEval(Eval):
    name = "mmlu"

    def __init__(self, data_path: str):
        self.rows: List[Dict[str, Any]] = []
        with open(data_path, newline="") as fp:
            reader = csv.reader(fp)
            header = next(reader)
            has_header = header and header[0].strip().lower() in (
                "question", "prompt"
            )
            if not has_header:
                self._add(header)
            for row in reader:
                self._add(row)

    def _add(self, row):
        if len(row) >= 6:
            self.rows.append({
                "Question": row[0], "A": row[1], "B": row[2],
                "C": row[3], "D": row[4], "Answer": row[5].strip().upper(),
            })

    def examples(self):
        return self.rows

    def build_prompt(self, ex):
        return QUERY_TEMPLATE.format(**ex)

    def score_one(self, ex, response: str) -> float:
        m = ANSWER_PATTERN_MULTICHOICE.search(response or "")
        return 1.0 if (m and m.group(1).upper() == ex["Answer"]) else 0.0
