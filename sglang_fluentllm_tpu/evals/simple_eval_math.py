"""MATH eval (Hendrycks et al. competition math).

Behavioral analog of reference ``python/sglang/test/simple_eval_math.py``:
`Answer: $ANSWER` on the last line is extracted (ref ANSWER_PATTERN,
simple_eval_common.py:170) and checked for equality against the target.
The reference delegates equality to an LLM judge (check_equality,
simple_eval_common.py:252); in a zero-egress environment we use a local
symbolic-ish normalizer that handles the common MATH answer forms
(integers, decimals, fractions, \\frac, \\boxed, units, commas, spaces) and
optionally an injected judge sampler for the rest.
"""

from __future__ import annotations

import csv
import re
from fractions import Fraction
from typing import Any, Callable, Dict, List, Optional

from sglang_fluentllm_tpu.evals.common import Eval

ANSWER_PATTERN = re.compile(r"(?i)Answer\s*:\s*([^\n]+)")

QUERY_TEMPLATE = """\
Solve the following math problem step by step. The last line of your \
response should be of the form Answer: $ANSWER (without quotes) where \
$ANSWER is the answer to the problem.

{Question}

Remember to put your answer on its own line after "Answer:", and you do \
not need to use a \\boxed command.
""".strip()


def _normalize(ans: str) -> str:
    """Canonicalize a MATH-style answer string for literal comparison."""
    s = (ans or "").strip()
    s = re.sub(r"\\boxed\{(.*)\}", r"\1", s)
    s = re.sub(r"\\(text|mbox|mathrm)\{[^}]*\}", "", s)  # trailing units
    s = re.sub(r"\\frac\{([^{}]+)\}\{([^{}]+)\}", r"\1/\2", s)
    s = re.sub(r"\\d?frac(\d)(\d)", r"\1/\2", s)
    s = s.replace("\\left", "").replace("\\right", "")
    s = s.replace("\\!", "").replace("\\,", "").replace("\\ ", "")
    s = s.replace("$", "").replace("%", "").replace(",", "")
    s = s.replace("^{\\circ}", "").replace("^\\circ", "")
    s = s.strip().strip(".")
    s = re.sub(r"\s+", "", s)
    return s


def _as_number(s: str) -> Optional[Fraction]:
    try:
        if "/" in s:
            num, den = s.split("/", 1)
            return Fraction(num) / Fraction(den)
        return Fraction(s)
    except (ValueError, ZeroDivisionError):
        return None


def answers_equal(target: str, got: Optional[str]) -> bool:
    if got is None:
        return False
    a, b = _normalize(target), _normalize(got)
    if a == b:
        return True
    na, nb = _as_number(a), _as_number(b)
    return na is not None and na == nb


class MathEval(Eval):
    name = "math"

    def __init__(self, data_path: str,
                 equality_checker: Optional[Callable[[str, str], bool]] = None):
        self.rows: List[Dict[str, Any]] = []
        self.equality_checker = equality_checker
        with open(data_path, newline="") as fp:
            for raw in csv.DictReader(fp):
                self.rows.append({"Question": raw["Question"],
                                  "Answer": raw["Answer"]})

    def examples(self):
        return self.rows

    def build_prompt(self, ex):
        return QUERY_TEMPLATE.format(Question=ex["Question"])

    def score_one(self, ex, response: str) -> float:
        m = ANSWER_PATTERN.search(response or "")
        got = m.group(1) if m else None
        if answers_equal(ex["Answer"], got):
            return 1.0
        if self.equality_checker and got is not None:
            return 1.0 if self.equality_checker(ex["Answer"], got) else 0.0
        return 0.0
