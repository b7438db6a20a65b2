"""MGSM eval — multilingual grade-school math.

Behavioral analog of reference ``python/sglang/test/simple_eval_mgsm.py``:
per-language instruction wrapping, answer extraction after a localized
"Answer:" prefix (last number wins), integer comparison. Data loads from
LOCAL tsv files named ``mgsm_<lang>.tsv`` (``question\\tanswer`` per line —
the exact layout the reference streams from its URLs).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

from sglang_fluentllm_tpu.evals.common import Eval

ALL_LANGUAGES = ["bn", "de", "en", "es", "fr", "ja", "ru", "sw", "te", "th", "zh"]
LATIN_LANGUAGES = ["de", "en", "es", "fr", "sw"]

_EN_INSTRUCTION = (
    'Solve this math problem. Give the reasoning steps before giving the '
    'final answer on the last line by itself in the format of "Answer:". '
    'Do not add anything other than the integer answer after "Answer:".'
    "\n\n{input}"
)

# Localized instruction templates for the Latin-script languages; the
# non-Latin ones fall back to English instructions with the localized
# answer prefix still honored at extraction time.
LANG_TO_INSTRUCTIONS: Dict[str, str] = {
    "en": _EN_INSTRUCTION,
    "de": (
        "Löse dieses Mathematikproblem. Gib die Schritte zur Begründung an, "
        "bevor du die endgültige Antwort in der letzten Zeile alleine im "
        'Format "Antwort:" gibst. Füge nichts anderes als die ganzzahlige '
        'Antwort nach "Antwort:" hinzu.\n\n{input}'
    ),
    "es": (
        "Resuelve este problema matemático. Proporciona los pasos de "
        "razonamiento antes de dar la respuesta final en la última línea "
        'por sí misma en el formato de "Respuesta:". No añadas nada más que '
        'la respuesta entera después de "Respuesta:".\n\n{input}'
    ),
    "fr": (
        "Résolvez ce problème de mathématiques. Donnez les étapes de "
        "raisonnement avant de fournir la réponse finale sur la dernière "
        'ligne elle-même dans le format de "Réponse:". N\'ajoutez rien '
        'd\'autre que la réponse entière après "Réponse:".\n\n{input}'
    ),
}

LANG_TO_ANSWER_PREFIX = {
    "en": "Answer", "bn": "উত্তর", "de": "Antwort", "es": "Respuesta",
    "fr": "Réponse", "ja": "答え", "ru": "Ответ", "sw": "Jibu",
    "te": "సమాధానం", "th": "คำตอบ", "zh": "答案",
}


def parse_answer(answer: str, answer_prefix: str) -> str:
    """ref simple_eval_mgsm.parse_answer:90-101 — last number after the
    localized prefix, comma-stripped, trailing dot removed."""
    if answer_prefix not in (answer or ""):
        return ""
    tail = answer.split(answer_prefix)[-1].strip()
    numbers = re.findall(r"\d+\.?\d*", tail.replace(",", ""))
    return numbers[-1].rstrip(".") if numbers else ""


def score_mgsm(target: str, prediction: str) -> bool:
    """ref simple_eval_mgsm.score_mgsm:104-111."""
    if "." in prediction:
        prediction = prediction.rstrip("0").rstrip(".")
    return target.replace(",", "") == prediction.replace(",", "")


class MGSMEval(Eval):
    name = "mgsm"

    def __init__(self, data_path: str,
                 languages: Optional[List[str]] = None,
                 num_examples_per_lang: Optional[int] = None):
        """data_path: a single ``mgsm_<lang>.tsv`` file, or a directory
        holding several; languages filters when a directory is given."""
        self.rows: List[Dict[str, Any]] = []
        files: List[str] = []
        if os.path.isdir(data_path):
            langs = languages or ALL_LANGUAGES
            for lang in langs:
                p = os.path.join(data_path, f"mgsm_{lang}.tsv")
                if os.path.exists(p):
                    files.append(p)
        else:
            files.append(data_path)
        for p in files:
            base = os.path.basename(p)
            m = re.match(r"mgsm_(\w+)\.tsv", base)
            lang = m.group(1) if m else "en"
            if lang not in ALL_LANGUAGES:
                raise ValueError(f"unknown MGSM language {lang!r}")
            n = 0
            with open(p, encoding="utf-8") as fp:
                for line in fp:
                    line = line.strip()
                    if not line:
                        continue
                    q, target = line.split("\t")
                    self.rows.append({"input": q, "target": target,
                                      "lang": lang})
                    n += 1
                    if num_examples_per_lang and n >= num_examples_per_lang:
                        break

    def examples(self):
        return self.rows

    def build_prompt(self, ex):
        tpl = LANG_TO_INSTRUCTIONS.get(ex["lang"], _EN_INSTRUCTION)
        return tpl.format(input=ex["input"])

    def score_one(self, ex, response: str) -> float:
        prefix = LANG_TO_ANSWER_PREFIX[ex["lang"]]
        got = parse_answer(response or "", prefix)
        # the English prefix is accepted for any language (models often
        # answer in English regardless of the prompt language)
        if not got and prefix != "Answer":
            got = parse_answer(response or "", "Answer")
        return 1.0 if score_mgsm(ex["target"], got) else 0.0
