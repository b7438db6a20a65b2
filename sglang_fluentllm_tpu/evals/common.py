"""Accuracy-eval harness core.

Analog of the reference's ``python/sglang/test/simple_eval_common.py`` +
``run_eval.py``: evals are host-side drivers that hit a served model over
HTTP and score its completions, so quantization/kernels claims (FP8 KV
within +-0.3 of bf16, BASELINE.json gate) are verifiable end-to-end.

Zero-egress environment note: datasets load from LOCAL csv/jsonl paths
(the reference pulls from public URLs); the bundled ``sample_data/`` files
keep the smoke tests hermetic.
"""

from __future__ import annotations

import dataclasses
import re
import time
from typing import Any, Dict, List, Optional

import httpx

ANSWER_PATTERN_MULTICHOICE = re.compile(
    r"(?i)answer\s*(?:is)?\s*:?\s*\(?([A-D])\)?"
)
ANSWER_PATTERN_NUMBER = re.compile(r"(-?[\d,]*\.?\d+)")


@dataclasses.dataclass
class EvalResult:
    score: float                  # mean accuracy in [0, 1]
    n: int
    metrics: Dict[str, Any]
    latency: float


class ChatSampler:
    """Samples completions from a served model (OpenAI chat API, falling
    back to /generate with raw prompts when no chat template exists)."""

    def __init__(self, base_url: str, model: str = "default",
                 temperature: float = 0.0, max_tokens: int = 512,
                 api_key: Optional[str] = None, use_chat: bool = True,
                 timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.use_chat = use_chat
        headers = {}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        self.client = httpx.Client(headers=headers, timeout=timeout)

    def __call__(self, prompt: str) -> str:
        if self.use_chat:
            r = self.client.post(
                f"{self.base_url}/v1/chat/completions",
                json={
                    "model": self.model,
                    "messages": [{"role": "user", "content": prompt}],
                    "temperature": self.temperature,
                    "max_tokens": self.max_tokens,
                },
            )
            r.raise_for_status()
            return r.json()["choices"][0]["message"]["content"] or ""
        r = self.client.post(
            f"{self.base_url}/generate",
            json={
                "text": prompt,
                "sampling_params": {
                    "temperature": self.temperature,
                    "max_new_tokens": self.max_tokens,
                },
            },
        )
        r.raise_for_status()
        return r.json().get("text", "")


class EngineSampler:
    """Samples directly from an in-process Engine (the FP8-vs-BF16
    compare gate runs both engines in one process, no server needed)."""

    def __init__(self, engine, temperature: float = 0.0,
                 max_tokens: int = 512):
        self.engine = engine
        self.temperature = temperature
        self.max_tokens = max_tokens

    def __call__(self, prompt: str) -> str:
        tok = self.engine.tokenizer
        try:
            ids = tok.apply_chat_template(
                [{"role": "user", "content": prompt}],
                add_generation_prompt=True, tokenize=True,
            )
        except Exception:  # noqa: BLE001
            ids = tok.encode(prompt)
        out = self.engine.generate(
            input_ids=ids,
            sampling_params={"temperature": self.temperature,
                             "max_new_tokens": self.max_tokens},
        )
        text = out.get("text")
        if not text:
            text = tok.decode(out["output_ids"])
        return text or ""


class Eval:
    """Base: subclasses provide examples() and score_one()."""

    name = "eval"

    def examples(self) -> List[Dict[str, Any]]:
        raise NotImplementedError

    def build_prompt(self, ex: Dict[str, Any]) -> str:
        raise NotImplementedError

    def score_one(self, ex: Dict[str, Any], response: str) -> float:
        raise NotImplementedError

    def run(self, sampler, num_examples: Optional[int] = None,
            num_threads: int = 8) -> EvalResult:
        import concurrent.futures as cf

        exs = self.examples()
        if num_examples:
            exs = exs[:num_examples]
        t0 = time.time()

        def one(ex):
            return self.score_one(ex, sampler(self.build_prompt(ex)))

        with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
            scores = list(pool.map(one, exs))
        dt = time.time() - t0
        score = sum(scores) / max(1, len(scores))
        return EvalResult(
            score=score, n=len(scores),
            metrics={"correct": int(sum(scores))}, latency=dt,
        )
