"""Per-request sampling parameters.

Analog of the reference's ``srt/sampling/sampling_params.py``
(``SamplingParams:21``): user-facing knobs with validation; device-side batch
tensors live in ``ops/sampler.py SamplingMetadata``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union


@dataclasses.dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    n: int = 1
    # constrained decoding
    json_schema: Optional[str] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    # logprobs
    return_logprob: bool = False
    top_logprobs_num: int = 0
    logprob_start_len: int = -1
    # thinking-budget truncation (reference sampling_params.py:52):
    # after ``thinking_budget`` generated tokens the sampler force-emits
    # the think-end token; deactivates if the model closes naturally.
    # ``think_end_id`` comes from the tokenizer ("</think>") or may be
    # given explicitly (tokenizer-free serving).
    thinking_budget: Optional[int] = None
    think_end_id: Optional[int] = None
    # custom logit processor: serialized CustomLogitProcessor (to_str)
    # + its per-request params; requires --enable-custom-logit-processor
    custom_logit_processor: Optional[str] = None
    custom_params: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        self.verify()

    def verify(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError("top_k must be -1 (disabled) or >= 1")
        if not 0 <= self.min_p <= 1:
            raise ValueError("min_p must be in [0, 1]")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0")
        if self.thinking_budget is not None and self.thinking_budget <= 0:
            raise ValueError("thinking_budget must be > 0")
        n_constraints = sum(
            x is not None for x in (self.json_schema, self.regex, self.ebnf)
        )
        if n_constraints > 1:
            raise ValueError("at most one of json_schema/regex/ebnf")
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        self.stop = self.stop or []
        self.stop_token_ids = list(self.stop_token_ids or [])

    @classmethod
    def from_dict(cls, d: Optional[Dict[str, Any]]) -> "SamplingParams":
        if d is None:
            return cls()
        if isinstance(d, SamplingParams):
            return d
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @property
    def needs_penalties(self) -> bool:
        return (
            self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
            or self.repetition_penalty != 1.0
            or self.min_new_tokens > 0
        )


def resolve_think_end_id(sp: "SamplingParams", tokenizer) -> None:
    """Fill ``think_end_id`` from the tokenizer's ``</think>`` token when
    a thinking budget is requested without an explicit id (reference
    reads ``tokenizer.think_end_id``, sampling_batch_info.py:88)."""
    if not sp.thinking_budget or sp.think_end_id is not None:
        return
    if tokenizer is None:
        return
    tid = getattr(tokenizer, "think_end_id", None)
    if tid is None:
        try:
            tid = tokenizer.convert_tokens_to_ids("</think>")
            unk = getattr(tokenizer, "unk_token_id", None)
            if tid is None or tid < 0 or tid == unk:
                tid = None
        except Exception:  # noqa: BLE001
            tid = None
    sp.think_end_id = tid
