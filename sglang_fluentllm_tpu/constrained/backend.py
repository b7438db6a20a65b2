"""Grammar backend: compile cache + per-request FSM state.

Analog of the reference's ``constrained/base_grammar_backend.py`` (compile
cache keyed by (type, expression) with executor-thread futures, ``:34-77``)
over the in-house regex/JSON-schema engine (regex_fsm.py) instead of
xgrammar/outlines native cores.
"""

from __future__ import annotations

import concurrent.futures
import logging
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_fluentllm_tpu.constrained.json_schema import schema_to_regex
from sglang_fluentllm_tpu.constrained.regex_fsm import RegexGuide

logger = logging.getLogger(__name__)


class Grammar:
    """Per-request FSM cursor over a shared compiled guide."""

    def __init__(self, guide: RegexGuide):
        self.guide = guide
        self.state = guide.start_state
        self.terminated = False

    def allowed_bitmask(self) -> Optional[np.ndarray]:
        if self.terminated:
            return None
        return self.guide.allowed_mask(self.state)

    def accept(self, token_id: int):
        if self.terminated:
            return
        nxt = self.guide.advance(self.state, token_id)
        if nxt == -1:
            self.terminated = True
        else:
            self.state = nxt

    def jump_forward_tokens(self) -> List[int]:
        if self.terminated:
            return []
        return self.guide.jump_forward(self.state)


class GrammarBackend:
    """Builds guides against the tokenizer vocab; caches by expression."""

    def __init__(self, tokenizer, vocab_size: int, eos_token_ids,
                 recursion_depth: Optional[int] = None):
        from sglang_fluentllm_tpu.constrained.json_schema import (
            DEFAULT_RECURSION_DEPTH,
        )

        self.vocab_size = vocab_size
        self.eos_token_ids = sorted(eos_token_ids)
        # bounded-stack depth for recursive schemas/EBNF (VERDICT r2 #6)
        self.recursion_depth = recursion_depth or DEFAULT_RECURSION_DEPTH
        self._vocab_strings = self._build_vocab_strings(tokenizer)
        self._cache: Dict[Tuple[str, str], concurrent.futures.Future] = {}
        self._lock = threading.Lock()
        self._executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="grammar"
        )

    def _build_vocab_strings(self, tokenizer) -> List[str]:
        strings = [""] * self.vocab_size
        if tokenizer is None:
            return strings
        special = set(getattr(tokenizer, "all_special_ids", []) or [])
        for tid in range(self.vocab_size):
            if tid in special:
                continue  # special tokens never match grammar text
            try:
                strings[tid] = tokenizer.decode([tid])
            except Exception:
                strings[tid] = ""
        return strings

    # ------------------------------------------------------------------
    def _compile(self, kind: str, expr: str) -> RegexGuide:
        import time as _time

        t0 = _time.monotonic()
        if kind == "json_schema":
            pattern = schema_to_regex(expr, max_depth=self.recursion_depth)
        elif kind == "regex":
            pattern = expr
        elif kind == "ebnf":
            from sglang_fluentllm_tpu.constrained.json_schema import (
                build_regex_from_ebnf,
            )

            pattern = build_regex_from_ebnf(
                expr, max_depth=self.recursion_depth
            )
        else:
            raise ValueError(f"unsupported grammar kind {kind}")
        try:
            guide = RegexGuide(
                pattern, self._vocab_strings, self.eos_token_ids
            )
        except Exception:
            self._metric("num_grammar_aborted")
            raise
        logger.info(
            "compiled %s grammar: %d dfa states", kind, len(guide._masks)
        )
        from sglang_fluentllm_tpu.metrics import collector as _mc

        if _mc.ACTIVE is not None:
            _mc.ACTIVE.grammar_compilation_time.labels(
                **_mc.ACTIVE._labels).observe(_time.monotonic() - t0)
        return guide

    @staticmethod
    def _metric(name: str):
        from sglang_fluentllm_tpu.metrics import collector as _mc

        if _mc.ACTIVE is not None:
            getattr(_mc.ACTIVE, name).labels(**_mc.ACTIVE._labels).inc()

    def get_future(self, kind: str, expr: str) -> concurrent.futures.Future:
        key = (kind, expr)
        self._metric("num_grammar_total")
        with self._lock:
            fut = self._cache.get(key)
            if fut is None:
                fut = self._executor.submit(self._compile, kind, expr)
                self._cache[key] = fut
            else:
                self._metric("num_grammar_cache_hit")
        return fut

    def grammar_for(self, sampling_params) -> Optional[
        concurrent.futures.Future
    ]:
        if sampling_params.json_schema is not None:
            return self.get_future("json_schema", sampling_params.json_schema)
        if sampling_params.regex is not None:
            return self.get_future("regex", sampling_params.regex)
        if sampling_params.ebnf is not None:
            return self.get_future("ebnf", sampling_params.ebnf)
        return None
