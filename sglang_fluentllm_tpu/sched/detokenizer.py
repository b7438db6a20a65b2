"""Incremental detokenization with surrogate handling and stop-string
trimming.

Analog of the reference's ``managers/detokenizer_manager.py``
(``DetokenizerManager:66``, ``DecodeStatus:56``, ``trim_matched_stop:115`` —
semantics in SURVEY B.6): per-request offsets track decoded text; text ending
in U+FFFD (incomplete multi-byte sequence) is held back; stop strings are
trimmed from the emitted stream.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import List, Optional, Tuple

REPLACEMENT_CHAR = "�"
MAX_STATES = 1 << 15


@dataclasses.dataclass
class DecodeStatus:
    decoded_text: str = ""
    decode_ids: List[int] = dataclasses.field(default_factory=list)
    surr_offset: int = 0
    read_offset: int = 0
    sent_offset: int = 0


class Detokenizer:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.states: "OrderedDict[str, DecodeStatus]" = OrderedDict()

    def _get(self, rid: str) -> DecodeStatus:
        if rid not in self.states:
            if len(self.states) >= MAX_STATES:
                self.states.popitem(last=False)
            self.states[rid] = DecodeStatus()
        return self.states[rid]

    def detokenize_incremental(
        self,
        rid: str,
        new_token_ids: List[int],
        finished: bool,
        skip_special_tokens: bool = True,
        stop_strs: Optional[List[str]] = None,
    ) -> Tuple[str, Optional[str]]:
        """Feed newly generated ids; returns (new_text, matched_stop_str).

        matched_stop_str is non-None when a stop string completed inside the
        emitted text — the caller should finish the request and the emitted
        text is already trimmed at the match.
        """
        s = self._get(rid)
        s.decode_ids.extend(new_token_ids)

        surr_ids = s.decode_ids[s.surr_offset : s.read_offset]
        read_ids = s.decode_ids[s.surr_offset :]
        surr_text = self.tokenizer.decode(
            surr_ids, skip_special_tokens=skip_special_tokens
        )
        read_text = self.tokenizer.decode(
            read_ids, skip_special_tokens=skip_special_tokens
        )
        new_text = read_text[len(surr_text):]

        if not finished and new_text.endswith(REPLACEMENT_CHAR):
            # hold back until the multi-byte char completes
            new_text = ""
        else:
            s.surr_offset = s.read_offset
            s.read_offset = len(s.decode_ids)

        candidate = s.decoded_text + new_text
        matched_stop = None
        if stop_strs:
            for stop in stop_strs:
                pos = candidate.find(stop, max(0, s.sent_offset - len(stop)))
                if pos != -1:
                    candidate = candidate[:pos]
                    matched_stop = stop
                    break
        emit = candidate[s.sent_offset:]
        s.decoded_text = candidate
        s.sent_offset = len(candidate)
        if finished or matched_stop:
            self.states.pop(rid, None)
        return emit, matched_stop
