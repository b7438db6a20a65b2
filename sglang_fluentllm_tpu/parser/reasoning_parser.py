"""Reasoning-content parser (think-tag splitting).

Analog of the reference's ``srt/parser/reasoning_parser.py``: separates
``<think>...</think>`` (DeepSeek-R1/Qwen3 style) reasoning from the final
answer, with streaming incremental support.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class ParseResult:
    reasoning: str
    content: str


class ReasoningParser:
    def __init__(self, think_start: str = "<think>",
                 think_end: str = "</think>",
                 # R1-style models open the think block implicitly
                 implicit_open: bool = False):
        self.start = think_start
        self.end = think_end
        self.implicit_open = implicit_open
        self._in_think = implicit_open
        self._buf = ""
        self._seen_any = False

    # ------------------------------------------------------------------
    def parse_full(self, text: str) -> ParseResult:
        reasoning_parts = []
        content_parts = []
        rest = text
        in_think = self.implicit_open and not rest.lstrip().startswith(
            self.start
        )
        while rest:
            if in_think:
                idx = rest.find(self.end)
                if idx == -1:
                    reasoning_parts.append(rest)
                    rest = ""
                else:
                    reasoning_parts.append(rest[:idx])
                    rest = rest[idx + len(self.end):]
                    in_think = False
            else:
                idx = rest.find(self.start)
                if idx == -1:
                    content_parts.append(rest)
                    rest = ""
                else:
                    content_parts.append(rest[:idx])
                    rest = rest[idx + len(self.start):]
                    in_think = True
        return ParseResult(
            reasoning="".join(reasoning_parts).strip("\n"),
            content="".join(content_parts).lstrip("\n"),
        )

    # ------------------------------------------------------------------
    def parse_stream(self, delta: str) -> Tuple[str, str]:
        """Feed a streaming delta; returns (reasoning_delta, content_delta).
        Holds back partial tag matches."""
        self._buf += delta
        reasoning_out = []
        content_out = []
        while True:
            tag = self.end if self._in_think else self.start
            idx = self._buf.find(tag)
            if idx != -1:
                seg = self._buf[:idx]
                (reasoning_out if self._in_think else content_out).append(seg)
                self._buf = self._buf[idx + len(tag):]
                self._in_think = not self._in_think
                continue
            # emit all but a possible tag prefix at the end
            hold = 0
            for k in range(min(len(tag) - 1, len(self._buf)), 0, -1):
                if tag.startswith(self._buf[-k:]):
                    hold = k
                    break
            emit = self._buf[: len(self._buf) - hold]
            self._buf = self._buf[len(self._buf) - hold:]
            (reasoning_out if self._in_think else content_out).append(emit)
            break
        return "".join(reasoning_out), "".join(content_out)
