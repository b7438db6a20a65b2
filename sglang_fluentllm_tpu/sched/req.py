"""Per-request state machine.

Analog of the reference's ``managers/req.py`` (``Req:192``,
``FINISH_*:32-88``): token ids, cached-prefix bookkeeping, radix-node lock,
finish conditions, logprobs, and chunked-prefill progress.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Any, Dict, List, Optional

from sglang_fluentllm_tpu.sched.sampling_params import SamplingParams


class ReqStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    ABORTED = "aborted"


@dataclasses.dataclass
class FinishReason:
    kind: str                      # "stop" | "eos" | "length" | "abort"
    matched_token: Optional[int] = None
    matched_str: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {"type": self.kind}
        if self.matched_token is not None:
            d["matched"] = self.matched_token
        if self.matched_str is not None:
            d["matched"] = self.matched_str
        return d


class Req:
    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        eos_token_ids: Optional[set] = None,
        arrival_time: Optional[float] = None,
    ):
        self.rid = rid
        self.origin_input_ids = list(input_ids)
        self.sampling_params = sampling_params
        self.eos_token_ids = eos_token_ids or set()

        self.output_ids: List[int] = []
        self.status = ReqStatus.WAITING
        self.finish_reason: Optional[FinishReason] = None

        # --- KV bookkeeping ---
        self.req_pool_idx: Optional[int] = None
        self.prefix_len = 0              # radix-matched cached tokens
        self.num_computed_tokens = 0     # tokens with valid KV (verified)
        self.last_node = None            # locked radix node

        # --- chunked prefill ---
        self.is_chunked = False
        self.admitted_extend = 0     # extend granted by PrefillAdder
        self.alloced_len = 0         # KV slots reserved (>= num_computed)

        # --- overlap scheduling (SURVEY A.4) ---
        self.inflight = 0            # sampled-but-unresolved tokens
        self.last_future_slot: Optional[int] = None  # ring slot of newest

        # --- constrained decoding ---
        self.grammar = None          # constrained.backend.Grammar
        self.grammar_future = None   # pending compile

        # --- logprobs ---
        self.output_token_logprobs: List[float] = []
        # per output token: [(logprob, token_id), ...] top-k entries
        self.output_top_logprobs: List[list] = []
        # per prompt token (None where unavailable: first token, cached
        # prefix, chunk boundaries)
        self.input_token_logprobs: List = []

        # --- spec decode ---
        self.spec_accept_lengths: List[int] = []

        # --- timing (RequestStage analog) ---
        self.arrival_time = arrival_time or time.monotonic()
        self.queued_time: Optional[float] = None
        self.dequeued_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None

        # streaming
        self.stream_sent_len = 0         # output tokens already emitted

    # ------------------------------------------------------------------
    @property
    def fill_ids(self) -> List[int]:
        return self.origin_input_ids + self.output_ids

    @property
    def seq_len(self) -> int:
        return len(self.origin_input_ids) + len(self.output_ids)

    @property
    def extend_len(self) -> int:
        """Tokens that still need KV computation."""
        return self.seq_len - self.num_computed_tokens

    def finished(self) -> bool:
        return self.status in (ReqStatus.FINISHED, ReqStatus.ABORTED)

    # ------------------------------------------------------------------
    def stop_ids_array(self):
        """np array of tokens that end the request mid-window (eos unless
        ignore_eos + stop_token_ids), or None; cached per request for the
        scheduler's vectorized resolve fast path."""
        cached = getattr(self, "_stop_ids_np", False)
        if cached is not False:
            return cached
        import numpy as np

        sp = self.sampling_params
        ids = []
        if not sp.ignore_eos and self.eos_token_ids:
            ids.extend(self.eos_token_ids)
        if sp.stop_token_ids:
            ids.extend(sp.stop_token_ids)
        arr = np.asarray(sorted(set(ids)), np.int64) if ids else None
        self._stop_ids_np = arr
        return arr

    def check_finished(self):
        """Reference req.py:523 check_finished semantics."""
        if self.finished():
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finish_reason = FinishReason("length")
            self.status = ReqStatus.FINISHED
            return
        if not self.output_ids:
            return
        last = self.output_ids[-1]
        if not sp.ignore_eos and last in self.eos_token_ids:
            self.finish_reason = FinishReason("eos", matched_token=last)
            self.status = ReqStatus.FINISHED
            return
        if last in (sp.stop_token_ids or ()):
            self.finish_reason = FinishReason("stop", matched_token=last)
            self.status = ReqStatus.FINISHED
            return

    def set_finished_by_stop_str(self, stop_str: str):
        self.finish_reason = FinishReason("stop", matched_str=stop_str)
        self.status = ReqStatus.FINISHED

    def abort(self):
        if not self.finished():
            self.finish_reason = FinishReason("abort")
            self.status = ReqStatus.ABORTED

    def __repr__(self):
        return (
            f"Req({self.rid}, in={len(self.origin_input_ids)}, "
            f"out={len(self.output_ids)}, {self.status.value})"
        )
