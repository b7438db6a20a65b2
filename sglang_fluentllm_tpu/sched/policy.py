"""Scheduling policy + prefill admission.

Analog of the reference's ``managers/schedule_policy.py`` (``SchedulePolicy:74``
— LPM / FCFS / LOF / random priority; ``PrefillAdder:251`` — token budgets for
chunked prefill with a decode-headroom estimate via ``new_token_ratio``).
"""

from __future__ import annotations

import random
from typing import List, Optional

from sglang_fluentllm_tpu.mem.radix_cache import RadixCache
from sglang_fluentllm_tpu.sched.req import Req


class SchedulePolicy:
    def __init__(self, policy: str, radix_cache: RadixCache):
        self.policy = policy
        self.radix_cache = radix_cache

    def calc_priority(self, waiting_queue: List[Req]):
        """Sort the waiting queue in place; refreshes radix prefix match."""
        if self.policy == "fcfs":
            return
        if self.policy == "random":
            random.shuffle(waiting_queue)
            return
        if self.policy == "lof":  # longest output first
            waiting_queue.sort(
                key=lambda r: -r.sampling_params.max_new_tokens
            )
            return
        # lpm: longest (cached) prefix match first
        for r in waiting_queue:
            m = self.radix_cache.match_prefix(r.fill_ids)
            r.prefix_len = m.prefix_len
            r.last_node = m.last_node
        waiting_queue.sort(key=lambda r: -r.prefix_len)


class PrefillAdder:
    """Budgets one prefill batch (reference schedule_policy.py:251-357).

    - ``rem_input_tokens``: per-forward cap (max_prefill_tokens)
    - ``rem_chunk_tokens``: chunked-prefill budget; a request that doesn't
      fit is truncated at a page boundary and re-queued as chunked
    - ``rem_total_tokens``: free+evictable KV minus a decode-headroom
      estimate for running requests (new_token_ratio feedback loop)
    """

    def __init__(
        self,
        page_size: int,
        available_tokens: int,
        evictable_tokens: int,
        running_reqs: List[Req],
        new_token_ratio: float,
        max_prefill_tokens: int,
        chunked_prefill_size: int,
    ):
        self.page_size = page_size
        decode_headroom = sum(
            min(
                r.sampling_params.max_new_tokens - len(r.output_ids), 4096
            )
            for r in running_reqs
        )
        self.rem_total_tokens = (
            available_tokens
            + evictable_tokens
            - int(decode_headroom * new_token_ratio)
        )
        self.rem_input_tokens = max_prefill_tokens
        self.rem_chunk_tokens = (
            chunked_prefill_size if chunked_prefill_size > 0 else 1 << 30
        )
        self.can_run_list: List[Req] = []
        self.new_chunked_req: Optional[Req] = None

    def add_req(self, req: Req) -> bool:
        """Try to admit; returns False when the batch is full (stop trying)."""
        extend = req.extend_len
        decode_need = req.sampling_params.max_new_tokens
        if extend > self.rem_input_tokens and self.can_run_list:
            return False
        if extend + decode_need > self.rem_total_tokens and self.can_run_list:
            return False
        if extend > self.rem_chunk_tokens:
            # truncate at page boundary -> chunked prefill
            trunc = (self.rem_chunk_tokens // self.page_size) * self.page_size
            if trunc <= 0:
                return False
            req.is_chunked = True
            req.admitted_extend = trunc
            self.can_run_list.append(req)
            self.new_chunked_req = req
            self.rem_input_tokens -= trunc
            self.rem_chunk_tokens -= trunc
            self.rem_total_tokens -= trunc
            return False  # chunked req closes the batch
        req.is_chunked = False
        req.admitted_extend = extend
        self.can_run_list.append(req)
        self.rem_input_tokens -= extend
        self.rem_chunk_tokens -= extend
        self.rem_total_tokens -= extend + decode_need
        return True
