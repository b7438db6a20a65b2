"""Continuous-batching scheduler.

Analog of the reference's ``managers/scheduler.py`` (``Scheduler:170``,
``get_next_batch_to_run:1245``, ``get_new_batch_prefill:1334``,
``update_running_batch:1491``) + ``scheduler_post_process_mixin.py``.

Single-host design: the scheduler drives the ModelRunner synchronously via
``step()``; the serving layer runs this loop in a dedicated thread (overlap
scheduling exploits JAX async dispatch — device arrays are returned un-synced
and resolved one iteration later, the analog of tp_worker_overlap_thread).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_fluentllm_tpu.config import ServerArgs
from sglang_fluentllm_tpu.mem.radix_cache import RadixCache
from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata
from sglang_fluentllm_tpu.runtime.batch_builder import DecodeItem, ExtendItem
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardMode
from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner
from sglang_fluentllm_tpu.sched.policy import PrefillAdder, SchedulePolicy
from sglang_fluentllm_tpu.sched.req import Req, ReqStatus

logger = logging.getLogger(__name__)

# new_token_ratio feedback constants (reference global_config.py)
INIT_NEW_TOKEN_RATIO = 0.7
MIN_NEW_TOKEN_RATIO = 0.1
NEW_TOKEN_RATIO_DECAY_STEPS = 600


@dataclasses.dataclass
class StepOutput:
    rid: str
    output_ids: List[int]           # full output so far
    new_token_ids: List[int]        # tokens produced this step
    finished: bool
    finish_reason: Optional[Dict[str, Any]] = None
    output_token_logprobs: Optional[List[float]] = None
    cached_tokens: int = 0
    prompt_tokens: int = 0


class Scheduler:
    def __init__(self, server_args: ServerArgs, runner: ModelRunner):
        self.server_args = server_args
        self.runner = runner
        self.allocator = runner.allocator
        self.req_pool = runner.req_pool
        self.page_size = server_args.page_size
        self.tree_cache = RadixCache(
            self.page_size,
            disable=server_args.disable_radix_cache,
            eviction_policy=server_args.radix_eviction_policy,
        )
        self.policy = SchedulePolicy(
            server_args.schedule_policy, self.tree_cache
        )
        self.waiting_queue: List[Req] = []
        self.running_batch: List[Req] = []
        self.chunked_req: Optional[Req] = None
        self.new_token_ratio = INIT_NEW_TOKEN_RATIO
        self._ratio_decay = (
            INIT_NEW_TOKEN_RATIO - MIN_NEW_TOKEN_RATIO
        ) / NEW_TOKEN_RATIO_DECAY_STEPS

        # stats
        self.num_generated_tokens = 0
        self.num_retracted = 0
        self.cum_cached_tokens = 0

    # ------------------------------------------------------------------
    def add_request(self, req: Req):
        req.queued_time = time.monotonic()
        self.waiting_queue.append(req)

    def abort_request(self, rid: str):
        for r in self.waiting_queue:
            if r.rid == rid:
                r.abort()
                self.waiting_queue.remove(r)
                return True
        for r in self.running_batch:
            if r.rid == rid:
                r.abort()
                return True
        return False

    def has_work(self) -> bool:
        return bool(
            self.waiting_queue or self.running_batch or self.chunked_req
        )

    # ------------------------------------------------------------------
    def _evict_and_alloc(self, req_idx: int, alloced: int, extend: int):
        slots = self.allocator.alloc_extend(req_idx, alloced, extend)
        if slots is None:
            need = self.allocator.pages_needed(alloced, extend)
            self.tree_cache.evict(
                need - self.allocator.available_pages(),
                self.allocator.free_pages,
            )
            slots = self.allocator.alloc_extend(req_idx, alloced, extend)
        return slots

    # ------------------------------------------------------------------
    # Prefill path
    # ------------------------------------------------------------------
    def get_new_batch_prefill(self) -> Optional[List[Req]]:
        if not self.waiting_queue and self.chunked_req is None:
            return None
        candidates: List[Req] = []
        if self.chunked_req is not None:
            candidates.append(self.chunked_req)
        self.policy.calc_priority(self.waiting_queue)
        candidates.extend(self.waiting_queue)

        adder = PrefillAdder(
            self.page_size,
            self.allocator.available_tokens(),
            self.tree_cache.evictable_size,
            self.running_batch,
            self.new_token_ratio,
            self.server_args.max_prefill_tokens,
            self.server_args.chunked_prefill_size,
        )
        # room for running decode + new prefills
        max_new = self.runner.max_reqs - len(self.running_batch)
        for req in candidates:
            if len(adder.can_run_list) >= max_new:
                break
            if req.req_pool_idx is None and self.req_pool.available() == 0:
                break
            if not adder.add_req(req):
                break
        if not adder.can_run_list:
            return None
        self.chunked_req = adder.new_chunked_req
        for req in adder.can_run_list:
            if req in self.waiting_queue:
                self.waiting_queue.remove(req)
        return adder.can_run_list

    def prepare_extend_items(self, reqs: List[Req]) -> Optional[List[ExtendItem]]:
        items = []
        for req in list(reqs):
            if req.req_pool_idx is None:
                req.req_pool_idx = self.req_pool.alloc()
                assert req.req_pool_idx is not None
                # fresh request: install radix-matched prefix
                m = self.tree_cache.match_prefix(req.fill_ids)
                # never match the *entire* sequence (need >=1 token to
                # compute logits); back off one page if so
                while m.prefix_len >= req.seq_len and m.page_ids:
                    m.page_ids.pop()
                    m.prefix_len -= self.page_size
                req.prefix_len = m.prefix_len
                req.num_computed_tokens = m.prefix_len
                req.alloced_len = m.prefix_len
                req.last_node = m.last_node
                self.tree_cache.inc_lock_ref(m.last_node)
                self.allocator.set_prefix_pages(req.req_pool_idx, m.page_ids)
                self.cum_cached_tokens += m.prefix_len

            extend = min(req.admitted_extend or req.extend_len,
                         req.extend_len)
            # sanity: never extend 0 tokens
            assert extend > 0, f"zero extend for {req}"
            req._this_extend = extend  # type: ignore[attr-defined]
            slots = self._evict_and_alloc(
                req.req_pool_idx, req.num_computed_tokens, extend
            )
            if slots is None:
                # out of memory mid-preparation: return req to queue
                logger.warning("prefill OOM; requeueing %s", req.rid)
                self._release_req_kv(req)
                self.waiting_queue.insert(0, req)
                reqs.remove(req)
                continue
            start = req.num_computed_tokens
            req.alloced_len = start + extend
            items.append(
                ExtendItem(
                    input_ids=np.asarray(
                        req.fill_ids[start : start + extend], dtype=np.int32
                    ),
                    prefix_len=start,
                    slots=slots,
                    pages=self.allocator.req_pages(
                        req.req_pool_idx, start + extend
                    ),
                )
            )
        return items if items else None

    # ------------------------------------------------------------------
    # Decode path
    # ------------------------------------------------------------------
    def prepare_decode_items(self) -> Optional[List[DecodeItem]]:
        self.new_token_ratio = max(
            MIN_NEW_TOKEN_RATIO, self.new_token_ratio - self._ratio_decay
        )
        items: List[DecodeItem] = []
        i = 0
        while i < len(self.running_batch):
            req = self.running_batch[i]
            pos = req.seq_len - 1  # position of the token being fed
            slots = self._evict_and_alloc(req.req_pool_idx, pos, 1)
            if slots is None:
                # retract among reqs not yet in this batch (>= i)
                self._retract_decode(min_idx=i)
                continue  # retry (running_batch shrank)
            req.alloced_len = req.seq_len
            items.append(
                DecodeItem(
                    input_id=req.output_ids[-1],
                    seq_len=req.seq_len,
                    slot=int(slots[0]),
                    pages=self.allocator.req_pages(
                        req.req_pool_idx, req.seq_len
                    ),
                )
            )
            i += 1
        return items if items else None

    def _retract_decode(self, min_idx: int = 0):
        """Evict the newest running request back to the waiting queue
        (reference schedule_batch.py:533 retract_decode). Only requests at
        index >= min_idx are candidates (earlier ones are already in the
        batch being built)."""
        candidates = self.running_batch[min_idx:]
        assert candidates, "decode OOM with no retractable request"
        req = max(candidates, key=lambda r: r.arrival_time)
        self.running_batch.remove(req)
        self._release_req_kv(req)
        req.is_chunked = False
        self.waiting_queue.insert(0, req)
        self.new_token_ratio = INIT_NEW_TOKEN_RATIO
        self.num_retracted += 1
        logger.info("retracted %s (decode OOM)", req.rid)

    def _release_req_kv(self, req: Req):
        """Free all device KV held by the request; keep radix-shared pages."""
        if req.req_pool_idx is None:
            return
        total = max(req.alloced_len, req.num_computed_tokens, 1)
        tree_pages = (
            self.tree_cache.match_prefix(req.fill_ids).page_ids
            if not self.tree_cache.disable
            else []
        )
        self.allocator.free_req_pages(
            req.req_pool_idx, total, skip_pages=tree_pages
        )
        if req.last_node is not None:
            self.tree_cache.dec_lock_ref(req.last_node)
            req.last_node = None
        self.req_pool.free(req.req_pool_idx)
        req.req_pool_idx = None
        req.num_computed_tokens = 0
        req.alloced_len = 0
        req.prefix_len = 0

    # ------------------------------------------------------------------
    # Radix caching of computed prefixes
    # ------------------------------------------------------------------
    def _cache_computed_prefix(self, req: Req, unfinished: bool):
        """Insert the page-aligned computed tokens into the radix tree and
        reconcile page ownership (reference cache_finished_req /
        cache_unfinished_req, radix_cache.py:312-421)."""
        if self.tree_cache.disable:
            if not unfinished:
                self.allocator.free_req_pages(
                    req.req_pool_idx, req.num_computed_tokens
                )
            return
        ps = self.page_size
        n_tok = req.num_computed_tokens
        aligned = (n_tok // ps) * ps
        ids = req.fill_ids[:aligned]
        my_pages = [
            int(p) for p in self.allocator.req_pages(req.req_pool_idx, aligned)
        ]
        self.tree_cache.insert(ids, my_pages)
        m = self.tree_cache.match_prefix(ids)
        tree_pages = m.page_ids
        # free any of our pages the tree didn't adopt (duplicates), and
        # install the tree's pages so our page table matches shared state
        dup = [
            p for p, tp in zip(my_pages, tree_pages) if p != tp
        ]
        if dup:
            self.allocator.free_pages(dup)
        self.allocator.set_prefix_pages(req.req_pool_idx, tree_pages)
        # move the lock to the deeper node
        old_node = req.last_node
        self.tree_cache.inc_lock_ref(m.last_node)
        if old_node is not None:
            self.tree_cache.dec_lock_ref(old_node)
        req.last_node = m.last_node

        if not unfinished:
            # free the unaligned tail + release everything
            self.allocator.free_req_pages(
                req.req_pool_idx,
                total_len=n_tok,
                keep_len=aligned,
            )
            self.tree_cache.dec_lock_ref(req.last_node)
            req.last_node = None
            self.req_pool.free(req.req_pool_idx)
            req.req_pool_idx = None

    # ------------------------------------------------------------------
    # Main iteration
    # ------------------------------------------------------------------
    def step(self) -> List[StepOutput]:
        """One scheduling iteration (event_loop_normal body)."""
        prefill_reqs = self.get_new_batch_prefill()
        if prefill_reqs:
            items = self.prepare_extend_items(prefill_reqs)
            if items:
                return self._run_extend(prefill_reqs, items)
        if self.running_batch:
            items = self.prepare_decode_items()
            if items:
                return self._run_decode(items)
        return []

    def _sampling_meta(self, reqs: List[Req], pad_to: int) -> SamplingMetadata:
        sps = [r.sampling_params for r in reqs]
        return SamplingMetadata.from_lists(
            [sp.temperature for sp in sps],
            [sp.top_p for sp in sps],
            [sp.top_k for sp in sps],
            [sp.min_p for sp in sps],
            pad_to,
        )

    def _run_extend(self, reqs: List[Req], items) -> List[StepOutput]:
        batch = self.runner.batch_builder.build_extend(items)
        sampling = self._sampling_meta(reqs, batch.batch_size)
        ids, logprobs = self.runner.forward_batch_generation(batch, sampling)
        ids = np.asarray(ids)
        logprobs = np.asarray(logprobs)

        outputs = []
        for i, req in enumerate(reqs):
            req.num_computed_tokens += req._this_extend  # type: ignore
            if req.is_chunked:
                # mid-chunk: no token sampled; publish prefix into the tree
                self._cache_computed_prefix(req, unfinished=True)
                continue
            if req.sampling_params.max_new_tokens == 0:
                # nothing to generate: prefill-only request (scoring/warmup)
                req.check_finished()
            else:
                token = int(ids[i])
                req.output_ids.append(token)
                req.output_token_logprobs.append(float(logprobs[i]))
                if req.first_token_time is None:
                    req.first_token_time = time.monotonic()
                self.num_generated_tokens += 1
                req.check_finished()
            if req.finished():
                req.finish_time = time.monotonic()
                self._cache_computed_prefix(req, unfinished=False)
            else:
                # share the prompt KV immediately (reference caches
                # unfinished prefill so parallel reqs reuse it)
                self._cache_computed_prefix(req, unfinished=True)
                req.status = ReqStatus.RUNNING
                self.running_batch.append(req)
            outputs.append(self._make_output(req))
        return outputs

    def _run_decode(self, items) -> List[StepOutput]:
        reqs = list(self.running_batch)
        batch = self.runner.batch_builder.build_decode(items)
        sampling = self._sampling_meta(reqs, batch.batch_size)
        ids, logprobs = self.runner.forward_batch_generation(batch, sampling)
        ids = np.asarray(ids)
        logprobs = np.asarray(logprobs)

        outputs = []
        still_running = []
        for i, req in enumerate(reqs):
            req.num_computed_tokens += 1
            token = int(ids[i])
            req.output_ids.append(token)
            req.output_token_logprobs.append(float(logprobs[i]))
            self.num_generated_tokens += 1
            req.check_finished()
            if req.finished():
                req.finish_time = time.monotonic()
                self._cache_computed_prefix(req, unfinished=False)
            else:
                still_running.append(req)
            outputs.append(self._make_output(req))
        self.running_batch = still_running
        return outputs

    def _make_output(self, req: Req) -> StepOutput:
        new = req.output_ids[req.stream_sent_len :]
        req.stream_sent_len = len(req.output_ids)
        return StepOutput(
            rid=req.rid,
            output_ids=list(req.output_ids),
            new_token_ids=new,
            finished=req.finished(),
            finish_reason=(
                req.finish_reason.to_dict() if req.finish_reason else None
            ),
            output_token_logprobs=(
                list(req.output_token_logprobs)
                if req.sampling_params.return_logprob
                else None
            ),
            cached_tokens=req.prefix_len,
            prompt_tokens=len(req.origin_input_ids),
        )

    # ------------------------------------------------------------------
    def flush_cache(self) -> bool:
        """Reference scheduler.py:1793 flush_cache: only when idle."""
        if self.running_batch or self.waiting_queue or self.chunked_req:
            return False
        self.tree_cache.reset()
        self.allocator.clear()
        self.req_pool.clear()
        return True
