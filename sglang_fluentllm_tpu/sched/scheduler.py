"""Continuous-batching scheduler with overlap scheduling.

Analog of the reference's ``managers/scheduler.py`` (``Scheduler:170``,
``get_next_batch_to_run:1245``, ``get_new_batch_prefill:1334``,
``update_running_batch:1491``) + ``scheduler_post_process_mixin.py`` +
``tp_worker_overlap_thread.py`` (overlap protocol, SURVEY A.4).

Overlap design (TPU translation of the reference's future-token protocol):
``step()`` first LAUNCHES the next batch — decode inputs are negative
placeholders resolved on-device from the runner's future-token ring — and
only then RESOLVES the previous batch's sampled ids (host sync). The device
therefore always has work queued while the host processes results and builds
the following batch; a request that finishes at resolve time may have one
extra speculative decode in flight whose token is discarded (zombie step),
exactly like the reference.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Dict, List, Optional

import jax
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
    output_top_logprobs: Optional[List[list]] = None
    input_token_logprobs: Optional[List] = None
    cached_tokens: int = 0
    prompt_tokens: int = 0


@dataclasses.dataclass
class InFlightBatch:
    """A launched-but-unresolved forward (the overlap window)."""

    reqs: List[Req]
    mode: ForwardMode
    ids_dev: Any
    logprobs_dev: Any
    this_extends: Optional[List[int]] = None  # per-req extend (extend mode)
    # whether row i sampled a token, captured at LAUNCH time (req.is_chunked
    # may be mutated by the next admission before this batch resolves)
    sampled: Optional[List[bool]] = None
    seq: int = 0                     # launch sequence number
    counts_dev: Any = None           # spec decode: accept counts [B]
    mixed_decode: Optional[List[bool]] = None  # rows that are decode steps
    future_offset: Optional[int] = None  # ring base this launch wrote
    t_launch: float = 0.0            # wall time at launch (metrics)
    # (topk_vals, topk_ids, input_logprobs) device arrays; zero-size
    # placeholders when unrequested
    extras_dev: Any = None
    # DP-attention: device row index per req (group-major layout with
    # per-group padding); None = identity
    rows: Optional[List[int]] = None
    # whether _resolve must fetch logprobs_dev (any return_logprob row or
    # NaN detection); greedy windows carry an all-zero array that is never
    # read — skipping it saves one D2H round trip per window (~25 ms fixed
    # per array on tunneled backends)
    lp_needed: bool = True
    # background fetch result (scheduler's fetch thread; round 5: a
    # blocking device_get costs ~60 ms flat through the tunnel and
    # stalls the DISPATCH stream while it waits — profiled in
    # perf/jaxprof_try_r5.log — so the fetch runs off-thread and the
    # loop only joins a finished future)
    host_future: Any = None

    def fetch_host(self):
        """All host-side arrays this batch's resolve needs (runs on the
        fetch thread; single worker keeps FIFO order)."""
        out = {"ids": jax.device_get(self.ids_dev)}
        if self.lp_needed:
            out["logprobs"] = jax.device_get(self.logprobs_dev)
        if self.counts_dev is not None:
            out["counts"] = jax.device_get(self.counts_dev)
        if self.extras_dev is not None:
            tv, ti, il = self.extras_dev
            if tv.size:
                out["tk"] = jax.device_get((tv, ti))
            if il.size:
                out["inp_lp"] = jax.device_get(il)
        return out

    def __post_init__(self):
        # start D2H transfers NOW: the device finishes this window while
        # later windows queue, so the copies overlap their compute and
        # _resolve's device_get finds the bytes already on host instead of
        # paying the tunnel round trip per array serially at resolve time
        arrays = [self.ids_dev, self.counts_dev]
        if self.lp_needed:
            arrays.append(self.logprobs_dev)
        if self.extras_dev is not None:
            arrays.extend(self.extras_dev)
        for a in arrays:
            if a is not None and getattr(a, "size", 0) and hasattr(
                    a, "copy_to_host_async"):
                try:
                    a.copy_to_host_async()
                except Exception:  # noqa: BLE001 - committed arrays only
                    pass


# Max launched-but-unresolved batches. Depth 1 would idle the device during
# host batch-prep + tunnel dispatch latency; deeper pipelining keeps the
# device queue non-empty (tokens still stream out with ~depth steps of lag).
MAX_INFLIGHT_BATCHES = 4


class _BestPrefixView:
    """Read-only multi-tree view for the LPM policy under DP-attention:
    priority = best prefix match across all group trees."""

    def __init__(self, trees):
        self.trees = trees

    def match_prefix(self, token_ids):
        return max(
            (t.match_prefix(token_ids) for t in self.trees),
            key=lambda m: m.prefix_len,
        )


class Scheduler:
    def __init__(self, server_args: ServerArgs, runner: ModelRunner):
        self.server_args = server_args
        self.runner = runner
        self.allocator = runner.allocator
        self.req_pool = runner.req_pool
        self.page_size = server_args.page_size
        from sglang_fluentllm_tpu.mem.radix_cache_cpp import (
            create_radix_cache,
        )

        # DP-attention: one radix tree per attention group (each group owns
        # a private pool slice; prefix pages are only valid in their owner
        # group — reference dp-attention keeps per-rank tree caches)
        self.dp_groups = getattr(runner, "dp_attn_size", 1)
        self.tree_caches = [
            create_radix_cache(
                self.page_size,
                disable=server_args.disable_radix_cache,
                eviction_policy=server_args.radix_eviction_policy,
                prefer_native=not server_args.disable_native_radix,
            )
            for _ in range(self.dp_groups)
        ]
        self.tree_cache = self.tree_caches[0]
        self.policy = SchedulePolicy(
            server_args.schedule_policy,
            self.tree_cache if self.dp_groups == 1
            else _BestPrefixView(self.tree_caches),
        )
        self.waiting_queue: List[Req] = []
        self.running_batch: List[Req] = []
        self.chunked_req: Optional[Req] = None
        self.pending: List[InFlightBatch] = []  # FIFO, oldest first
        self.overlap = not server_args.disable_overlap_schedule
        self.max_inflight = (
            server_args.overlap_pipeline_depth if self.overlap else 1
        )
        self._launch_seq = 0
        # single-worker fetch thread: D2H joins happen off the dispatch
        # path (see InFlightBatch.fetch_host); one worker preserves FIFO
        from concurrent.futures import ThreadPoolExecutor

        self._fetch_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="d2h-fetch"
        )
        # Speculative windows PIPELINE (spec x overlap): accept lengths and
        # last-accepted tokens stay device-resident in the runner's future
        # rings, so window n+1 launches while window n is unresolved
        # (reference eagle_worker_overlap.py:86). PLD pipelines too: its
        # drafts come from the RESOLVED host history (lagging in-flight
        # tokens); verify catches the staleness — stale drafts reject.
        self.spec = runner.spec_worker

        # KV block events for external KV-aware routers
        # (reference disaggregation/kv_events.py)
        self.kv_events = None
        if server_args.enable_kv_events:
            from sglang_fluentllm_tpu.disagg.kv_events import (
                KVEventPublisher,
            )

            self.kv_events = KVEventPublisher(
                server_args.kv_events_endpoint
            )

        # hierarchical KV cache (device -> host -> storage)
        self.hicache = None
        if server_args.enable_hierarchical_cache:
            from sglang_fluentllm_tpu.mem.hicache import HiCacheController
            from sglang_fluentllm_tpu.mem.hicache_storage import (
                create_storage_backend,
            )

            host_tokens = server_args.hicache_size or int(
                server_args.hicache_ratio * runner.max_total_tokens
            )
            self.hicache = HiCacheController(
                runner,
                self.page_size,
                host_tokens,
                storage=create_storage_backend(
                    server_args.hicache_storage_backend,
                    address=server_args.hicache_storage_remote_addr,
                ),
            )
        self.new_token_ratio = INIT_NEW_TOKEN_RATIO
        self._ratio_decay = (
            INIT_NEW_TOKEN_RATIO - MIN_NEW_TOKEN_RATIO
        ) / NEW_TOKEN_RATIO_DECAY_STEPS

        # requests parked while a hicache host->device load is in flight
        self._hicache_loading: List[tuple] = []
        # per-rid chunk-completion listeners (PD layer-wise KV streaming:
        # the prefill server registers a callback that ships each
        # page-aligned chunk while later chunks still compute — reference
        # prefill.py:599 send_kv_chunk / mooncake LayerWiseTask role)
        self.chunk_listeners: Dict[str, Any] = {}

        # Deferred frees: a page freed while a forward is in flight may
        # still be read by that forward; it returns to the free list only
        # once every forward launched before the free has resolved
        # (reference allocator free_group semantics, SURVEY A.1). Groups are
        # tagged with the newest launch seq at free time.
        self._deferred_frees: List[tuple] = []  # (tag_seq, pages)
        self.allocator.free_group_begin()

        # stats
        self.num_generated_tokens = 0
        self.recent_queue_times: List[float] = []
        self.spec_accept_sum = 0
        self.spec_accept_ct = 0
        self.num_cached_prompt_tokens = 0
        self.num_jump_forward_tokens = 0
        self.num_prompt_tokens_seen = 0
        self.num_retracted = 0
        self.cum_cached_tokens = 0
        # retract-resume: re-admissions whose cached prefix covered the
        # KV published at retraction time (no re-prefill of it)
        self.retract_resume_hits = 0
        self.num_prebuilt_admitted = 0

    # ------------------------------------------------------------------
    def add_request(self, req: Req):
        req.queued_time = time.monotonic()
        self.waiting_queue.append(req)

    def abort_request(self, rid: str) -> bool:
        for r in list(self.waiting_queue):
            if r.rid == rid:
                r.abort()
                self.waiting_queue.remove(r)
                return True
        for r in self.running_batch:
            if r.rid == rid:
                self.finish_request(r, abort=True)
                return True
        return False

    def finish_request(self, req: Req, abort: bool = False):
        """External finish (stop-string from detokenizer, abort)."""
        if abort:
            req.abort()
        if req in self.running_batch:
            self.running_batch.remove(req)
        if req.inflight == 0:
            self._finalize_req(req)

    def has_work(self) -> bool:
        return bool(
            self.waiting_queue
            or self.running_batch
            or self.chunked_req
            or self.pending
            or self._hicache_loading
        )

    # ------------------------------------------------------------------
    def _tree_for(self, req_idx: int):
        """The radix tree of the request's DP-attention group."""
        return self.tree_caches[self.allocator.group_of(req_idx)]

    def _evict_and_alloc(self, req_idx: int, alloced: int, extend: int):
        slots = self.allocator.alloc_extend(req_idx, alloced, extend)
        if slots is None:
            g = self.allocator.group_of(req_idx)
            need = self.allocator.pages_needed(alloced, extend)
            # evicted pages are unlocked (no scheduled request reads them;
            # a zombie overlap step may read stale data but its token is
            # discarded) -> reusable immediately, bypassing the deferral
            self.tree_caches[g].evict(
                need - self.allocator.available_pages(g),
                self.allocator.release_pages,
                on_evict=self._on_evict_hook(),
            )
            slots = self.allocator.alloc_extend(req_idx, alloced, extend)
        return slots

    def _on_evict_hook(self):
        """Combined eviction callback: hicache write-back + KV events."""
        if self.hicache is None and self.kv_events is None:
            return None

        def hook(token_prefix, pages):
            if self.hicache is not None:
                self.hicache.write_back_async(token_prefix, pages)
            if self.kv_events is not None:
                n = len(pages) * self.page_size
                self.kv_events.block_removed(token_prefix[-n:], pages)

        return hook

    # ------------------------------------------------------------------
    # Prefill path
    # ------------------------------------------------------------------
    def _try_admit_prebuilt(self, req: Req) -> bool:
        """PD prebuilt-batch entry (reference decode.py:994): a transferred
        request whose page-aligned prompt KV is fully present enters decode
        DIRECTLY — first token preset, no tail re-extend."""
        if not getattr(req, "pd_prebuilt", False):
            return False
        if req.req_pool_idx is not None or not req.output_ids:
            return False
        prompt_len = len(req.origin_input_ids)
        if prompt_len % self.page_size != 0 or prompt_len == 0:
            return False
        if (
            self.req_pool.available() == 0
            or len(self.running_batch) >= self.runner.max_reqs
        ):
            return False
        if self.dp_groups > 1:
            return False  # PD is gated off under DP-attention anyway
        tree = self.tree_caches[0]
        m = tree.match_prefix(req.fill_ids[:prompt_len])
        if m.prefix_len < prompt_len:
            return False  # KV incomplete: normal prefill path
        req.req_pool_idx = self.req_pool.alloc()
        if req.dequeued_time is None:
            req.dequeued_time = time.monotonic()
        tree.inc_lock_ref(m.last_node)
        req.last_node = m.last_node
        self.allocator.set_prefix_pages(req.req_pool_idx, m.page_ids)
        req.prefix_len = prompt_len
        req.num_computed_tokens = prompt_len
        req.alloced_len = prompt_len
        self.num_prompt_tokens_seen += prompt_len
        self.num_cached_prompt_tokens += prompt_len
        self.cum_cached_tokens += prompt_len
        self.num_prebuilt_admitted += 1
        req.status = ReqStatus.RUNNING
        if req in self.waiting_queue:
            self.waiting_queue.remove(req)
        self.running_batch.append(req)
        return True

    def get_new_batch_prefill(self) -> Optional[List[Req]]:
        if not self.waiting_queue and self.chunked_req is None:
            return None
        for r in list(self.waiting_queue):
            self._try_admit_prebuilt(r)
        if not self.waiting_queue and self.chunked_req is None:
            return None
        candidates: List[Req] = []
        if self.chunked_req is not None:
            candidates.append(self.chunked_req)
        self.policy.calc_priority(self.waiting_queue)
        self._move_ready_grammar_requests()
        # requests with unresolved tokens (just retracted) can't prefill
        # yet; grammar requests wait for their compile
        candidates.extend(
            r for r in self.waiting_queue
            if r.inflight == 0 and r.grammar_future is None
        )

        adder = PrefillAdder(
            self.page_size,
            # DP-attention: min over groups (conservative — admission must
            # fit the tightest group since the group is chosen per request)
            self.allocator.available_tokens(),
            min(t.evictable_size for t in self.tree_caches),
            self.running_batch,
            self.new_token_ratio,
            self.server_args.max_prefill_tokens,
            self.server_args.chunked_prefill_size,
        )
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

    def prepare_extend_items(
        self, reqs: List[Req]
    ) -> Optional[List[ExtendItem]]:
        items = []
        for req in list(reqs):
            if req.req_pool_idx is None:
                req.req_pool_idx = self.req_pool.alloc()
                assert req.req_pool_idx is not None
                if req.dequeued_time is None:
                    req.dequeued_time = time.monotonic()
                    if req.queued_time is not None:
                        self.recent_queue_times.append(
                            req.dequeued_time - req.queued_time)
                # DP-attention group assignment: sticky for the request's
                # lifetime (its KV lives in the group pool). Prefix-cache
                # aware: join the group with the longest match, tie-broken
                # by free pages (reference prepare_dp_attn_batch routing)
                if self.dp_groups > 1:
                    g = max(
                        range(self.dp_groups),
                        key=lambda gi: (
                            self.tree_caches[gi].match_prefix(
                                req.fill_ids
                            ).prefix_len,
                            self.allocator.available_pages(gi),
                        ),
                    )
                    self.allocator.set_group(req.req_pool_idx, g)
                m = self._tree_for(req.req_pool_idx).match_prefix(
                    req.fill_ids
                )
                self.num_prompt_tokens_seen += len(req.fill_ids)
                self.num_cached_prompt_tokens += m.prefix_len
                kept = getattr(req, "_retract_kept", 0)
                if kept:
                    if m.prefix_len >= kept:
                        self.retract_resume_hits += 1
                    req._retract_kept = 0
                if self.hicache is not None:
                    job = self.hicache.start_load(
                        req.fill_ids, m.prefix_len,
                        self.allocator, self.tree_cache,
                    )
                    if job is not None:
                        # park until the host->device staging lands; the
                        # scheduler keeps stepping running decodes
                        # (reference HiCacheController prefetch queue)
                        self.req_pool.free(req.req_pool_idx)
                        req.req_pool_idx = None
                        self._hicache_loading.append((job, req))
                        reqs.remove(req)
                        continue
                # never match the *entire* sequence (need >=1 token to
                # compute logits); back off one page if so
                while m.prefix_len >= req.seq_len and m.page_ids:
                    m.page_ids.pop()
                    m.prefix_len -= self.page_size
                req.prefix_len = m.prefix_len
                req.num_computed_tokens = m.prefix_len
                req.alloced_len = m.prefix_len
                req.last_node = m.last_node
                self._tree_for(req.req_pool_idx).inc_lock_ref(m.last_node)
                self.allocator.set_prefix_pages(req.req_pool_idx, m.page_ids)
                self.cum_cached_tokens += m.prefix_len

            extend = min(req.admitted_extend or req.extend_len,
                         req.extend_len)
            assert extend > 0, f"zero extend for {req}"
            req._this_extend = extend  # type: ignore[attr-defined]
            slots = self._evict_and_alloc(
                req.req_pool_idx, req.num_computed_tokens, extend
            )
            if slots is None:
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
                    state_idx=req.req_pool_idx,
                    hist_tail=np.asarray(
                        req.fill_ids[max(0, start - 8):start], np.int32
                    ),
                )
            )
        return items if items else None

    # ------------------------------------------------------------------
    # Decode path
    # ------------------------------------------------------------------
    def prepare_decode(self, force_k1: bool = False):
        """Returns (reqs, items) for the next decode step, retracting on
        OOM. Requests at their token limit (pending resolution) are not
        stepped again."""
        self.new_token_ratio = max(
            MIN_NEW_TOKEN_RATIO, self.new_token_ratio - self._ratio_decay
        )
        k = 1 if force_k1 else max(
            1, self.server_args.decode_steps_per_launch
        )
        if k > 1 and self.running_batch:
            # never fuse far past the longest remaining budget in the
            # batch (finished rows' extra window steps are discarded at
            # resolve — pure waste)
            most = max(
                (r.sampling_params.max_new_tokens - len(r.output_ids)
                 - r.inflight)
                for r in self.running_batch
            )
            k = max(1, min(k, most))
        if k > 1 and self._has_custom(self.running_batch):
            # host pure_callback logit processors can't run mid-window
            k = 1
        if k > 1 and self._has_grammar(self.running_batch):
            # grammar batches keep the fused window when every guide fits
            # the device DFA tables (in-window mask + state advance,
            # VERDICT r2 #7); oversized DFAs and multi-host step replay
            # fall back to per-step host masks
            if self.server_args.nnodes > 1 or not all(
                r.grammar is None
                or r.grammar.guide.device_tables() is not None
                for r in self.running_batch
            ):
                k = 1
        # penalties never force k=1: the fused window carries the
        # penalty-count buffer on device and refreshes it every step
        reqs: List[Req] = []
        items: List[DecodeItem] = []
        i = 0
        while i < len(self.running_batch):
            req = self.running_batch[i]
            if (
                len(req.output_ids) + req.inflight
                >= req.sampling_params.max_new_tokens
            ):
                i += 1
                continue  # will finish at resolve time
            total = req.seq_len + req.inflight  # incl. token being fed
            # k slots: step j writes KV for position total-1+j
            slots = self._evict_and_alloc(
                req.req_pool_idx, req.alloced_len, k
            )
            if slots is None:
                self._retract_decode(min_idx=i)
                continue
            req.alloced_len = total - 1 + k
            if req.last_future_slot is not None:
                # last_future_slot is a virtual (unwrapped) ring id; the
                # device reads physical slot (virtual % cap)
                input_id = -(
                    req.last_future_slot % self.runner.FUTURE_CAP + 1
                )
            else:
                input_id = req.output_ids[-1]
            items.append(
                DecodeItem(
                    input_id=input_id,
                    seq_len=total,
                    slots=slots,
                    pages=self.allocator.req_pages(
                        req.req_pool_idx, total - 1 + k
                    ),
                    state_idx=req.req_pool_idx,
                )
            )
            reqs.append(req)
            i += 1
        return reqs, items

    def _try_jump_forward(self, req: Req, min_run: int = 2):
        """Grammar jump-forward (reference jump-forward decoding via
        xgrammar/outlines): while the DFA allows exactly ONE token, the
        continuation is deterministic — append those tokens directly and
        re-admit the request as a prefill CONTINUATION (KV intact,
        ``num_computed_tokens`` unchanged) so one batched extend replaces
        N decode steps."""
        forced = req.grammar.guide.jump_forward(req.grammar.state)
        if len(forced) < min_run:
            return
        kv_valid = req.seq_len - 1  # everything but the just-sampled token
        applied = 0
        for t in forced:
            if len(req.output_ids) >= req.sampling_params.max_new_tokens:
                break
            req.output_ids.append(int(t))
            # forced under the constraint: probability 1
            req.output_token_logprobs.append(0.0)
            if req.sampling_params.top_logprobs_num > 0:
                req.output_top_logprobs.append([(0.0, int(t))])
            req.grammar.accept(int(t))
            self.num_generated_tokens += 1
            self.num_jump_forward_tokens += 1
            applied += 1
            req.check_finished()
            if req.finished():
                break
        if applied == 0:
            return
        # the forced tail has no KV yet: route through the prefill
        # continuation path (extends [kv_valid:] and samples the next
        # token under the advanced grammar state)
        req.num_computed_tokens = min(kv_valid, req.seq_len - 1)
        req.is_chunked = False
        req.admitted_extend = 0
        if req in self.running_batch:
            self.running_batch.remove(req)
        if not req.finished() and req not in self.waiting_queue:
            self.waiting_queue.insert(0, req)

    def _retract_decode(self, min_idx: int = 0):
        """Evict the newest running request back to the waiting queue
        (reference schedule_batch.py:533 retract_decode).

        Retract-RESUME (reference decode.py:220): the request's resolved
        page-aligned KV is published into the radix tree before release,
        so re-admission restores it from cache (evictable under further
        pressure — and written back to the host tier when hicache is on)
        instead of re-prefilling the whole sequence."""
        candidates = self.running_batch[min_idx:]
        assert candidates, "decode OOM with no retractable request"
        req = max(candidates, key=lambda r: r.arrival_time)
        self.running_batch.remove(req)
        if req.req_pool_idx is not None:
            n_tok = min(req.num_computed_tokens, req.seq_len)
            req._retract_kept = (n_tok // self.page_size) * self.page_size
            self._cache_computed_prefix(req, unfinished=True)
        self._release_req_kv(req)
        req.is_chunked = False
        req.admitted_extend = 0
        self.waiting_queue.insert(0, req)
        self.new_token_ratio = INIT_NEW_TOKEN_RATIO
        self.num_retracted += 1
        logger.info("retracted %s (decode OOM)", req.rid)

    def _release_req_kv(self, req: Req):
        """Free all device KV held by the request; keep radix-shared pages."""
        if req.req_pool_idx is None:
            return
        tree = self._tree_for(req.req_pool_idx)
        total = max(req.alloced_len, 1)
        tree_pages = (
            tree.match_prefix(req.fill_ids).page_ids
            if not tree.disable
            else []
        )
        self.allocator.free_req_pages(
            req.req_pool_idx, total, skip_pages=tree_pages
        )
        if req.last_node is not None:
            tree.dec_lock_ref(req.last_node)
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
        if req.req_pool_idx is None:
            return
        tree = self._tree_for(req.req_pool_idx)
        if tree.disable:
            if not unfinished:
                self.allocator.free_req_pages(
                    req.req_pool_idx, max(req.alloced_len, 1)
                )
                self.req_pool.free(req.req_pool_idx)
                req.req_pool_idx = None
            return
        ps = self.page_size
        # only RESOLVED tokens can be keyed in the tree
        n_tok = min(req.num_computed_tokens, req.seq_len)
        aligned = (n_tok // ps) * ps
        ids = req.fill_ids[:aligned]
        my_pages = [
            int(p)
            for p in self.allocator.req_pages(req.req_pool_idx, aligned)
        ]
        dup = tree.insert(ids, my_pages)
        if self.kv_events is not None and aligned > dup:
            # newly stored block (beyond the already-present prefix)
            self.kv_events.block_stored(
                ids[dup:], my_pages[dup // ps :]
            )
        m = tree.match_prefix(ids)
        tree_pages = m.page_ids
        # free any of our pages the tree didn't adopt (duplicates), and
        # install the tree's pages so our page table matches shared state
        dup = [p for p, tp in zip(my_pages, tree_pages) if p != tp]
        if dup:
            self.allocator.free_pages(dup)
        self.allocator.set_prefix_pages(req.req_pool_idx, tree_pages)
        # move the lock to the deeper node
        old_node = req.last_node
        tree.inc_lock_ref(m.last_node)
        if old_node is not None:
            tree.dec_lock_ref(old_node)
        req.last_node = m.last_node

        cb = self.chunk_listeners.get(req.rid)
        if cb is not None:
            try:
                cb(req, aligned, list(tree_pages), not unfinished)
            except Exception:  # noqa: BLE001
                logger.exception("chunk listener failed for %s", req.rid)

        if not unfinished:
            # free the unaligned tail (incl. zombie overlap slots)
            self.allocator.free_req_pages(
                req.req_pool_idx,
                total_len=max(req.alloced_len, n_tok),
                keep_len=aligned,
            )
            tree.dec_lock_ref(req.last_node)
            req.last_node = None
            self.req_pool.free(req.req_pool_idx)
            req.req_pool_idx = None

    def _finalize_req(self, req: Req):
        req.finish_time = time.monotonic()
        self._cache_computed_prefix(req, unfinished=False)

    # ------------------------------------------------------------------
    # Main iteration: launch next batch, then resolve the previous one.
    # ------------------------------------------------------------------
    def step(self) -> List[StepOutput]:
        # grammar masks depend on the previous token -> run synchronously
        # while constrained requests are active (reference computes masks
        # one step behind with a 1-deep overlap, SURVEY B.8)
        max_inflight = self.max_inflight
        if (self._has_grammar(self.running_batch)
                or self._needs_penalties(self.running_batch)
                or self._has_custom(self.running_batch)):
            # penalty state is built from resolved output_ids; running with
            # a deep pipeline would lag the repetition window by up to
            # depth-1 sampled-but-unresolved tokens (reference overlap lags
            # exactly 1) — clamp to the reference's behavior
            max_inflight = 1
        self.max_inflight, saved = max_inflight, self.max_inflight
        try:
            return self._step_inner()
        finally:
            self.max_inflight = saved

    def _step_inner(self) -> List[StepOutput]:
        self._poll_hicache_loads()
        stalled = False
        if len(self.pending) < self.max_inflight:
            launched = self._launch_next()
            if launched is not None:
                self._launch_seq += 1
                launched.seq = self._launch_seq
                launched.t_launch = time.monotonic()
                launched.host_future = self._fetch_pool.submit(
                    launched.fetch_host
                )
                self.pending.append(launched)
            else:
                # nothing launchable RIGHT NOW (e.g. every waiting request
                # is parked on a hicache host->device load) — force-resolve
                # the oldest in-flight batch so running decodes keep
                # emitting tokens instead of idling behind the parked load
                stalled = bool(self.pending)

        self.max_pending_seen = max(
            getattr(self, "max_pending_seen", 0), len(self.pending)
        )
        outputs: List[StepOutput] = []
        # Resolve every batch whose results are already on host, and force-
        # resolve the oldest when the pipeline is full (or draining).
        while self.pending:
            head = self.pending[0]
            full = len(self.pending) >= self.max_inflight or stalled
            stalled = False
            draining = not self._has_launchable_work()
            try:
                ready = (head.host_future.done()
                         if head.host_future is not None
                         else bool(head.ids_dev.is_ready()))
            except Exception:
                ready = True
            if not (ready or full or draining):
                break
            self.pending.pop(0)
            outputs.extend(self._resolve(head))
            self._drain_deferred_frees(head.seq)
        self._collect_free_group()
        return outputs

    def _poll_hicache_loads(self):
        """Complete finished host->device prefix loads: async scatter into
        the pool + radix insert, then put the request back in front of the
        queue (it now matches the longer device prefix)."""
        if not self._hicache_loading:
            return
        still = []
        for job, req in self._hicache_loading:
            if job.ready():
                self.hicache.finish_load(
                    job, self.allocator, self.tree_cache
                )
                self.waiting_queue.insert(0, req)
            else:
                still.append((job, req))
        self._hicache_loading = still

    def _has_launchable_work(self) -> bool:
        return bool(
            self.waiting_queue or self.running_batch or self.chunked_req
            or self._hicache_loading
        )

    def _collect_free_group(self):
        group = self.allocator.free_group_take()
        if group:
            if self.pending:
                self._deferred_frees.append((self._launch_seq, group))
            else:
                self.allocator.release_pages(group)
        self.allocator.free_group_begin()

    def _drain_deferred_frees(self, resolved_seq: int):
        """Release page groups whose hazard window (forwards launched up to
        their tag) has fully resolved."""
        keep = []
        for tag, pages in self._deferred_frees:
            if tag <= resolved_seq:
                self.allocator.release_pages(pages)
            else:
                keep.append((tag, pages))
        self._deferred_frees = keep

    def _launch_next(self) -> Optional[InFlightBatch]:
        prefill_reqs = self.get_new_batch_prefill()
        if prefill_reqs:
            items = self.prepare_extend_items(prefill_reqs)
            if items:
                if (
                    self.server_args.enable_mixed_chunk
                    and self.running_batch
                    and self.spec is None
                ):
                    # mixed chunk-decode batch (reference
                    # --enable-mixed-chunk): running decodes ride along as
                    # single-token extend rows
                    d_reqs, d_items = self.prepare_decode(force_k1=True)
                    for req, it in zip(d_reqs, d_items):
                        req._this_extend = 1  # type: ignore[attr-defined]
                        req._mixed_decode = True  # type: ignore
                        items.append(ExtendItem(
                            input_ids=np.asarray([it.input_id], np.int32),
                            prefix_len=it.seq_len - 1,
                            slots=np.asarray([it.slots[0]], np.int32),
                            pages=it.pages,
                            state_idx=it.state_idx,
                            # recent tokens may be unresolved futures:
                            # tell OEP models to read the device ring
                            hist_tail=np.full((8,), -1, np.int32),
                        ))
                        prefill_reqs.append(req)
                return self._launch_extend(prefill_reqs, items)
        if self.running_batch:
            if self.spec is not None:
                reqs, items, drafts = self.prepare_spec()
                if items:
                    return self._launch_spec(reqs, items, drafts)
                return None
            reqs, items = self.prepare_decode()
            if items:
                return self._launch_decode(reqs, items)
        return None

    # ------------------------------------------------------------------
    # Speculative decoding path (sync windows)
    # ------------------------------------------------------------------
    def prepare_spec(self):
        K = self.spec.num_steps
        reqs: List[Req] = []
        items: List[DecodeItem] = []
        i = 0
        pld = self.spec.algorithm == "PLD"
        while i < len(self.running_batch):
            req = self.running_batch[i]
            if (
                len(req.output_ids) + req.inflight
                >= req.sampling_params.max_new_tokens
            ):
                i += 1
                continue
            # host upper bound on seq while windows are in flight: each
            # unresolved window accepted at most K+1 tokens. Tree spec
            # needs topk*K scratch node slots (alloc_span) past the base.
            total = req.seq_len + req.inflight
            end = total + getattr(self.spec, "alloc_span", K)
            if end > req.alloced_len:
                slots = self._evict_and_alloc(
                    req.req_pool_idx, req.alloced_len, end - req.alloced_len
                )
                if slots is None:
                    self._retract_decode(min_idx=i)
                    continue
                req.alloced_len = end
            # all spec families (PLD included) compute the true window
            # slots on-device from the ring seq + page table; host slots
            # are placeholders
            window_slots = np.zeros((K + 1,), np.int32)
            if req.last_future_slot is not None:
                input_id = -(
                    req.last_future_slot % self.runner.FUTURE_CAP + 1
                )
            else:
                input_id = req.output_ids[-1]
            items.append(
                DecodeItem(
                    input_id=input_id,
                    seq_len=req.seq_len if req.inflight == 0 else total,
                    slots=window_slots,
                    pages=self.allocator.req_pages(req.req_pool_idx, end),
                    state_idx=req.req_pool_idx,
                )
            )
            reqs.append(req)
            i += 1
        drafts = None
        if pld and reqs:
            from sglang_fluentllm_tpu.spec.spec_worker import (
                propose_pld_drafts,
            )

            drafts = np.stack([
                propose_pld_drafts(
                    r.origin_input_ids + r.output_ids, K
                ) for r in reqs
            ])
        return reqs, items, drafts

    def _launch_spec(self, reqs, items, drafts=None) -> InFlightBatch:
        from sglang_fluentllm_tpu.runtime.forward_batch import ForwardMode as FM

        K = self.spec.num_steps
        batch = self.runner.batch_builder.build_decode(
            items, mode=FM.TARGET_VERIFY
        )
        sampling = self._sampling_meta(reqs, batch.batch_size)
        offset = self.runner.claim_future_slots(batch.batch_size)
        tokens, counts, logprobs = self.spec.forward_spec(
            batch, sampling, drafts=drafts,
            req_idx=[r.req_pool_idx for r in reqs],
            future_offset=offset,
        )
        for i, req in enumerate(reqs):
            req.inflight += K + 1
            req.num_computed_tokens = req.seq_len + req.inflight - 1
            req.last_future_slot = offset + i
        return InFlightBatch(
            reqs=list(reqs),
            mode=FM.TARGET_VERIFY,
            ids_dev=tokens,
            logprobs_dev=logprobs,
            this_extends=[K + 1] * len(reqs),
            counts_dev=counts,
            future_offset=offset,
        )

    def _move_ready_grammar_requests(self):
        """Attach compiled grammars (reference scheduler.py:1736
        move_ready_grammar_requests)."""
        from sglang_fluentllm_tpu.constrained.backend import Grammar

        for r in self.waiting_queue:
            fut = r.grammar_future
            if fut is not None and fut.done():
                try:
                    r.grammar = Grammar(fut.result())
                except Exception as e:  # compile failure -> abort request
                    logger.error("grammar compile failed: %s", e)
                    r.abort()
                    self.waiting_queue.remove(r)
                r.grammar_future = None

    @staticmethod
    def _needs_penalties(reqs: List[Req]) -> bool:
        return any(
            r.sampling_params.needs_penalties for r in reqs
        )

    @staticmethod
    def _has_grammar(reqs: List[Req]) -> bool:
        return any(r.grammar is not None for r in reqs)

    @staticmethod
    def _has_custom(reqs: List[Req]) -> bool:
        return any(
            r.sampling_params.custom_logit_processor is not None
            for r in reqs
        )

    @staticmethod
    def _scatter_rows(meta: SamplingMetadata, rows: List[int],
                      n: int, pad_to: int) -> SamplingMetadata:
        """Permute per-row metadata from positions [0..n) to the DP-attention
        group-major device rows; vacated rows keep the pad value."""
        import dataclasses as _dc

        idx = np.asarray(rows, np.int64)

        def scat(a):
            if a is None or not isinstance(a, np.ndarray):
                return a
            if a.ndim == 0 or a.shape[0] != pad_to:
                return a
            fill = a[n] if pad_to > n else a[0]
            out = np.broadcast_to(fill, a.shape).copy()
            out[idx] = a[:n]
            return out

        changes = {}
        for f in _dc.fields(meta):
            if f.metadata.get("static") or f.name == "custom_procs":
                continue
            changes[f.name] = scat(getattr(meta, f.name))
        if meta.custom_procs is not None:
            changes["custom_procs"] = [
                (rows[i], proc, params)
                for i, proc, params in meta.custom_procs
            ]
        return _dc.replace(meta, **changes)

    def _sampling_meta(self, reqs: List[Req], pad_to: int,
                       rows: Optional[List[int]] = None,
                       skip_mask_words: bool = False) -> SamplingMetadata:
        sps = [r.sampling_params for r in reqs]
        meta = SamplingMetadata.from_lists(
            [sp.temperature for sp in sps],
            [sp.top_p for sp in sps],
            [sp.top_k for sp in sps],
            [sp.min_p for sp in sps],
            pad_to,
        )
        if self._has_grammar(reqs) and not skip_mask_words:
            V = self.runner.model_config.vocab_size
            W = (V + 31) // 32
            words = np.full((pad_to, W), 0xFFFFFFFF, np.uint32)
            for i, r in enumerate(reqs):
                if r.grammar is not None:
                    m = r.grammar.allowed_bitmask()
                    if m is not None:
                        words[i] = m
            meta.vocab_mask_words = words
        # top-k logprobs: bucket the max requested k to a power of two so
        # the jit trace count stays bounded (OpenAI caps at 20 -> max 32)
        topk = max(
            (r.sampling_params.top_logprobs_num for r in reqs), default=0
        )
        if topk > 0:
            meta.top_logprobs_num = min(
                32, max(4, 1 << (topk - 1).bit_length())
            )
        meta.return_input_logprob = any(
            r.sampling_params.return_logprob
            and r.sampling_params.logprob_start_len >= 0
            for r in reqs
        )
        meta.want_logprobs = any(
            r.sampling_params.return_logprob for r in reqs
        )
        # thinking budget (reference sampling_batch_info.py:88-105):
        # absolute stop = prompt_len + budget; deactivated once the
        # think-end token shows up naturally in the output
        if any(r.sampling_params.thinking_budget
               and r.sampling_params.think_end_id is not None
               for r in reqs):
            think_stop = np.full((pad_to,), -1, np.int32)
            think_end = np.full((pad_to,), -1, np.int32)
            for i, r in enumerate(reqs):
                sp = r.sampling_params
                if not sp.thinking_budget or sp.think_end_id is None:
                    continue
                if sp.think_end_id in r.output_ids:
                    continue          # closed naturally
                think_stop[i] = (len(r.origin_input_ids)
                                 + sp.thinking_budget)
                think_end[i] = sp.think_end_id
            meta.think_stop = think_stop
            meta.think_end = think_end
        if self._has_custom(reqs):
            from sglang_fluentllm_tpu.sched.custom_logit_processor import (
                CustomLogitProcessor,
            )

            procs = []
            for i, r in enumerate(reqs):
                sp = r.sampling_params
                if sp.custom_logit_processor is None:
                    continue
                procs.append((
                    i,
                    CustomLogitProcessor.from_str(
                        sp.custom_logit_processor),
                    sp.custom_params,
                ))
            meta.custom_procs = procs
        if not self._needs_penalties(reqs):
            if rows is not None:
                meta = self._scatter_rows(meta, rows, len(reqs), pad_to)
            return meta
        from sglang_fluentllm_tpu.utils import next_power_of_2

        # penalized window = output tokens so far (penaltylib semantics)
        L = max(8, next_power_of_2(
            max(len(r.output_ids) for r in reqs) or 1
        ))
        E = 8
        pen_ids = np.full((pad_to, L), -1, np.int32)
        eos_ids = np.full((pad_to, E), -1, np.int32)
        min_rem = np.zeros((pad_to,), np.int32)
        freq = np.zeros((pad_to,), np.float32)
        pres = np.zeros((pad_to,), np.float32)
        rep = np.ones((pad_to,), np.float32)
        for i, r in enumerate(reqs):
            out = r.output_ids[-L:]
            pen_ids[i, : len(out)] = out
            sp = r.sampling_params
            freq[i] = sp.frequency_penalty
            pres[i] = sp.presence_penalty
            rep[i] = sp.repetition_penalty
            if sp.min_new_tokens > 0:
                stops = list(r.eos_token_ids | set(sp.stop_token_ids))[:E]
                eos_ids[i, : len(stops)] = stops
                min_rem[i] = max(
                    0,
                    sp.min_new_tokens - len(r.output_ids) - r.inflight,
                )
        meta.penalized_ids = pen_ids
        meta.eos_mask_ids = eos_ids
        meta.min_new_remaining = min_rem
        meta.frequency_penalty = freq
        meta.presence_penalty = pres
        meta.repetition_penalty = rep
        if rows is not None:
            meta = self._scatter_rows(meta, rows, len(reqs), pad_to)
        return meta

    def _dp_item_groups(self, items) -> List[int]:
        return [self.allocator.group_of(it.state_idx) for it in items]

    def _grammar_window_tables(self, reqs, rows, pad_to):
        """Combined device DFA tables + per-row start states for an
        in-window constrained decode (VERDICT r2 #7). Distinct guides
        stack: guide g's states offset by base_g; the sorted CSR key
        space (state*V + token) stays sorted under stacking. Returns
        (masks, keys, vals, state0) or None when no row is constrained."""
        import jax.numpy as jnp

        guides = []
        for r in reqs:
            if r.grammar is not None and not r.grammar.terminated:
                g = r.grammar.guide
                if g not in guides:
                    guides.append(g)
        if not guides:
            return None
        key = tuple(id(g) for g in guides)
        cache = getattr(self, "_gtab_cache", None)
        if cache is None:
            cache = self._gtab_cache = {}
        entry = cache.get(key)
        if entry is None:
            V = len(guides[0].vocab)
            bases, masks, keys_l, vals_l = {}, [], [], []
            base = 0
            for g in guides:
                gm, gk, gv = g.device_tables()
                bases[id(g)] = base
                masks.append(gm)
                keys_l.append(gk + base * V)
                vals_l.append(gv + base)
                base += gm.shape[0]
            entry = (
                jnp.concatenate(masks, axis=0),
                jnp.concatenate(keys_l),
                jnp.concatenate(vals_l),
                bases,
            )
            if len(cache) > 32:
                cache.clear()
            cache[key] = entry
        gm, gk, gv, bases = entry
        state0 = np.full((pad_to,), -1, np.int32)
        for i, r in enumerate(reqs):
            if r.grammar is not None and not r.grammar.terminated:
                row = rows[i] if rows is not None else i
                state0[row] = (
                    bases[id(r.grammar.guide)] + r.grammar.state
                )
        return (gm, gk, gv, jnp.asarray(state0))

    def _launch_extend(self, reqs, items) -> InFlightBatch:
        rows = None
        if self.dp_groups > 1:
            batch, rows = self.runner.batch_builder.build_extend_grouped(
                items, self._dp_item_groups(items)
            )
        else:
            batch = self.runner.batch_builder.build_extend(items)
        sampling = self._sampling_meta(reqs, batch.batch_size, rows=rows)
        offset = self.runner.claim_future_slots(batch.batch_size)
        if self.spec is not None and self.spec.needs_prefill_hook:
            # NEXTN: fused target-prefill + draft prefill + hidden init
            ids, logprobs = self.spec.forward_prefill(
                batch, sampling, offset,
                [r.req_pool_idx for r in reqs],
            )
            extras = None
        else:
            ids, logprobs, extras = self.runner.forward_batch_generation(
                batch, sampling, offset
            )
            if self.spec is not None:
                # draft-side prefill so draft KV covers the prompt
                self.spec.forward_draft_extend(batch, sampling)
        this_extends = []
        sampled = []
        mixed = []
        for i, req in enumerate(reqs):
            this_extends.append(req._this_extend)  # type: ignore
            req.num_computed_tokens += req._this_extend  # type: ignore
            sampled.append(not req.is_chunked)
            mixed.append(getattr(req, "_mixed_decode", False))
            req._mixed_decode = False  # type: ignore[attr-defined]
            if not req.is_chunked:
                req.inflight += 1
                req.last_future_slot = offset + (rows[i] if rows else i)
        return InFlightBatch(
            reqs=list(reqs),
            mode=ForwardMode.EXTEND,
            ids_dev=ids,
            logprobs_dev=logprobs,
            this_extends=this_extends,
            sampled=sampled,
            mixed_decode=mixed,
            future_offset=offset,
            extras_dev=extras,
            rows=rows,
            lp_needed=self._lp_needed(reqs),
        )

    def _launch_decode(self, reqs, items) -> InFlightBatch:
        k = len(items[0].slots)
        rows = None
        if self.dp_groups > 1:
            batch, rows = self.runner.batch_builder.build_decode_grouped(
                items, self._dp_item_groups(items)
            )
        else:
            batch = self.runner.batch_builder.build_decode(items)
        grammar = None
        if k > 1 and self._has_grammar(reqs):
            grammar = self._grammar_window_tables(
                reqs, rows, batch.batch_size
            )
        sampling = self._sampling_meta(
            reqs, batch.batch_size, rows=rows,
            skip_mask_words=grammar is not None,
        )
        offset = self.runner.claim_future_slots(batch.batch_size)
        ids, logprobs, extras = self.runner.forward_batch_generation(
            batch, sampling, offset, grammar=grammar
        )
        for i, req in enumerate(reqs):
            # after this launch, KV is computed for positions < total-1+k
            req.num_computed_tokens = req.seq_len + req.inflight - 1 + k
            req.inflight += k
            req.last_future_slot = offset + (rows[i] if rows else i)
        return InFlightBatch(
            reqs=list(reqs),
            mode=ForwardMode.DECODE,
            ids_dev=ids,
            logprobs_dev=logprobs,
            this_extends=[k] * len(reqs),
            future_offset=offset,
            extras_dev=extras,
            rows=rows,
            lp_needed=self._lp_needed(reqs),
        )

    def _lp_needed(self, reqs) -> bool:
        """Whether this launch's logprobs array is ever read on host."""
        return self.server_args.enable_nan_detection or any(
            r.sampling_params.return_logprob for r in reqs
        )

    # ------------------------------------------------------------------
    def _resolve(self, batch: InFlightBatch) -> List[StepOutput]:
        # host sync (behind by pipeline depth). The arrays were fetched
        # by the d2h-fetch thread starting at launch time, so this join
        # normally finds finished results; jax.device_get (NOT
        # np.asarray: the buffer-protocol path costs ~24ms/array on
        # tunneled TPU backends) is the fallback for hand-built batches.
        fetched = (batch.host_future.result()
                   if batch.host_future is not None else None)
        if fetched is not None:
            ids = fetched["ids"]
        else:
            ids = jax.device_get(batch.ids_dev)
        if batch.lp_needed:
            logprobs = (fetched["logprobs"] if fetched is not None
                        else jax.device_get(batch.logprobs_dev))
        else:
            # greedy/no-logprob window: skip the device fetch. NaN
            # sentinel, NOT zeros: every surfaced consumer (meta_info
            # logprobs, NaN detection) is gated on the same predicates
            # as _lp_needed, so these values must never be read — a NaN
            # poisons any accidental future reader loudly instead of
            # silently yielding 0.0 per-token logprobs.
            logprobs = np.full(ids.shape, np.nan, np.float32)
        if batch.t_launch:
            from sglang_fluentllm_tpu.metrics import collector as _mc

            if _mc.ACTIVE is not None:
                _mc.ACTIVE.observe_forward(
                    batch.mode.name.lower(),
                    time.monotonic() - batch.t_launch,
                )
        tk_vals = tk_ids = inp_lp = None
        if batch.extras_dev is not None:
            tv, ti, il = batch.extras_dev
            if tv.size:
                tk_vals, tk_ids = (fetched["tk"] if fetched is not None
                                   else jax.device_get((tv, ti)))
            if il.size:
                inp_lp = (fetched["inp_lp"] if fetched is not None
                          else jax.device_get(il))
        if self.server_args.enable_nan_detection and np.isnan(
            logprobs
        ).any():
            # reference --enable-nan-detection (server_args.py:212)
            logger.error(
                "NaN detected in logprobs (batch mode=%s); aborting batch",
                batch.mode,
            )
            for req in batch.reqs:
                req.inflight = 0
                self.finish_request(req, abort=True)
            return [self._make_output(r) for r in batch.reqs]
        if batch.mode == ForwardMode.TARGET_VERIFY:
            return self._resolve_spec(batch, ids, logprobs)
        is_decode = batch.mode == ForwardMode.DECODE
        multi = is_decode and ids.ndim == 2  # [k, B] fused decode window
        outputs: List[StepOutput] = []
        for i, req in enumerate(batch.reqs):
            row = batch.rows[i] if batch.rows is not None else i
            # the ring slot this launch wrote is now resolved on host; if it
            # is still the request's newest slot, fall back to output_ids so
            # a long-parked request (retraction, skipped steps) can never
            # read an overwritten slot after a full ring cycle
            if (
                batch.future_offset is not None
                and req.last_future_slot == batch.future_offset + row
            ):
                req.last_future_slot = None
            sp_i = req.sampling_params
            if (
                inp_lp is not None
                and batch.mode == ForwardMode.EXTEND
                and sp_i.return_logprob
                and sp_i.logprob_start_len >= 0
                and not (batch.mixed_decode and batch.mixed_decode[i])
            ):
                n = batch.this_extends[i]
                if not req.input_token_logprobs:
                    # first prompt token has no context, and radix-cached
                    # prefix tokens were not recomputed: None markers
                    # (reference keeps a leading None and gates the rest
                    # with logprob_start_len)
                    req.input_token_logprobs.extend(
                        [None] * (req.prefix_len + 1)
                    )
                req.input_token_logprobs.extend(
                    float(x) for x in inp_lp[row, : max(0, n - 1)]
                )
                if batch.sampled is not None and not batch.sampled[i]:
                    # chunk-boundary token: its logprob spans two chunks
                    req.input_token_logprobs.append(None)
            if batch.sampled is not None and not batch.sampled[i]:
                # mid-chunk: no token sampled; publish prefix into the tree
                self._cache_computed_prefix(req, unfinished=True)
                continue
            n_inflight = batch.this_extends[i] if is_decode else 1
            req.inflight -= n_inflight
            if req.finished():
                # zombie overlap window of an already-finished request
                if req.inflight == 0 and req.req_pool_idx is not None:
                    self._finalize_req(req)
                continue
            if (
                req.sampling_params.max_new_tokens == 0
                and batch.mode == ForwardMode.EXTEND
            ):
                req.check_finished()
                if req.inflight == 0:
                    self._finalize_req(req)
                outputs.append(self._make_output(req))
                continue
            want_topk = (
                tk_vals is not None
                and req.sampling_params.top_logprobs_num > 0
            )
            if multi and req.grammar is None and not want_topk:
                # vectorized fast path: the per-token python loop cost
                # ~10 ms/window at bench scale (64 reqs x 32 steps) —
                # bulk-extend and find the first stop/eos with numpy.
                # Semantics identical to the loop below: truncate at
                # max_new_tokens, stop after the first eos/stop token,
                # one check_finished on the final state.
                sp_i2 = req.sampling_params
                n = min(ids.shape[0],
                        max(sp_i2.max_new_tokens - len(req.output_ids), 0))
                if n > 0:
                    toks = np.asarray(ids[:n, row])
                    stops = req.stop_ids_array()
                    if stops is not None:
                        hit = np.isin(toks, stops)
                        if hit.any():
                            n = int(hit.argmax()) + 1
                            toks = toks[:n]
                    req.output_ids.extend(toks.tolist())
                    req.output_token_logprobs.extend(
                        np.asarray(logprobs[:n, row], np.float64).tolist()
                    )
                    self.num_generated_tokens += n
                    req.check_finished()
            else:
                tokens = (
                    [(int(ids[j, row]), float(logprobs[j, row]), j)
                     for j in range(ids.shape[0])]
                    if multi
                    else [(int(ids[row]), float(logprobs[row]), None)]
                )
                for token, lp, j in tokens:
                    if len(req.output_ids) >= \
                            req.sampling_params.max_new_tokens:
                        break
                    req.output_ids.append(token)
                    req.output_token_logprobs.append(lp)
                    if want_topk:
                        tv = (tk_vals[j, row] if j is not None
                              else tk_vals[row])
                        ti = (tk_ids[j, row] if j is not None
                              else tk_ids[row])
                        kk = req.sampling_params.top_logprobs_num
                        req.output_top_logprobs.append(
                            [(float(v), int(t))
                             for v, t in zip(tv[:kk], ti[:kk])]
                        )
                    self.num_generated_tokens += 1
                    if req.grammar is not None:
                        req.grammar.accept(token)
                    req.check_finished()
                    if req.finished():
                        break
            if req.first_token_time is None:
                req.first_token_time = time.monotonic()
            if (
                req.grammar is not None
                and not req.finished()
                and req.inflight == 0
            ):
                self._try_jump_forward(req)
            if req.finished():
                if req in self.running_batch:
                    self.running_batch.remove(req)
                if req in self.waiting_queue:  # finished while retracted
                    self.waiting_queue.remove(req)
                if req.inflight == 0:
                    self._finalize_req(req)
            else:
                req.check_finished()  # length cap reached without EOS
                if req.finished():
                    if req in self.running_batch:
                        self.running_batch.remove(req)
                    if req.inflight == 0:
                        self._finalize_req(req)
                elif batch.mode == ForwardMode.EXTEND and not (
                    batch.mixed_decode and batch.mixed_decode[i]
                ):
                    # share the prompt KV immediately so parallel requests
                    # reuse it (reference caches unfinished prefill);
                    # mixed-decode rows skip the per-step tree insert
                    self._cache_computed_prefix(req, unfinished=True)
                    if req not in self.running_batch:
                        req.status = ReqStatus.RUNNING
                        self.running_batch.append(req)
            outputs.append(self._make_output(req))
        return outputs

    def _resolve_spec(self, batch: InFlightBatch, ids, logprobs):
        """Consume one speculative window: accept_count tokens per request
        (reference scheduler.py:1602-1612 accept-length handling)."""
        if batch.host_future is not None:
            counts = batch.host_future.result()["counts"]
        else:
            counts = jax.device_get(batch.counts_dev)
        outputs: List[StepOutput] = []
        for i, req in enumerate(batch.reqs):
            n_window = batch.this_extends[i]
            req.inflight -= n_window
            if (
                batch.future_offset is not None
                and req.last_future_slot == batch.future_offset + i
            ):
                req.last_future_slot = None
            if req.finished():
                if req.inflight == 0 and req.req_pool_idx is not None:
                    self._finalize_req(req)
                continue
            n = int(counts[i])
            req.spec_accept_lengths.append(n)
            self.spec_accept_sum += n
            self.spec_accept_ct += 1
            from sglang_fluentllm_tpu.metrics import collector as _mc

            if _mc.ACTIVE is not None:
                _mc.ACTIVE.spec_accept_length_hist.labels(
                    **_mc.ACTIVE._labels).observe(n)
            for j in range(n):
                if len(req.output_ids) >= req.sampling_params.max_new_tokens:
                    break
                req.output_ids.append(int(ids[i, j]))
                req.output_token_logprobs.append(float(logprobs[i, j]))
                self.num_generated_tokens += 1
                req.check_finished()
                if req.finished():
                    break
            # KV is valid up to (new seq_len - 1); stale window tail gets
            # overwritten by the next window
            req.num_computed_tokens = req.seq_len - 1
            if req.first_token_time is None:
                req.first_token_time = time.monotonic()
            req.check_finished()
            if req.finished():
                if req in self.running_batch:
                    self.running_batch.remove(req)
                if req.inflight == 0:
                    self._finalize_req(req)
            outputs.append(self._make_output(req))
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
            output_top_logprobs=(
                list(req.output_top_logprobs)
                if req.sampling_params.top_logprobs_num > 0
                else None
            ),
            input_token_logprobs=(
                list(req.input_token_logprobs)
                if req.sampling_params.logprob_start_len >= 0
                and req.sampling_params.return_logprob
                else None
            ),
            cached_tokens=req.prefix_len,
            prompt_tokens=len(req.origin_input_ids),
        )

    # ------------------------------------------------------------------
    def flush_cache(self) -> bool:
        """Reference scheduler.py:1793 flush_cache: only when idle."""
        if (
            self.running_batch
            or self.waiting_queue
            or self.chunked_req
            or self.pending
        ):
            return False
        for t in self.tree_caches:
            t.reset()
        self.allocator.clear()
        self._deferred_frees = []
        self.allocator.free_group_begin()
        self.req_pool.clear()
        return True
