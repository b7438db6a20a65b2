"""Async serving engine: scheduler thread + asyncio request hub.

Analog of the reference's ``managers/tokenizer_manager.py`` (``TokenizerManager:139``
— per-rid ReqState, streaming outputs back to awaiting coroutines) fused with
``run_scheduler_process`` (``scheduler.py:2078``). Single-host TPU topology:
instead of one scheduler OS-process per GPU rank wired over ZMQ, ONE
scheduler thread owns all local chips through the jitted runner; the HTTP
layer talks to it through thread-safe queues. The ZMQ process split returns
for multi-host serving (disaggregation / dp router).
"""

from __future__ import annotations

import asyncio
import dataclasses
import logging
import queue
import threading
import time
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional, Union

from sglang_fluentllm_tpu.config import ModelConfig, ServerArgs
from sglang_fluentllm_tpu.engine import load_eos_ids, load_tokenizer
from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner
from sglang_fluentllm_tpu.sched.detokenizer import Detokenizer
from sglang_fluentllm_tpu.sched.req import Req
from sglang_fluentllm_tpu.sched.sampling_params import (
    SamplingParams,
    resolve_think_end_id,
)
from sglang_fluentllm_tpu.sched.scheduler import Scheduler, StepOutput

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _ReqState:
    req: Req
    out_queue: asyncio.Queue
    created: float
    text: str = ""
    ttft: Optional[float] = None


class AsyncEngine:
    """Owns tokenizer + scheduler thread; exposes async generate APIs."""

    def __init__(self, server_args: ServerArgs, mesh=None):
        t_init0 = time.time()
        self.server_args = server_args
        self.tokenizer = None
        if not server_args.skip_tokenizer_init:
            self.tokenizer = load_tokenizer(server_args.tokenizer_path)
        self.eos_token_ids = load_eos_ids(
            server_args.model_path, self.tokenizer
        )
        self.model_config = ModelConfig.from_server_args(server_args)
        t_w0 = time.time()
        self.runner = ModelRunner(server_args, self.model_config,
                                  mesh=mesh)
        t_weights = time.time() - t_w0
        self.scheduler = Scheduler(server_args, self.runner)
        self.detokenizer = (
            Detokenizer(self.tokenizer) if self.tokenizer else None
        )
        self._grammar_backend = None

        # metrics (reference srt/metrics/collector.py role)
        self.sched_metrics = None
        self.req_metrics = None
        if server_args.enable_metrics:
            from sglang_fluentllm_tpu.metrics.collector import (
                RequestMetricsCollector,
                SchedulerMetricsCollector,
            )

            name = server_args.served_model_name
            self.sched_metrics = SchedulerMetricsCollector(name)
            self.req_metrics = RequestMetricsCollector(name)
        self._last_metrics_t = 0.0

        # multi-turn sessions (reference managers/session_controller.py)
        from sglang_fluentllm_tpu.sched.sessions import SessionController

        self.sessions = SessionController()

        # PD disaggregation (reference disaggregation/ stack)
        self.pd = None
        if server_args.disaggregation_mode in ("prefill", "decode"):
            from sglang_fluentllm_tpu.disagg.pd import PDManager

            self.pd = PDManager(self)
        # set by http_server main in --disaggregation-mode colocated
        self.colocated_pd = None

        # request tracing (reference srt/tracing/trace.py)
        self.tracer = None
        if server_args.enable_trace:
            from sglang_fluentllm_tpu.metrics.trace import RequestTracer

            self.tracer = RequestTracer(server_args.otlp_traces_endpoint)

        self._input: "queue.Queue[tuple]" = queue.Queue()
        self._states: Dict[str, _ReqState] = {}
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._shutdown = threading.Event()
        self._paused = threading.Event()
        self._slow_down_ms = 0.0
        if not server_args.disable_jit_warmup:
            self._warmup()
        self._thread = threading.Thread(
            target=self._scheduler_loop, daemon=True, name="scheduler"
        )
        self._thread.start()
        self.start_time = time.time()
        self.last_receive_time = time.time()
        if self.sched_metrics is not None:
            lb = self.sched_metrics._labels
            self.sched_metrics.engine_startup_time.labels(**lb).set(
                time.time() - t_init0)
            self.sched_metrics.engine_load_weights_time.labels(**lb).set(
                t_weights)

    @property
    def grammar_backend(self):
        if self._grammar_backend is None:
            from sglang_fluentllm_tpu.constrained.backend import (
                GrammarBackend,
            )

            self._grammar_backend = GrammarBackend(
                self.tokenizer,
                self.model_config.vocab_size,
                self.eos_token_ids,
            )
        return self._grammar_backend

    def _warmup(self):
        """Compile the smallest prefill + decode buckets before serving
        (reference srt/warmup.py role)."""
        if getattr(self.runner.model, "is_classification", False):
            return  # classification models do not generate
        logger.info("warmup: compiling smallest prefill/decode buckets")
        t0 = time.time()
        req = Req(
            rid="warmup",
            input_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                max_new_tokens=4, temperature=0.0
            ),
            eos_token_ids=set(),
        )
        self.scheduler.add_request(req)
        while not req.finished():
            self.scheduler.step()
        self.scheduler.flush_cache()
        logger.info("warmup done in %.1fs", time.time() - t0)

    # ------------------------------------------------------------------
    # scheduler thread
    # ------------------------------------------------------------------
    def _scheduler_loop(self):
        self._heartbeat = time.time()
        self._last_log = time.time()
        self._log_tokens = 0
        if self.server_args.watchdog_timeout > 0:
            threading.Thread(
                target=self._watchdog, daemon=True, name="watchdog"
            ).start()
        while not self._shutdown.is_set():
            self._heartbeat = time.time()
            self._drain_input(block=not self.scheduler.has_work())
            if self._paused.is_set():
                time.sleep(0.005)
                continue
            if not self.scheduler.has_work():
                continue
            if self._slow_down_ms > 0:
                # /slow_down debugging aid (reference scheduler
                # SlowDownReqInput): artificial per-step stall
                time.sleep(self._slow_down_ms / 1000.0)
            try:
                outputs = self.scheduler.step()
            except Exception:
                logger.exception("scheduler step failed")
                self._fail_all()
                continue
            self._log_decode_throughput(outputs)
            if outputs and self._loop is not None:
                self._loop.call_soon_threadsafe(self._publish, outputs)
            if self.sched_metrics is not None:
                now = time.time()
                if now - self._last_metrics_t > 1.0:
                    self.sched_metrics.observe(self.scheduler, self.runner)
                    if self.pd is not None:
                        self.sched_metrics.observe_pd(self.pd)
                    self._last_metrics_t = now
                lb = self.sched_metrics._labels
                self.sched_metrics.num_paused_reqs.labels(**lb).set(
                    len(self.scheduler.running_batch)
                    if self._paused.is_set() else 0
                )
                for qt in self.scheduler.recent_queue_times:
                    self.sched_metrics.queue_time.labels(**lb).observe(qt)
                    self.sched_metrics.observe_stage("queue", qt)
                self.scheduler.recent_queue_times.clear()
                for out in outputs:
                    lb = self.sched_metrics._labels
                    self.sched_metrics.num_generated_tokens.labels(
                        **lb).inc(len(out.new_token_ids))
                    if out.finished:
                        self.sched_metrics.num_requests.labels(**lb).inc()
                        self.sched_metrics.num_prompt_tokens.labels(
                            **lb).inc(out.prompt_tokens)

    def _watchdog(self):
        """Crash-fast on a hung forward (reference scheduler.py:798-827
        watchdog thread)."""
        timeout = self.server_args.watchdog_timeout
        while not self._shutdown.is_set():
            time.sleep(min(10.0, timeout / 3))
            if (
                self.scheduler.has_work()
                and time.time() - self._heartbeat > timeout
            ):
                logger.error(
                    "watchdog: scheduler stuck for %.0fs (> %.0fs); "
                    "terminating", time.time() - self._heartbeat, timeout,
                )
                import os

                os._exit(1)

    def _log_decode_throughput(self, outputs):
        """Periodic tok/s log (reference --decode-log-interval stats)."""
        self._log_tokens += sum(len(o.new_token_ids) for o in outputs)
        now = time.time()
        dt = now - self._last_log
        if dt >= max(1.0, self.server_args.decode_log_interval / 10.0):
            if self._log_tokens:
                logger.info(
                    "decode: %.1f tok/s, running %d, waiting %d, "
                    "kv free %.1f%%",
                    self._log_tokens / dt,
                    len(self.scheduler.running_batch),
                    len(self.scheduler.waiting_queue),
                    100.0 * self.runner.allocator.available_tokens()
                    / max(1, self.runner.max_total_tokens),
                )
            self._last_log = now
            self._log_tokens = 0

    def _drain_input(self, block: bool):
        try:
            item = self._input.get(
                timeout=0.05 if block else 0.0
            ) if block else self._input.get_nowait()
        except queue.Empty:
            return
        while True:
            kind, payload = item
            if kind == "req":
                self.scheduler.add_request(payload)
            elif kind == "finish":
                rid, stop_str = payload
                st = self._states.get(rid)
                if st is not None and not st.req.finished():
                    st.req.set_finished_by_stop_str(stop_str)
                    self.scheduler.finish_request(st.req)
            elif kind == "abort":
                self.scheduler.abort_request(payload)
                st = self._states.get(payload)
                if st is not None and self._loop is not None:
                    self._loop.call_soon_threadsafe(
                        self._publish,
                        [self._abort_output(st.req)],
                    )
            elif kind == "flush":
                payload(self.scheduler.flush_cache())
            elif kind == "rpc":
                fn, setter = payload
                try:
                    setter((True, fn()))
                except Exception as e:  # noqa: BLE001
                    setter((False, str(e)))
            try:
                item = self._input.get_nowait()
            except queue.Empty:
                return

    def _abort_output(self, req: Req) -> StepOutput:
        return StepOutput(
            rid=req.rid,
            output_ids=list(req.output_ids),
            new_token_ids=[],
            finished=True,
            finish_reason={"type": "abort"},
            prompt_tokens=len(req.origin_input_ids),
        )

    def _fail_all(self):
        if self._loop is None:
            return
        outs = []
        for st in self._states.values():
            if not st.req.finished():
                st.req.abort()
                outs.append(self._abort_output(st.req))
        self._loop.call_soon_threadsafe(self._publish, outs)

    def _publish(self, outputs: List[StepOutput]):
        for out in outputs:
            st = self._states.get(out.rid)
            if st is not None:
                st.out_queue.put_nowait(out)

    # ------------------------------------------------------------------
    # async API (called from the event loop)
    # ------------------------------------------------------------------
    async def generate(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Union[Dict, SamplingParams]] = None,
        rid: Optional[str] = None,
        stream: bool = False,
        session_params: Optional[Dict[str, Any]] = None,
    ) -> Union[Dict[str, Any], AsyncIterator[Dict[str, Any]]]:
        gen = self.generate_stream(
            prompt, input_ids, sampling_params, rid, session_params
        )
        if stream:
            return gen
        final = None
        async for chunk in gen:
            final = chunk
        return final

    async def generate_stream(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Union[Dict, SamplingParams]] = None,
        rid: Optional[str] = None,
        session_params: Optional[Dict[str, Any]] = None,
    ) -> AsyncIterator[Dict[str, Any]]:
        self._loop = asyncio.get_running_loop()
        self.last_receive_time = time.time()
        sp = SamplingParams.from_dict(sampling_params)
        resolve_think_end_id(sp, self.tokenizer)
        if (sp.custom_logit_processor is not None
                and not self.server_args.enable_custom_logit_processor):
            raise ValueError(
                "custom_logit_processor requires the server to run with "
                "--enable-custom-logit-processor")
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            input_ids = self.tokenizer.encode(prompt)
        session_id = None
        hist_len = 0
        if session_params:
            session_id = session_params.get("id")
            history = self.sessions.prefix_for(
                session_id, session_params.get("offset")
            )
            hist_len = len(history)
            input_ids = history + list(input_ids)
        if not input_ids:
            raise ValueError("input_ids must be non-empty")
        max_ctx = self.runner.max_context_len
        if len(input_ids) + sp.max_new_tokens >= max_ctx:
            raise ValueError(
                f"request length {len(input_ids)}+{sp.max_new_tokens} "
                f"exceeds context length {max_ctx}"
            )
        rid = rid or uuid.uuid4().hex
        req = Req(rid, input_ids, sp, eos_token_ids=self.eos_token_ids)
        if sp.json_schema or sp.regex or sp.ebnf:
            req.grammar_future = self.grammar_backend.grammar_for(sp)
        st = _ReqState(req=req, out_queue=asyncio.Queue(),
                       created=time.time())
        self._states[rid] = st
        if self.tracer is not None:
            self.tracer.request_start(
                rid, prompt_tokens=len(input_ids),
                max_new_tokens=sp.max_new_tokens,
            )
        self._input.put(("req", req))
        first = True
        try:
            while True:
                out: StepOutput = await st.out_queue.get()
                if first and out.new_token_ids:
                    first = False
                    st.ttft = time.time() - st.created
                    if self.req_metrics is not None:
                        self.req_metrics.observe_ttft(st.ttft)
                    if self.sched_metrics is not None:
                        self.sched_metrics.observe_stage(
                            "prefill", st.ttft)
                    if self.tracer is not None:
                        self.tracer.slice(
                            rid, "prefill_to_first_token",
                            start_ns=int(st.created * 1e9),
                        )
                delta_text = ""
                if self.detokenizer is not None and out.new_token_ids:
                    delta_text, stop = self.detokenizer.detokenize_incremental(
                        rid, out.new_token_ids, out.finished,
                        sp.skip_special_tokens, sp.stop,
                    )
                    st.text += delta_text
                    if stop is not None and not out.finished:
                        self._input.put(("finish", (rid, stop)))
                        out = dataclasses.replace(
                            out, finished=True,
                            finish_reason={"type": "stop", "matched": stop},
                        )
                yield self._format_output(st, out, delta_text)
                if out.finished:
                    if session_id is not None:
                        # record this turn: new prompt tokens + outputs
                        self.sessions.append(
                            session_id,
                            list(input_ids[hist_len:])
                            + list(out.output_ids),
                        )
                    if self.req_metrics is not None:
                        e2e = time.time() - st.created
                        ttft = getattr(st, "ttft", None)
                        self.req_metrics.observe_finish(
                            e2e, out.prompt_tokens,
                            len(out.output_ids), ttft=ttft,
                        )
                        if self.sched_metrics is not None:
                            self.sched_metrics.observe_stage("total", e2e)
                            if ttft is not None:
                                self.sched_metrics.observe_stage(
                                    "decode", max(0.0, e2e - ttft))
                    if self.tracer is not None:
                        self.tracer.slice(
                            rid, "decode",
                            completion_tokens=len(out.output_ids),
                        )
                        self.tracer.request_end(rid)
                    return
        finally:
            self._states.pop(rid, None)

    def _format_output(self, st: _ReqState, out: StepOutput,
                       delta_text: str) -> Dict[str, Any]:
        meta: Dict[str, Any] = {
            "id": out.rid,
            "finish_reason": out.finish_reason,
            "prompt_tokens": out.prompt_tokens,
            "completion_tokens": len(out.output_ids),
            "cached_tokens": out.cached_tokens,
            "e2e_latency": time.time() - st.created,
        }
        if out.output_token_logprobs is not None:
            meta["output_token_logprobs"] = [
                (lp, tid)
                for lp, tid in zip(out.output_token_logprobs, out.output_ids)
            ]
        if out.output_top_logprobs is not None:
            meta["output_top_logprobs"] = out.output_top_logprobs
        if out.input_token_logprobs is not None:
            meta["input_token_logprobs"] = out.input_token_logprobs
        return {
            "text": st.text,
            "delta_text": delta_text,
            "output_ids": list(out.output_ids),
            "new_token_ids": list(out.new_token_ids),
            "meta_info": meta,
        }

    # ------------------------------------------------------------------
    def abort_request(self, rid: str):
        self._input.put(("abort", rid))

    async def flush_cache(self) -> bool:
        self._loop = asyncio.get_running_loop()
        loop = self._loop
        fut: asyncio.Future = loop.create_future()
        self._input.put(
            ("flush", lambda v: loop.call_soon_threadsafe(fut.set_result, v))
        )
        return await fut

    async def generate_continuation(
        self,
        input_ids: List[int],
        first_tokens: List[int],
        sampling_params: Optional[Dict[str, Any]] = None,
        rid: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Generate with preset output tokens (PD decode continuation:
        the prompt KV arrived by transfer; first_tokens were produced by
        the prefill server)."""
        self._loop = asyncio.get_running_loop()
        sp = SamplingParams.from_dict(sampling_params)
        rid = rid or uuid.uuid4().hex
        req = Req(rid, list(input_ids), sp,
                  eos_token_ids=self.eos_token_ids)
        req.output_ids = list(first_tokens)
        # PD prebuilt-batch entry (reference decode.py:220 PreallocQueue ->
        # prebuilt forward skip): when the transferred KV covers the whole
        # page-aligned prompt, the scheduler admits this request STRAIGHT
        # into decode — no tail re-extend
        req.pd_prebuilt = bool(first_tokens)
        req.check_finished()
        st = _ReqState(req=req, out_queue=asyncio.Queue(),
                       created=time.time())
        self._states[rid] = st
        if req.finished():  # single-token request: already done
            self._states.pop(rid, None)
            return {
                "text": "", "output_ids": req.output_ids,
                "meta_info": {"id": rid,
                              "finish_reason": req.finish_reason.to_dict(),
                              "prompt_tokens": len(input_ids),
                              "completion_tokens": len(req.output_ids),
                              "cached_tokens": 0},
            }
        self._input.put(("req", req))
        final = None
        try:
            while True:
                out: StepOutput = await st.out_queue.get()
                delta = ""
                if self.detokenizer is not None and out.new_token_ids:
                    delta, stop = self.detokenizer.detokenize_incremental(
                        rid, out.new_token_ids, out.finished,
                        sp.skip_special_tokens, sp.stop,
                    )
                    st.text += delta
                    if stop is not None and not out.finished:
                        self._input.put(("finish", (rid, stop)))
                        out = dataclasses.replace(
                            out, finished=True,
                            finish_reason={"type": "stop", "matched": stop},
                        )
                final = self._format_output(st, out, delta)
                if out.finished:
                    return final
        finally:
            self._states.pop(rid, None)

    async def encode(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
    ) -> List[List[float]]:
        """Embedding API (reference Engine.encode / serving_embedding):
        L2-normalized last-token hidden states."""
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            input_ids = [self.tokenizer.encode(p) for p in prompts]
        elif input_ids and isinstance(input_ids[0], int):
            input_ids = [input_ids]

        def _encode():
            import numpy as np

            from sglang_fluentllm_tpu.runtime.batch_builder import ExtendItem

            runner = self.runner
            items, idxs = [], []
            try:
                for ids in input_ids:
                    idx = runner.req_pool.alloc()
                    assert idx is not None
                    slots = runner.allocator.alloc_extend(idx, 0, len(ids))
                    if slots is None:
                        self.scheduler.tree_cache.evict(
                            runner.allocator.pages_needed(0, len(ids)),
                            runner.allocator.release_pages,
                        )
                        slots = runner.allocator.alloc_extend(
                            idx, 0, len(ids))
                    assert slots is not None, "no KV room for encode"
                    idxs.append(idx)
                    items.append(ExtendItem(
                        input_ids=np.asarray(ids, np.int32),
                        prefix_len=0,
                        slots=slots,
                        pages=runner.allocator.req_pages(idx, len(ids)),
                    ))
                emb = runner.encode_batch(items)
                return [list(map(float, row)) for row in emb]
            finally:
                for idx, ids in zip(idxs, input_ids):
                    runner.allocator.free_req_pages(idx, len(ids))
                    runner.req_pool.free(idx)

        ok, res = await self._run_rpc(_encode)
        if not ok:
            raise RuntimeError(str(res))
        return res

    async def classify(
        self,
        prompt=None,
        input_ids=None,
    ) -> List[List[float]]:
        """Classification/reward logits (reference /classify route):
        requires a *ForSequenceClassification model."""
        if not getattr(self.runner.model, "is_classification", False):
            raise ValueError(
                "classify requires a sequence-classification model "
                f"({type(self.runner.model).__name__} has no score head)"
            )
        if input_ids is None:
            assert prompt is not None and self.tokenizer is not None
            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            input_ids = [self.tokenizer.encode(p) for p in prompts]
        elif input_ids and isinstance(input_ids[0], int):
            input_ids = [input_ids]

        def _classify():
            import numpy as np

            from sglang_fluentllm_tpu.runtime.batch_builder import ExtendItem

            runner = self.runner
            items, idxs = [], []
            try:
                for ids in input_ids:
                    idx = runner.req_pool.alloc()
                    assert idx is not None
                    slots = runner.allocator.alloc_extend(idx, 0, len(ids))
                    if slots is None:
                        self.scheduler.tree_cache.evict(
                            runner.allocator.pages_needed(0, len(ids)),
                            runner.allocator.release_pages,
                        )
                        slots = runner.allocator.alloc_extend(
                            idx, 0, len(ids))
                    assert slots is not None, "no KV room for classify"
                    idxs.append(idx)
                    items.append(ExtendItem(
                        input_ids=np.asarray(ids, np.int32),
                        prefix_len=0,
                        slots=slots,
                        pages=runner.allocator.req_pages(idx, len(ids)),
                    ))
                logits = runner.classify_batch(items)
                return [list(map(float, row)) for row in logits]
            finally:
                for idx, ids in zip(idxs, input_ids):
                    runner.allocator.free_req_pages(idx, len(ids))
                    runner.req_pool.free(idx)

        ok, res = await self._run_rpc(_classify)
        if not ok:
            raise RuntimeError(str(res))
        return res

    async def score(
        self,
        query=None,
        items=None,
        label_token_ids: Optional[List[int]] = None,
        apply_softmax: bool = False,
        item_first: bool = False,
    ) -> List[List[float]]:
        """Scoring API (reference Engine.score / serving_score.py:16):
        probability of each label token appearing right after query+item
        (or item+query with ``item_first``)."""
        if query is None or items is None:
            raise ValueError("score requires both query and items")
        if not label_token_ids:
            raise ValueError("score requires label_token_ids")
        V = self.runner.model_config.vocab_size
        for t in label_token_ids:
            if not (0 <= int(t) < V):
                raise ValueError(f"label token id {t} out of vocab")

        def to_ids(x):
            if isinstance(x, str):
                assert self.tokenizer is not None, \
                    "text scoring requires a tokenizer"
                return self.tokenizer.encode(x)
            return list(x)

        q_ids = to_ids(query)
        if isinstance(items, str):
            items = [items]
        item_ids = [to_ids(it) for it in items]
        prompts = [
            (ids + q_ids) if item_first else (q_ids + ids)
            for ids in item_ids
        ]

        def _score():
            import numpy as np

            from sglang_fluentllm_tpu.runtime.batch_builder import ExtendItem

            runner = self.runner
            extend_items, idxs = [], []
            try:
                for ids in prompts:
                    idx = runner.req_pool.alloc()
                    assert idx is not None
                    slots = runner.allocator.alloc_extend(idx, 0, len(ids))
                    if slots is None:
                        self.scheduler.tree_cache.evict(
                            runner.allocator.pages_needed(0, len(ids)),
                            runner.allocator.release_pages,
                        )
                        slots = runner.allocator.alloc_extend(
                            idx, 0, len(ids))
                    assert slots is not None, "no KV room for score"
                    idxs.append(idx)
                    extend_items.append(ExtendItem(
                        input_ids=np.asarray(ids, np.int32),
                        prefix_len=0,
                        slots=slots,
                        pages=runner.allocator.req_pages(idx, len(ids)),
                    ))
                lp = runner.score_batch(
                    extend_items,
                    np.asarray(label_token_ids, np.int32),
                )
                if apply_softmax:
                    # normalize over just the label set
                    m = lp.max(axis=-1, keepdims=True)
                    e = np.exp(lp - m)
                    probs = e / e.sum(axis=-1, keepdims=True)
                else:
                    probs = np.exp(lp)
                return [list(map(float, row)) for row in probs]
            finally:
                for idx, ids in zip(idxs, prompts):
                    runner.allocator.free_req_pages(idx, len(ids))
                    runner.req_pool.free(idx)

        ok, res = await self._run_rpc(_score)
        if not ok:
            raise RuntimeError(str(res))
        return res

    async def _run_rpc(self, fn):
        """Run fn on the scheduler thread between steps (safe point for
        weight/memory mutations — reference collective_rpc analog)."""
        self._loop = asyncio.get_running_loop()
        loop = self._loop
        fut: asyncio.Future = loop.create_future()
        self._input.put((
            "rpc",
            (fn, lambda v: loop.call_soon_threadsafe(fut.set_result, v)),
        ))
        return await fut

    async def update_weights_from_disk(self, model_path: str):
        return await self._run_rpc(
            lambda: self.runner.update_weights_from_disk(model_path)
        )

    async def get_weights_by_name(self, name: str, truncate_size: int = 100):
        return await self._run_rpc(
            lambda: self.runner.get_weights_by_name(name, truncate_size)
        )

    async def update_weights_from_tensor(self, named_tensors,
                                         flush: bool = True):
        return await self._run_rpc(
            lambda: self.runner.update_weights_from_tensor(
                named_tensors, flush=flush)
        )

    async def init_weights_update_group(self, master_address: str,
                                        master_port: int):
        return await self._run_rpc(
            lambda: self.runner.init_weights_update_group(
                master_address, master_port)
        )

    async def update_weights_from_distributed(self, names, dtypes, shapes,
                                              flush: bool = True):
        return await self._run_rpc(
            lambda: self.runner.update_weights_from_distributed(
                names, dtypes, shapes, flush=flush)
        )

    def get_load(self) -> Dict[str, Any]:
        """Queue/KV load snapshot (reference scheduler.get_load:1829)."""
        sched = self.scheduler
        runner = self.runner
        ps = self.server_args.page_size
        num_tokens = sum(
            len(r.origin_input_ids) + len(r.output_ids)
            for r in sched.running_batch
        ) + sum(len(r.origin_input_ids) for r in sched.waiting_queue)
        return {
            "num_reqs": len(sched.running_batch)
            + len(sched.waiting_queue),
            "num_waiting_reqs": len(sched.waiting_queue),
            "num_running_reqs": len(sched.running_batch),
            "num_tokens": num_tokens,
            "available_kv_tokens": runner.allocator.available_tokens(),
            "page_size": ps,
        }

    async def release_memory_occupation(self):
        def _release():
            if self.scheduler.has_work():
                raise RuntimeError("cannot release memory: requests active")
            self.scheduler.flush_cache()
            self.runner.release_kv_cache()

        return await self._run_rpc(_release)

    async def resume_memory_occupation(self):
        return await self._run_rpc(self.runner.resume_kv_cache)

    def pause_generation(self):
        self._paused.set()

    def continue_generation(self):
        self._paused.clear()

    def get_server_info(self) -> Dict[str, Any]:
        return {
            "model_path": self.server_args.model_path,
            "tokenizer_path": self.server_args.tokenizer_path,
            "served_model_name": self.server_args.served_model_name,
            "max_total_num_tokens": self.runner.max_total_tokens,
            "max_running_requests": self.runner.max_reqs,
            "page_size": self.server_args.page_size,
            "dtype": self.server_args.dtype,
            "attention_backend": self.runner.attn_backend.name,
            "num_generated_tokens": self.scheduler.num_generated_tokens,
            "num_retracted": self.scheduler.num_retracted,
            "uptime": time.time() - self.start_time,
            "version": __import__("sglang_fluentllm_tpu").__version__,
        }

    def shutdown(self):
        self._shutdown.set()
        self._thread.join(timeout=5)
        pool = getattr(self.scheduler, "_fetch_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)
