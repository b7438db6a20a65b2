"""PD-disaggregation engine logic (prefill side + decode side).

Analog of the reference's ``disaggregation/prefill.py`` /
``disaggregation/decode.py`` scheduler mixins, restructured for the
single-process TPU engine:

- PREFILL server: runs the prompt (1 token), then ships the page-aligned
  prompt KV minus the decode server's cached prefix (the headline
  "decode-side radix cache" feature, ``prefill.py:599`` skips
  decode_prefix_len) plus the first token as metadata
  (``MetadataBuffers`` analog).
- DECODE server: registers the room, reports its cached prefix length,
  installs received pages into its radix tree, and submits the request
  with the first token preset — the sub-page tail recomputes in a tiny
  extend (instead of the reference's prebuilt-batch forward skip), after
  which normal decode proceeds.
"""

from __future__ import annotations

import asyncio
import logging
import time
from typing import Any, Dict, List, Optional

from sglang_fluentllm_tpu.disagg.conn import (
    ChunkedKVSender,
    HttpKVSender,
    KVPoll,
    deserialize_kv,
    serialize_kv,
)

logger = logging.getLogger(__name__)


class PDManager:
    """Attached to AsyncEngine when --disaggregation-mode != null."""

    # incomplete rooms whose peer has been silent this long are culled
    ROOM_TTL = 120.0
    # completed rooms whose result was never collected are culled after
    RESULT_TTL = 1800.0

    def __init__(self, engine):
        self.engine = engine
        self.mode = engine.server_args.disaggregation_mode
        self.page_size = engine.server_args.page_size
        # decode side: room -> pending state
        self.rooms: Dict[str, Dict[str, Any]] = {}
        self._last_gc = time.time()

    # ------------------------------------------------------------------
    # Liveness (reference mooncake conn.py:554-609 heartbeat/room GC)
    # ------------------------------------------------------------------
    def heartbeat(self, room: str) -> Dict[str, Any]:
        """Prefill peers ping while computing/transferring; refreshes the
        stall clock so only truly dead peers trip the detector."""
        state = self.rooms.get(room)
        if state is None:
            return {"success": False, "message": f"unknown room {room}"}
        state["last_activity"] = time.time()
        return {"success": True}

    def gc_rooms(self, now: Optional[float] = None):
        """Cull rooms whose peer died mid-handshake/transfer (no
        heartbeat for ROOM_TTL) and finished rooms never collected —
        a leaked room would pin its prompt + event forever."""
        now = now or time.time()
        if now - self._last_gc < 5.0:
            return
        self._last_gc = now
        for room, st in list(self.rooms.items()):
            idle = now - st["last_activity"]
            done = st["event"].is_set()
            if (done and idle > self.RESULT_TTL) or (
                    not done and st.get("first_token") is None
                    and idle > self.ROOM_TTL):
                logger.warning("pd room %s GC'd (idle %.0fs, done=%s)",
                               room, idle, done)
                self.rooms.pop(room, None)
                if not done:
                    self._metric_fail()

    # ------------------------------------------------------------------
    # Prefill side
    # ------------------------------------------------------------------
    async def prefill(
        self,
        room: str,
        input_ids: List[int],
        sampling_params: Dict[str, Any],
        decode_url: Optional[str],
        decode_prefix_len: int = 0,
    ) -> Dict[str, Any]:
        """Chunk-streamed prefill: every page-aligned chunk ships to the
        decode server WHILE later chunks still compute (reference
        prefill.py:599 send_kv_chunk / mooncake LayerWiseTask overlap);
        the decode-side cached prefix (decode_prefix_len) is skipped."""
        sp = dict(sampling_params)
        sp["max_new_tokens"] = 1
        t0 = time.time()
        ps = self.page_size
        if not decode_url:
            out = await self.engine.generate(
                input_ids=input_ids, sampling_params=sp
            )
            first = out["output_ids"][0] if out["output_ids"] else None
            return {
                "success": True, "first_token": first, "pages_sent": 0,
                "prefill_latency": time.time() - t0,
            }

        rid = f"pdp-{room}"
        dpl = (decode_prefix_len // ps) * ps
        max_page = len(input_ids) // ps
        sender = ChunkedKVSender(
            decode_url, room, api_key=self.engine.server_args.api_key
        )
        sent = {"pages": dpl // ps}
        runner = self.engine.runner

        piece = int(getattr(
            self.engine.server_args, "pd_transfer_piece_pages", 0))
        if piece <= 0:
            piece = 1 << 30  # chunk-granular (see server_args comment)

        def on_chunk(req, aligned, pages, final):
            # scheduler thread: async device gather only; the sender's
            # worker thread does the readback + POST. Chunks split into
            # page-group PIECES so wire time and decode-side install
            # pipeline against each other (see receive_kv) — the TPU
            # equivalent of the reference's layer-wise granularity, on
            # the token axis the jit program naturally exposes.
            start = sent["pages"]
            end = min(aligned // ps, max_page)
            if end <= start:
                return
            for p0 in range(start, end, piece):
                p1 = min(p0 + piece, end)
                dev, n = runner.extract_pages_device(pages[p0:p1])
                # metadata is O(piece): only THIS piece's token span
                # rides along (the decode room already holds the full
                # prompt from /pd/start) — resending the whole prefix
                # per chunk was O(n^2) at long context (VERDICT r2 #9)
                sender.enqueue_device(dev, n, {
                    "start_page": p0,
                    "num_pages": p1 - p0,
                    "token_ids": list(input_ids[p0 * ps: p1 * ps]),
                    "last": False,
                })
            sent["pages"] = end

        def _register():
            self.engine.scheduler.chunk_listeners[rid] = on_chunk
            return True

        await self.engine._run_rpc(_register)
        try:
            out = await self.engine.generate(
                input_ids=input_ids, sampling_params=sp, rid=rid
            )
        finally:
            await self.engine._run_rpc(
                lambda: self.engine.scheduler.chunk_listeners.pop(rid, None)
            )
        first = out["output_ids"][0] if out["output_ids"] else None
        t_forward_done = time.time()
        sender.finish({
            "start_page": sent["pages"], "num_pages": 0,
            "token_ids": [], "last": True,
            "first_token": first,
        })
        poll = await asyncio.get_running_loop().run_in_executor(
            None, sender.wait_done
        )
        if poll != KVPoll.Success:
            return {"success": False, "message": "kv transfer failed",
                    "chunks": sender.chunks_sent}
        t_done = time.time()
        # tail = transfer time NOT hidden behind prefill compute — the
        # quantity the reference's layer-wise transfer attacks
        # (mooncake/conn.py:763 LayerWiseTask); exposed so
        # tools/bench_pd_ttft.py can measure chunk- vs layer-granularity
        # cost on this transport
        tail_ms = (t_done - t_forward_done) * 1000.0
        total_s = max(t_done - t0, 1e-6)
        gb_s = sender.bytes_sent / total_s / 1e9
        from sglang_fluentllm_tpu.metrics import collector as _mc

        if _mc.ACTIVE is not None:
            lb = _mc.ACTIVE._labels
            _mc.ACTIVE.kv_transfer_speed_gb_s.labels(**lb).set(gb_s)
        return {
            "success": True,
            "first_token": first,
            "pages_sent": sent["pages"] - dpl // ps,
            "chunks": sender.chunks_sent,
            "prefill_latency": time.time() - t0,
            "tail_transfer_ms": tail_ms,
            "bytes_sent": sender.bytes_sent,
            "transfer_gb_s": gb_s,
        }

    # ------------------------------------------------------------------
    # Decode side
    # ------------------------------------------------------------------
    async def start_room(
        self, room: str, input_ids: List[int],
        sampling_params: Dict[str, Any],
    ) -> Dict[str, Any]:
        ps = self.page_size
        aligned = (len(input_ids) // ps) * ps

        def _match():
            sched = self.engine.scheduler
            m = sched.tree_cache.match_prefix(list(input_ids[:aligned]))
            return m.prefix_len

        ok, prefix_len = await self.engine._run_rpc(_match)
        self.gc_rooms()
        self.rooms[room] = {
            "input_ids": list(input_ids),
            "sampling_params": dict(sampling_params),
            "prefix_len": prefix_len if ok else 0,
            "event": asyncio.Event(),
            "result": None,
            "chunks": 0,
            "last_activity": time.time(),
        }
        return {"room": room, "decode_prefix_len": prefix_len if ok else 0}

    @staticmethod
    def _metric_fail():
        from sglang_fluentllm_tpu.metrics import collector as _mc

        if _mc.ACTIVE is not None:
            _mc.ACTIVE.num_transfer_failed_reqs.labels(
                **_mc.ACTIVE._labels).inc()

    async def receive_kv(self, data: bytes) -> Dict[str, Any]:
        self.gc_rooms()
        blob, meta = deserialize_kv(data)
        room = meta["room"]
        state = self.rooms.get(room)
        if state is None:
            return {"success": False, "message": f"unknown room {room}"}
        input_ids = state["input_ids"]
        ps = self.page_size
        n = meta["num_pages"]
        start_page = meta["start_page"]

        def _install():
            sched = self.engine.scheduler
            runner = self.engine.runner
            if n > 0:
                per_page = [
                    tuple(x[:, i] for x in blob) for i in range(n)
                ]
                pages = runner.allocator.alloc_pages(n)
                if pages is None:
                    sched.tree_cache.evict(
                        n - runner.allocator.available_pages(),
                        runner.allocator.release_pages,
                    )
                    pages = runner.allocator.alloc_pages(n)
                if pages is None:
                    raise RuntimeError("no KV pages for PD transfer")
                m = sched.tree_cache.match_prefix(
                    input_ids[: start_page * ps]
                )
                if m.prefix_len < start_page * ps:
                    # the cached prefix we advertised at /pd/start was
                    # (partially) evicted between handshake and transfer;
                    # keying the transferred pages after a shorter prefix
                    # would attach them to the wrong token chunks — drop
                    # the transfer and let the tail re-extend instead of
                    # serving silently-corrupt KV
                    runner.allocator.release_pages(list(pages))
                    logger.warning(
                        "pd room %s: decode prefix shrank (%d < %d); "
                        "dropping %d transferred pages",
                        room, m.prefix_len, start_page * ps, n,
                    )
                    return True
                runner.insert_pages(pages, per_page)
                end = (start_page + n) * ps
                dup_tokens = sched.tree_cache.insert(
                    input_ids[:end], m.page_ids + list(pages)
                )
                # pages already present in the tree for the span we just
                # inserted are duplicates of our freshly-allocated ones;
                # free ours so they don't leak
                n_dup_fresh = max(0, (dup_tokens - start_page * ps) // ps)
                if n_dup_fresh > 0:
                    runner.allocator.release_pages(
                        list(pages[:n_dup_fresh])
                    )
            return True

        # Pipelined install (round 5 — the TPU answer to the reference's
        # layer-wise transfer, mooncake/conn.py:763): the HTTP ack
        # returns once the piece is deserialized, while the scheduler-
        # side install runs on a per-room ORDERED chain (radix inserts
        # need all earlier pages present). The sender's next piece rides
        # the wire concurrently with this piece's install, so the
        # non-overlappable tail shrinks from sum(wire_i + install_i) to
        # ~max-stage + one install. Measured by tools/bench_pd_ttft.py.
        prev = state.get("install_tail")

        async def _chained(prev=prev):
            if prev is not None and not await prev:
                return False
            ok, msg = await self.engine._run_rpc(_install)
            if not ok:
                state["install_error"] = str(msg)
                self._metric_fail()
            return bool(ok)

        state["install_tail"] = asyncio.get_running_loop().create_task(
            _chained())
        state["chunks"] += 1
        now = time.time()
        dt = max(1e-6, now - state["last_activity"])
        state["last_activity"] = now
        from sglang_fluentllm_tpu.metrics import collector as _mc

        if _mc.ACTIVE is not None:
            lb = _mc.ACTIVE._labels
            _mc.ACTIVE.kv_transfer_speed_gb_s.labels(**lb).set(
                len(data) / dt / 1e9)
            _mc.ACTIVE.kv_transfer_latency_ms.labels(**lb).set(dt * 1000)
        if not meta.get("last", True):
            # mid-stream piece: ack now, install pipelines in background
            return {"success": True, "chunk": state["chunks"]}

        # final marker: drain the install chain, then submit the
        # continuation with the prefill-produced first token
        ok = await state["install_tail"]
        if not ok:
            return {"success": False,
                    "message": state.get("install_error",
                                         "install failed")}
        state["first_token"] = meta.get("first_token")
        asyncio.get_running_loop().create_task(self._run_decode(room))
        return {"success": True, "chunk": state["chunks"]}

    async def _run_decode(self, room: str):
        state = self.rooms[room]
        try:
            result = await self.engine.generate_continuation(
                input_ids=state["input_ids"],
                first_tokens=(
                    [state["first_token"]]
                    if state.get("first_token") is not None else []
                ),
                sampling_params=state["sampling_params"],
                rid=f"pd-{room}",
            )
            state["result"] = result
        except Exception as e:  # noqa: BLE001
            logger.exception("pd decode failed")
            state["result"] = {"error": str(e)}
        finally:
            state["event"].set()

    async def wait_result(self, room: str, timeout: float = 600.0,
                          stall_ttl: float = 60.0):
        """Waits for the room's decode result. A room whose transfer goes
        quiet for ``stall_ttl`` seconds before completion is FAILED
        instead of hanging — the failure-detection role of the reference's
        mooncake heartbeat (``conn.py:554-609``): a dead prefill peer
        aborts the request, not the server."""
        state = self.rooms.get(room)
        if state is None:
            return {"error": f"unknown room {room}"}
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                await asyncio.wait_for(state["event"].wait(), 2.0)
                break
            except asyncio.TimeoutError:
                started = state.get("first_token") is not None
                stalled = (
                    not started
                    and time.time() - state["last_activity"] > stall_ttl
                )
                if stalled:
                    self.rooms.pop(room, None)
                    self._metric_fail()
                    return {"error": "pd transfer stalled (peer lost)"}
        if not state["event"].is_set():
            return {"error": "pd decode timeout"}
        self.rooms.pop(room, None)
        return state["result"]
