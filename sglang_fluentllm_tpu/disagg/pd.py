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
    HttpKVSender,
    KVPoll,
    deserialize_kv,
    serialize_kv,
)

logger = logging.getLogger(__name__)


class PDManager:
    """Attached to AsyncEngine when --disaggregation-mode != null."""

    def __init__(self, engine):
        self.engine = engine
        self.mode = engine.server_args.disaggregation_mode
        self.page_size = engine.server_args.page_size
        # decode side: room -> pending state
        self.rooms: Dict[str, Dict[str, Any]] = {}

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
        sp = dict(sampling_params)
        sp["max_new_tokens"] = 1
        t0 = time.time()
        out = await self.engine.generate(
            input_ids=input_ids, sampling_params=sp
        )
        first_token = out["output_ids"][0] if out["output_ids"] else None

        ps = self.page_size
        aligned = (len(input_ids) // ps) * ps
        dpl = (decode_prefix_len // ps) * ps

        def _extract():
            sched = self.engine.scheduler
            m = sched.tree_cache.match_prefix(list(input_ids[:aligned]))
            if m.prefix_len < aligned:
                # part of the prompt was evicted already; send what we have
                pass
            span_pages = m.page_ids[dpl // ps : m.prefix_len // ps]
            if not span_pages:
                return None, m.prefix_len
            return self.engine.runner.extract_pages(span_pages), m.prefix_len

        ok, res = await self.engine._run_rpc(_extract)
        if not ok:
            return {"success": False, "message": str(res)}
        blob, have = res
        pages_sent = 0
        if decode_url:
            num_pages = max(0, (have - dpl) // ps) if blob is not None else 0
            meta = {
                "room": room,
                "first_token": first_token,
                "token_ids": list(input_ids),
                "start_page": dpl // ps,
                "num_pages": num_pages,
            }
            sender = HttpKVSender(
                decode_url, api_key=self.engine.server_args.api_key
            )
            payload = serialize_kv(blob if blob is not None else (), meta)
            poll = await asyncio.get_running_loop().run_in_executor(
                None, sender.send, payload
            )
            if poll != KVPoll.Success:
                return {"success": False, "message": "kv transfer failed"}
            pages_sent = num_pages
        return {
            "success": True,
            "first_token": first_token,
            "pages_sent": pages_sent,
            "prefill_latency": time.time() - t0,
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
        self.rooms[room] = {
            "input_ids": list(input_ids),
            "sampling_params": dict(sampling_params),
            "prefix_len": prefix_len if ok else 0,
            "event": asyncio.Event(),
            "result": None,
        }
        return {"room": room, "decode_prefix_len": prefix_len if ok else 0}

    async def receive_kv(self, data: bytes) -> Dict[str, Any]:
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

        ok, msg = await self.engine._run_rpc(_install)
        if not ok:
            return {"success": False, "message": str(msg)}

        # submit the continuation with the prefill-produced first token
        state["first_token"] = meta.get("first_token")
        asyncio.get_running_loop().create_task(self._run_decode(room))
        return {"success": True}

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

    async def wait_result(self, room: str, timeout: float = 600.0):
        state = self.rooms.get(room)
        if state is None:
            return {"error": f"unknown room {room}"}
        try:
            await asyncio.wait_for(state["event"].wait(), timeout)
        except asyncio.TimeoutError:
            return {"error": "pd decode timeout"}
        self.rooms.pop(room, None)
        return state["result"]
