"""Colocated PD disaggregation: device-to-device KV transfer.

One process hosts BOTH a prefill engine and a decode engine on disjoint
submeshes of the local device set; transferred KV pages move with
``jax.device_put`` straight from the prefill mesh to the decode mesh's
KV sharding — no host readback, no serialization, no TCP hop. On a real
multi-chip slice the transfer rides ICI (or DCN across hosts), which is
the TPU-native analog of the reference's RDMA data plane
(``disaggregation/mooncake/conn.py`` transfer engine; ``nixl``), with
XLA's transfer machinery in place of a hand-rolled RDMA library.

Control flow mirrors the HTTP PD path (``disagg/pd.py``): the decode
side advertises its radix-cached prefix so those pages are never moved
(reference ``prefill.py:599`` decode_prefix skip), each page-aligned
prefill chunk ships WHILE later chunks still compute (the chunk
listener fires inside the prefill scheduler step), and the decode
request enters through the prebuilt-batch fast path with the first
token preset (reference ``decode.py:220`` PreallocQueue).

Because extract/device_put/insert are all async device dispatches, the
transfer overlaps the remaining prefill compute on the device queues
without any worker thread — the property the HTTP path needs a
background sender for.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class DeviceKVTransfer:
    """Moves gathered page blobs between two runners' meshes.

    ``send(dev_arrays)`` re-lays the prefill-mesh arrays onto the decode
    runner's natural KV sharding (derived once from the decode runner's
    own page-gather jit, so each decode device receives exactly its
    shard) and returns arrays ready for ``insert_staged``.
    """

    def __init__(self, dst_runner):
        self.dst_runner = dst_runner
        self._dst_shardings = None
        self.bytes_sent = 0
        self.transfers = 0

    def _target_shardings(self):
        if self._dst_shardings is None:
            # the decode runner's own gather produces arrays with exactly
            # the layout insert_staged consumes; its output shardings ARE
            # the transfer targets (head-axis tp sharding preserved, page
            # axis replicated) — NamedShardings are shape-polymorphic so
            # one probe covers every piece size
            dev, _ = self.dst_runner.extract_pages_device([0])
            self._dst_shardings = tuple(a.sharding for a in dev)
        return self._dst_shardings

    def send(self, dev_arrays):
        import jax

        staged = tuple(
            jax.device_put(a, s)
            for a, s in zip(dev_arrays, self._target_shardings())
        )
        self.bytes_sent += sum(int(a.nbytes) for a in dev_arrays)
        self.transfers += 1
        return staged


def install_staged_pages(runner, tree, input_ids: List[int],
                         start_page: int, n: int, staged,
                         page_size: int) -> bool:
    """Decode-side install of device-transferred pages: same semantics
    as the HTTP receiver (``pd.py`` receive_kv _install) minus the
    deserialize. Must run on the thread that owns the decode runner
    (scheduler thread in served mode)."""
    ps = page_size
    pages = runner.allocator.alloc_pages(n)
    if pages is None:
        tree.evict(
            n - runner.allocator.available_pages(),
            runner.allocator.release_pages,
        )
        pages = runner.allocator.alloc_pages(n)
    if pages is None:
        raise RuntimeError("no KV pages for PD transfer")
    m = tree.match_prefix(input_ids[: start_page * ps])
    if m.prefix_len < start_page * ps:
        # advertised prefix was evicted between handshake and transfer;
        # keying after a shorter prefix would attach the pages to the
        # wrong chunks — drop, the tail re-extends
        runner.allocator.release_pages(list(pages))
        logger.warning(
            "colocated pd: decode prefix shrank (%d < %d); dropping "
            "%d pages", m.prefix_len, start_page * ps, n,
        )
        return False
    runner.insert_staged(pages, staged)
    end = (start_page + n) * ps
    dup_tokens = tree.insert(input_ids[:end], m.page_ids + list(pages))
    n_dup_fresh = max(0, (dup_tokens - start_page * ps) // ps)
    if n_dup_fresh > 0:
        runner.allocator.release_pages(list(pages[:n_dup_fresh]))
    return True


class ColocatedPDEngine:
    """A 1P1D pair in one process with a device-native KV data plane.

    ``generate()`` runs the prompt on the prefill engine's submesh and
    the output tokens on the decode engine's submesh; KV crosses between
    them device-to-device. Offline/engine-level API — the served
    deployment shape stays the two-server HTTP topology (``disagg/pd.py``
    + ``mini_lb``), which this class's data plane slots under when both
    meshes are reachable from one controller.
    """

    def __init__(
        self,
        prefill_devices: Optional[List[Any]] = None,
        decode_devices: Optional[List[Any]] = None,
        **engine_kwargs,
    ):
        import jax
        from jax.sharding import Mesh

        from sglang_fluentllm_tpu.config import ServerArgs
        from sglang_fluentllm_tpu.engine import Engine

        devs = jax.devices()
        if prefill_devices is None or decode_devices is None:
            if len(devs) >= 2:
                half = len(devs) // 2
                prefill_devices = devs[:half]
                decode_devices = devs[half:half * 2]
            else:
                # single chip: both engines share the device; the data
                # plane still exercises the device_put path (same-device
                # copy), halving is meaningless with one chip
                prefill_devices = decode_devices = devs

        def mk(devices):
            return Mesh(
                np.asarray(devices).reshape(1, len(devices)), ("dp", "tp")
            )

        sa_p = ServerArgs(**{**engine_kwargs,
                             "tp_size": len(prefill_devices)})
        sa_d = ServerArgs(**{**engine_kwargs,
                             "tp_size": len(decode_devices)})
        self.prefill = Engine(sa_p, mesh=mk(prefill_devices))
        self.decode = Engine(sa_d, mesh=mk(decode_devices))
        self.page_size = sa_p.page_size
        self.transfer = DeviceKVTransfer(self.decode.runner)

    # ------------------------------------------------------------------
    def _install(self, input_ids: List[int], start_page: int, n: int,
                 staged) -> bool:
        return install_staged_pages(
            self.decode.runner, self.decode.scheduler.tree_cache,
            input_ids, start_page, n, staged, self.page_size,
        )

    # ------------------------------------------------------------------
    def generate(
        self,
        input_ids: List[int],
        sampling_params: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        import uuid

        ps = self.page_size
        input_ids = list(input_ids)
        sp = dict(sampling_params or {})
        sp_prefill = dict(sp, max_new_tokens=1)
        max_page = len(input_ids) // ps

        # decode-side cached-prefix skip (reference prefill.py:599)
        m = self.decode.scheduler.tree_cache.match_prefix(
            input_ids[: max_page * ps]
        )
        sent = {"pages": m.prefix_len // ps}
        skipped = sent["pages"]
        bytes0 = self.transfer.bytes_sent
        t0 = time.time()

        def on_chunk(req, aligned, pages, final):
            start = sent["pages"]
            end = min(aligned // ps, max_page)
            if end <= start:
                return
            dev, _ = self.prefill.runner.extract_pages_device(
                pages[start:end]
            )
            staged = self.transfer.send(dev)
            self._install(input_ids, start, end - start, staged)
            sent["pages"] = end

        rid = f"pdc-{uuid.uuid4().hex}"
        self.prefill.scheduler.chunk_listeners[rid] = on_chunk
        try:
            out = self.prefill.generate(
                input_ids=input_ids, sampling_params=sp_prefill, rid=rid
            )
        finally:
            self.prefill.scheduler.chunk_listeners.pop(rid, None)
        first = out["output_ids"][:1]

        result = self.decode.generate_continuation(
            input_ids, first, sampling_params=sp
        )
        result["meta_info"]["pd"] = {
            "pages_sent": sent["pages"] - skipped,
            "pages_skipped_cached": skipped,
            "transfer_bytes": self.transfer.bytes_sent - bytes0,
            "latency": time.time() - t0,
        }
        return result

    def shutdown(self):
        for e in (self.prefill, self.decode):
            try:
                e.shutdown()
            except Exception:  # noqa: BLE001
                pass


class ColocatedPDManager:
    """Served-mode orchestration of the device data plane
    (``--disaggregation-mode colocated``): ONE server process hosts a
    prefill AsyncEngine and a decode AsyncEngine on disjoint submeshes;
    /generate runs prefill -> device transfer -> decode continuation.

    Thread/ordering model: the chunk listener fires on the PREFILL
    scheduler thread (which owns the prefill runner), dispatches the
    cross-mesh device_put (async), and enqueues the install as an RPC on
    the DECODE engine's queue — RPCs drain in order on the decode
    scheduler thread, giving the same ordered-install guarantee as the
    HTTP receiver's per-room chain (``pd.py`` receive_kv).
    """

    def __init__(self, prefill_engine, decode_engine):
        self.prefill = prefill_engine
        self.decode = decode_engine
        self.transfer = DeviceKVTransfer(decode_engine.runner)
        self.page_size = decode_engine.server_args.page_size

    async def generate(
        self,
        input_ids: List[int],
        sampling_params: Optional[Dict[str, Any]] = None,
        rid: Optional[str] = None,
    ) -> Dict[str, Any]:
        import asyncio
        import uuid

        ps = self.page_size
        ids = list(input_ids)
        sp = dict(sampling_params or {})
        max_page = len(ids) // ps
        loop = asyncio.get_running_loop()

        def _match():
            m = self.decode.scheduler.tree_cache.match_prefix(
                ids[: max_page * ps]
            )
            return m.prefix_len
        ok, dpl = await self.decode._run_rpc(_match)
        skipped = (dpl // ps) if ok else 0
        sent = {"pages": skipped}
        bytes0 = self.transfer.bytes_sent
        installs: List[Any] = []

        def on_chunk(req, aligned, pages, final):
            # prefill scheduler thread
            start = sent["pages"]
            end = min(aligned // ps, max_page)
            if end <= start:
                return
            dev, _ = self.prefill.runner.extract_pages_device(
                pages[start:end]
            )
            staged = self.transfer.send(dev)
            n, s0 = end - start, start

            def _install():
                return install_staged_pages(
                    self.decode.runner,
                    self.decode.scheduler.tree_cache,
                    ids, s0, n, staged, ps,
                )

            installs.append(asyncio.run_coroutine_threadsafe(
                self.decode._run_rpc(_install), loop
            ))
            sent["pages"] = end

        prid = rid or f"pdc-{uuid.uuid4().hex}"
        sched = self.prefill.scheduler
        await self.prefill._run_rpc(
            lambda: sched.chunk_listeners.__setitem__(prid, on_chunk)
        )
        t0 = time.time()
        try:
            out = await self.prefill.generate(
                input_ids=ids,
                sampling_params=dict(sp, max_new_tokens=1),
                rid=prid,
            )
        finally:
            await self.prefill._run_rpc(
                lambda: sched.chunk_listeners.pop(prid, None)
            )
        first = out["output_ids"][:1]
        for fut in installs:
            ok, res = await asyncio.wrap_future(fut)
            if not ok or res is False:
                logger.warning("colocated pd install dropped: %s", res)

        result = await self.decode.generate_continuation(
            ids, first, sampling_params=sp
        )
        moved = self.transfer.bytes_sent - bytes0
        dt = time.time() - t0
        result["meta_info"]["pd"] = {
            "pages_sent": sent["pages"] - skipped,
            "pages_skipped_cached": skipped,
            "decode_prefix_len": skipped * ps,
            "transfer_bytes": moved,
            "latency": dt,
        }
        if moved > 0:
            from sglang_fluentllm_tpu.metrics import collector as _mc

            if _mc.ACTIVE is not None:
                lb = _mc.ACTIVE._labels
                _mc.ACTIVE.kv_transfer_speed_gb_s.labels(**lb).set(
                    moved / max(dt, 1e-6) / 1e9
                )
        return result

    def shutdown(self):
        for e in (self.prefill, self.decode):
            try:
                e.shutdown()
            except Exception:  # noqa: BLE001
                pass
