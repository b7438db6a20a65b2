"""Hierarchical KV cache: device -> host RAM -> storage.

Analog of the reference's ``mem_cache/hiradix_cache.py`` (``HiRadixCache:32``)
+ ``managers/cache_controller.py`` (``HiCacheController:232``) +
``mem_cache/hicache_storage.py`` tiers. TPU shape of the design:

- pages evicted from the device radix tree are first copied host-side
  (write-back), keyed by the reference's chained page hash
  (``radix_cache.py:120`` — sha over prefix chain), then freed;
- a prefix match that runs past the device tree probes the host tier by
  walking the hash chain; hits are re-uploaded into freshly allocated
  pages and re-inserted into the tree;
- host-tier overflow spills to a storage backend (file backend =
  ``HiCacheFile`` analog); gets/sets are batched per page.

Device <-> host movement uses bucketed jitted gather/scatter programs (the
role of the reference's ``jit_kernel/hicache.cuh`` batched page-copy CUDA
kernel).
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import hashlib
import logging
import threading
import time
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)



def _hicache_metric(name: str, n: int):
    from sglang_fluentllm_tpu.metrics import collector as _mc

    if _mc.ACTIVE is not None and n > 0:
        getattr(_mc.ACTIVE, name).labels(**_mc.ACTIVE._labels).inc(n)


def _hicache_hist(name: str, v: float):
    from sglang_fluentllm_tpu.metrics import collector as _mc

    if _mc.ACTIVE is not None:
        getattr(_mc.ACTIVE, name).labels(
            **_mc.ACTIVE._labels).observe(v)

def page_hash_chain(prev_hash: str, page_tokens: Sequence[int]) -> str:
    h = hashlib.sha256()
    h.update(prev_hash.encode())
    h.update(np.asarray(page_tokens, np.int32).tobytes())
    return h.hexdigest()


class HostKVPool:
    """LRU host tier: page_hash -> per-page KV blob (numpy pytree).
    Thread-safe: the async write-back worker puts while the scheduler
    thread matches/gets (reference HiCacheController write queue role)."""

    def __init__(self, max_pages: int):
        self.max_pages = max_pages
        self._pages: "OrderedDict[str, Any]" = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key: str):
        with self._lock:
            blob = self._pages.get(key)
            if blob is not None:
                self._pages.move_to_end(key)
            return blob

    def put(self, key: str, blob) -> List[Tuple[str, Any]]:
        """Insert; returns (key, blob) pairs spilled past capacity."""
        with self._lock:
            self._pages[key] = blob
            self._pages.move_to_end(key)
            spilled = []
            while len(self._pages) > self.max_pages:
                spilled.append(self._pages.popitem(last=False))
            return spilled

    def __contains__(self, key):
        with self._lock:
            return key in self._pages

    def __len__(self):
        return len(self._pages)


class HiCacheController:
    def __init__(
        self,
        runner,
        page_size: int,
        host_size_tokens: int,
        storage=None,
    ):
        self.runner = runner
        self.page_size = page_size
        self.host = HostKVPool(max(1, host_size_tokens // page_size))
        self.storage = storage
        # background movers (reference HiCacheController write/load
        # queues + storage prefetch threads, cache_controller.py:232):
        # the scheduler thread only LAUNCHES device programs; blocking
        # device<->host transfers happen here
        self._io = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="hicache-io"
        )
        # stats
        self.num_write_back = 0
        self.num_host_hits = 0
        self.num_storage_hits = 0

    # ------------------------------------------------------------------
    def write_back(self, token_prefix: List[int], pages: Sequence[int]):
        """Copy evicted pages to host before the device slots are reused.
        ``token_prefix`` is the full token path ending at these pages."""
        ps = self.page_size
        n = len(pages)
        if n == 0:
            return
        _hicache_hist('hicache_backup_pages', n)
        start_page = (len(token_prefix) - n * ps) // ps
        blobs = self.runner.extract_pages(list(pages))
        h = self._chain_to(token_prefix, start_page)
        for i, page in enumerate(pages):
            lo = (start_page + i) * ps
            h = page_hash_chain(h, token_prefix[lo : lo + ps])
            spilled = self.host.put(h, self._slice_blob(blobs, i))
            self.num_write_back += 1
            _hicache_metric('hicache_writeback_tokens', self.page_size)
            if self.storage is not None:
                for key, blob in spilled:
                    self.storage.set(key, blob)

    def _chain_to(self, tokens: List[int], n_pages: int) -> str:
        h = ""
        ps = self.page_size
        for i in range(n_pages):
            h = page_hash_chain(h, tokens[i * ps : (i + 1) * ps])
        return h

    # ------------------------------------------------------------------
    def match_extra(
        self, fill_ids: List[int], prefix_len: int
    ) -> Tuple[List[str], List[Any]]:
        """Walk the hash chain past the device prefix; returns the host/
        storage hits (keys, blobs) for consecutive pages."""
        ps = self.page_size
        aligned = (len(fill_ids) // ps) * ps
        start_page = prefix_len // ps
        h = self._chain_to(fill_ids, start_page)
        keys, blobs = [], []
        for p in range(start_page, aligned // ps):
            h = page_hash_chain(h, fill_ids[p * ps : (p + 1) * ps])
            blob = self.host.get(h)
            if blob is None and self.storage is not None:
                blob = self.storage.get(h)
                if blob is not None:
                    self.num_storage_hits += 1
                    _hicache_metric(
                        'hicache_storage_hit_tokens', self.page_size)
                    self.host.put(h, blob)
            elif blob is not None:
                self.num_host_hits += 1
                _hicache_metric('hicache_host_hit_tokens', self.page_size)
            if blob is None:
                break
            keys.append(h)
            blobs.append(blob)
        return keys, blobs

    def load_into(
        self,
        fill_ids: List[int],
        prefix_len: int,
        allocator,
        tree_cache,
    ) -> int:
        """Fetch matched host pages into fresh device pages and insert them
        into the radix tree. Returns the new (device) prefix length."""
        keys, blobs = self.match_extra(fill_ids, prefix_len)
        if not blobs:
            return prefix_len
        pages = allocator.alloc_pages(len(blobs))
        if pages is None:
            # make room by evicting cold device pages (they write back to
            # the host tier first, so nothing is lost)
            tree_cache.evict(
                len(blobs) - allocator.available_pages(),
                allocator.release_pages,
                on_evict=self.write_back,
            )
            pages = allocator.alloc_pages(len(blobs))
        if pages is None:
            # partial load with whatever is available
            avail = allocator.available_pages()
            if avail == 0:
                return prefix_len
            blobs = blobs[:avail]
            pages = allocator.alloc_pages(len(blobs))
            if pages is None:
                return prefix_len
        self.runner.insert_pages(pages, blobs)
        ps = self.page_size
        end = prefix_len + len(blobs) * ps
        m = tree_cache.match_prefix(fill_ids[:prefix_len])
        dev_pages = m.page_ids + list(pages)
        dup = tree_cache.insert(fill_ids[:end], dev_pages)
        if dup > prefix_len:
            # someone else inserted part of this span concurrently
            mm = tree_cache.match_prefix(fill_ids[:end])
            extra = [
                p for p in pages if p not in set(mm.page_ids)
            ]
            allocator.release_pages(extra)
        logger.debug(
            "hicache load: +%d tokens from host", len(blobs) * ps
        )
        return end

    # ---- async paths (reference LayerDoneCounter/queue analog) --------
    def write_back_async(self, token_prefix: List[int], pages):
        """Launch the page gather on-device (async dispatch), then hand
        the device->host readback + host-pool insert to the IO thread so
        eviction never blocks the scheduler. Safe because freed pages sit
        in the deferred-free hazard window until in-flight forwards
        resolve, and the gather is dispatched before any reuse."""
        n = len(pages)
        if n == 0:
            return
        token_prefix = list(token_prefix)
        pages = list(pages)
        dev, _ = self.runner.extract_pages_device(pages)

        def _complete():
            import jax

            host = jax.device_get(dev)
            blobs = tuple(np.asarray(x[:, :n]) for x in host)
            self._store_blobs(token_prefix, pages, blobs)

        self._io.submit(_complete)

    def _store_blobs(self, token_prefix, pages, blobs):
        ps = self.page_size
        n = len(pages)
        start_page = (len(token_prefix) - n * ps) // ps
        h = self._chain_to(token_prefix, start_page)
        for i in range(n):
            lo = (start_page + i) * ps
            h = page_hash_chain(h, token_prefix[lo : lo + ps])
            spilled = self.host.put(h, self._slice_blob(blobs, i))
            self.num_write_back += 1
            _hicache_metric('hicache_writeback_tokens', self.page_size)
            if self.storage is not None:
                for key, blob in spilled:
                    self.storage.set(key, blob)

    def start_load(self, fill_ids: List[int], prefix_len: int,
                   allocator, tree_cache) -> Optional["HiCacheLoadJob"]:
        """Phase 1 (scheduler thread): match the host tier, reserve
        device pages, and kick the host->device staging transfer to the
        IO thread. Returns None when there is nothing to load."""
        keys, blobs = self.match_extra(fill_ids, prefix_len)
        if not blobs:
            return None
        pages = allocator.alloc_pages(len(blobs))
        if pages is None:
            tree_cache.evict(
                len(blobs) - allocator.available_pages(),
                allocator.release_pages,
                on_evict=self.write_back_async,
            )
            pages = allocator.alloc_pages(len(blobs))
        if pages is None:
            avail = allocator.available_pages()
            if avail == 0:
                return None
            blobs = blobs[:avail]
            pages = allocator.alloc_pages(len(blobs))
            if pages is None:
                return None

        def _stage():
            import jax.numpy as jnp

            stacked = self.runner.stack_page_blobs(pages, blobs)
            return tuple(jnp.asarray(x) for x in stacked)

        return HiCacheLoadJob(
            fill_ids=list(fill_ids),
            prefix_len=prefix_len,
            pages=list(pages),
            n_tokens=len(blobs) * self.page_size,
            staged=self._io.submit(_stage),
            t_start=time.monotonic(),
        )

    def finish_load(self, job: "HiCacheLoadJob", allocator,
                    tree_cache) -> int:
        """Phase 2 (scheduler thread, after job.ready()): async scatter
        into the pool + radix insert. Returns the new prefix length."""
        staged = job.staged.result()
        self.runner.insert_staged(job.pages, staged)
        ps = self.page_size
        end = job.prefix_len + len(job.pages) * ps
        m = tree_cache.match_prefix(job.fill_ids[: job.prefix_len])
        dev_pages = m.page_ids + job.pages
        dup = tree_cache.insert(job.fill_ids[:end], dev_pages)
        if dup > job.prefix_len:
            mm = tree_cache.match_prefix(job.fill_ids[:end])
            extra = [p for p in job.pages if p not in set(mm.page_ids)]
            allocator.release_pages(extra)
        _hicache_hist('hicache_prefetch_pages', len(job.pages))
        _hicache_hist('hicache_load_seconds',
                      time.monotonic() - job.t_start)
        logger.debug("hicache async load: +%d tokens", job.n_tokens)
        return end

    @staticmethod
    def _slice_blob(blobs, i):
        """blobs = tuple of arrays with the page axis second -> one page."""
        return tuple(np.ascontiguousarray(x[:, i]) for x in blobs)


@dataclasses.dataclass
class HiCacheLoadJob:
    """An in-flight host->device prefix load (two-phase, reference
    PrefetchOperation analog)."""

    fill_ids: List[int]
    prefix_len: int
    pages: List[int]
    n_tokens: int
    staged: "concurrent.futures.Future"
    t_start: float = 0.0

    def ready(self) -> bool:
        return self.staged.done()
