"""Paged KV-cache allocator (host side).

TPU-native re-design of the reference's ``mem_cache/allocator.py``
(``KVAllocator:19``): page-granular allocation with a free-page stack, a
per-request page table, partial-page reuse, and deferred free groups. The
device never sees this object — schedulers use it to compute static int32
page-table / slot tensors that are shipped into jit-compiled programs.

Conventions (mirroring reference semantics, ``allocator.py:60-180``):
- page 0 is reserved as the padding page; token slot 0 is the padding slot.
- a token at position ``pos`` of request ``r`` lives at slot
  ``page_table[r, pos // page_size] * page_size + pos % page_size``.
- frees can be deferred into a group (``free_group_begin/end``) so that page
  reuse is postponed until the overlap-scheduling window closes.
"""

from __future__ import annotations

import heapq
from typing import List, Optional, Sequence

import numpy as np


class KVAllocator:
    def __init__(
        self,
        num_pages: int,
        page_size: int,
        max_reqs: int,
        max_context_len: int,
    ):
        self.page_size = page_size
        self.num_pages = num_pages
        self.max_reqs = max_reqs
        self.max_pages_per_req = -(-max_context_len // page_size)
        # page ids 1..num_pages are allocatable; 0 is the padding page.
        # Min-heap: allocation always returns the LOWEST free ids, so a
        # multi-page grab from an un-fragmented region is a consecutive
        # ascending run — the layout the Pallas kernels' coalesced-run DMA
        # fast path wants (pallas_decode_multirow page-run contract).
        self._free_pages: List[int] = list(range(1, num_pages + 1))
        self.page_table = np.zeros(
            (max_reqs, self.max_pages_per_req), dtype=np.int32
        )
        self._free_group: Optional[List[int]] = None

    # ------------------------------------------------------------------
    def available_pages(self) -> int:
        return len(self._free_pages)

    def available_tokens(self) -> int:
        return len(self._free_pages) * self.page_size

    # ------------------------------------------------------------------
    def alloc_pages(self, n: int) -> Optional[List[int]]:
        if n > len(self._free_pages):
            return None
        if n == 0:
            return []
        return [heapq.heappop(self._free_pages) for _ in range(n)]

    def free_pages(self, pages: Sequence[int]):
        if self._free_group is not None:
            self._free_group.extend(int(p) for p in pages)
        else:
            for p in pages:
                heapq.heappush(self._free_pages, int(p))

    def free_group_begin(self):
        if self._free_group is None:
            self._free_group = []

    def free_group_end(self):
        group, self._free_group = self._free_group, None
        if group:
            for p in group:
                heapq.heappush(self._free_pages, p)

    def free_group_take(self):
        """Close the group and hand its pages to the caller (who releases
        them once the overlap hazard window passes)."""
        group, self._free_group = self._free_group or [], None
        return group

    def release_pages(self, pages: Sequence[int]):
        """Return deferred pages to the free list immediately."""
        for p in pages:
            heapq.heappush(self._free_pages, int(p))

    # ------------------------------------------------------------------
    def pages_needed(self, alloced_len: int, extend_len: int) -> int:
        ps = self.page_size
        return -(-(alloced_len + extend_len) // ps) - (-(-alloced_len // ps))

    def alloc_extend(
        self, req_idx: int, alloced_len: int, extend_len: int
    ) -> Optional[np.ndarray]:
        """Reserve slots for positions [alloced_len, alloced_len+extend_len).

        Fills the request's last partial page first, then pops whole pages
        (reference ``allocator.py:60-102``). Returns the flat token-slot
        array, or None on OOM (no pages were taken in that case).
        """
        assert req_idx is not None
        ps = self.page_size
        need_pages = self.pages_needed(alloced_len, extend_len)
        new_pages = self.alloc_pages(need_pages)
        if new_pages is None:
            return None
        first_new_page = -(-alloced_len // ps)
        if new_pages:
            self.page_table[
                req_idx, first_new_page : first_new_page + len(new_pages)
            ] = new_pages
        return self.token_slots(req_idx, alloced_len, alloced_len + extend_len)

    def set_prefix_pages(self, req_idx: int, pages: Sequence[int]):
        """Install radix-cache matched prefix pages into the page table."""
        if len(pages):
            self.page_table[req_idx, : len(pages)] = np.asarray(
                pages, dtype=np.int32
            )

    def req_pages(self, req_idx: int, num_tokens: int) -> np.ndarray:
        n = -(-num_tokens // self.page_size)
        return self.page_table[req_idx, :n].copy()

    def token_slots(self, req_idx: int, start: int, end: int) -> np.ndarray:
        """Flat token-slot ids for positions [start, end) of a request."""
        if end <= start:
            return np.zeros((0,), dtype=np.int32)
        pos = np.arange(start, end, dtype=np.int32)
        pages = self.page_table[req_idx, pos // self.page_size]
        return pages * self.page_size + pos % self.page_size

    def free_req_pages(
        self,
        req_idx: int,
        total_len: int,
        keep_len: int = 0,
        skip_pages: Optional[Sequence[int]] = None,
    ):
        """Free the request's pages past ``keep_len`` (page-aligned).

        ``skip_pages`` implements the reference's ``free_with_diff``
        (``allocator.py:123``): pages also owned by the radix tree are not
        returned to the free list.
        """
        ps = self.page_size
        assert keep_len % ps == 0
        start = keep_len // ps
        end = -(-total_len // ps)
        pages = self.page_table[req_idx, start:end]
        if skip_pages is not None and len(skip_pages):
            skip = set(int(p) for p in skip_pages)
            pages = [int(p) for p in pages if int(p) not in skip]
        else:
            pages = [int(p) for p in pages]
        self.free_pages([p for p in pages if p != 0])
        self.page_table[req_idx, start:end] = 0

    def clear(self):
        self._free_pages = list(range(1, self.num_pages + 1))
        self.page_table[:] = 0
        self._free_group = None
