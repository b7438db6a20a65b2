"""Group-partitioned KV allocation for DP-attention.

With ``attn_tp_size < tp_size`` the device mesh splits into
``G = tp_size // attn_tp_size`` attention groups (reference
``layers/dp_attention.py:97`` initialize_dp_attention). Every group owns a
private KV pool slice (the pool carries a leading ``dp`` dim sharded over
the mesh's dp axis), so page ids handed to the device must be GROUP-LOCAL.

Host-side bookkeeping still wants one coherent id space — the scheduler's
deferred-free groups, radix-shared page sets and chunk listeners all pass
bare page lists around. This facade keeps the host on GLOBAL ids:

    global_page = local_page + group * stride,   stride = num_pages + 1

so id 0 stays the padding page, routing a free/release back to its owner
group is pure arithmetic, and the G == 1 case degenerates to a thin
passthrough (the scheduler always runs through this facade — one code
path, not two).

The global->local conversion happens exactly once, at batch build
(``BatchBuilder.build_*_grouped``), which also lays rows out group-major so
``shard_map`` over the dp axis sees each group's rows on its own devices.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from sglang_fluentllm_tpu.mem.allocator import KVAllocator


class GroupedKVAllocator:
    """N-group facade over per-group ``KVAllocator``s, global page ids."""

    def __init__(
        self,
        num_pages: int,
        page_size: int,
        max_reqs: int,
        max_context_len: int,
        n_groups: int = 1,
    ):
        self.page_size = page_size
        self.num_pages = num_pages          # per group
        self.n_groups = n_groups
        self.stride = num_pages + 1         # global-id stride per group
        self.max_reqs = max_reqs
        self.groups: List[KVAllocator] = [
            KVAllocator(num_pages, page_size, max_reqs, max_context_len)
            for _ in range(n_groups)
        ]
        self._req_group: Dict[int, int] = {}

    # ---- group assignment ---------------------------------------------
    def set_group(self, req_idx: int, group: int):
        assert 0 <= group < self.n_groups
        self._req_group[req_idx] = group

    def group_of(self, req_idx: int) -> int:
        return self._req_group.get(req_idx, 0)

    def group_of_page(self, page: int) -> int:
        return int(page) // self.stride

    # ---- capacity ------------------------------------------------------
    def available_pages(self, group: Optional[int] = None) -> int:
        if group is not None:
            return self.groups[group].available_pages()
        return min(g.available_pages() for g in self.groups)

    def available_tokens(self, group: Optional[int] = None) -> int:
        return self.available_pages(group) * self.page_size

    def pages_needed(self, alloced_len: int, extend_len: int) -> int:
        return self.groups[0].pages_needed(alloced_len, extend_len)

    # ---- id conversion --------------------------------------------------
    def _pages_global(self, pages, group: int):
        if len(pages) == 0:
            return np.asarray(pages, np.int32)
        return np.asarray(pages, np.int32) + group * self.stride

    def _pages_local(self, pages, group: int):
        if len(pages) == 0:
            return np.asarray(pages, np.int32)
        return np.asarray(pages, np.int32) - group * self.stride

    # ---- allocation ------------------------------------------------------
    def alloc_pages(self, n: int, group: int = 0) -> Optional[List[int]]:
        local = self.groups[group].alloc_pages(n)
        if local is None:
            return None
        base = group * self.stride
        return [p + base for p in local]

    def alloc_extend(
        self, req_idx: int, alloced_len: int, extend_len: int
    ) -> Optional[np.ndarray]:
        g = self.group_of(req_idx)
        slots = self.groups[g].alloc_extend(req_idx, alloced_len, extend_len)
        if slots is None:
            return None
        return slots + np.int32(g * self.stride * self.page_size)

    def set_prefix_pages(self, req_idx: int, pages: Sequence[int]):
        g = self.group_of(req_idx)
        self.groups[g].set_prefix_pages(
            req_idx, self._pages_local(pages, g)
        )

    def req_pages(self, req_idx: int, num_tokens: int) -> np.ndarray:
        g = self.group_of(req_idx)
        return self._pages_global(
            self.groups[g].req_pages(req_idx, num_tokens), g
        )

    def token_slots(self, req_idx: int, start: int, end: int) -> np.ndarray:
        g = self.group_of(req_idx)
        slots = self.groups[g].token_slots(req_idx, start, end)
        return slots + np.int32(g * self.stride * self.page_size)

    # ---- freeing ----------------------------------------------------------
    def _route(self, pages: Sequence[int]) -> Dict[int, List[int]]:
        by: Dict[int, List[int]] = {}
        for p in pages:
            p = int(p)
            by.setdefault(p // self.stride, []).append(p % self.stride)
        return by

    def free_pages(self, pages: Sequence[int]):
        for g, local in self._route(pages).items():
            self.groups[g].free_pages(local)

    def release_pages(self, pages: Sequence[int]):
        for g, local in self._route(pages).items():
            self.groups[g].release_pages(local)

    def free_req_pages(
        self,
        req_idx: int,
        total_len: int,
        keep_len: int = 0,
        skip_pages: Optional[Sequence[int]] = None,
    ):
        g = self.group_of(req_idx)
        skip = (
            self._pages_local(skip_pages, g)
            if skip_pages is not None and len(skip_pages)
            else skip_pages
        )
        self.groups[g].free_req_pages(
            req_idx, total_len, keep_len=keep_len, skip_pages=skip
        )

    # ---- deferred free groups ----------------------------------------------
    def free_group_begin(self):
        for g in self.groups:
            g.free_group_begin()

    def free_group_end(self):
        for g in self.groups:
            g.free_group_end()

    def free_group_take(self) -> List[int]:
        out: List[int] = []
        for gi, g in enumerate(self.groups):
            out.extend(p + gi * self.stride for p in g.free_group_take())
        return out

    def clear(self):
        for g in self.groups:
            g.clear()
        self._req_group.clear()
