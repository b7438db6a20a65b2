"""Native (C++) radix cache wrapper.

Same API as ``mem/radix_cache.py RadixCache``; backed by the
``_radix_cpp`` extension (csrc/radix_tree.cpp). Node handles are integer
ids instead of TreeNode objects.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from sglang_fluentllm_tpu.mem.radix_cache import MatchResult


def native_available() -> bool:
    try:
        from sglang_fluentllm_tpu import _radix_cpp  # noqa: F401

        return True
    except ImportError:
        return False


class _NodeHandle:
    __slots__ = ("id",)

    def __init__(self, node_id: int):
        self.id = node_id


class RadixCacheCpp:
    def __init__(self, page_size: int, disable: bool = False,
                 eviction_policy: str = "lru"):
        from sglang_fluentllm_tpu import _radix_cpp

        self._m = _radix_cpp
        self.page_size = page_size
        self.disable = disable
        self.eviction_policy = eviction_policy
        self._tree = self._m.rt_new(page_size, eviction_policy == "lfu")
        self._root_handle = _NodeHandle(0)

    def reset(self):
        self._m.rt_reset(self._tree)

    @property
    def root(self):
        return self._root_handle

    def match_prefix(self, token_ids: List[int]) -> MatchResult:
        if self.disable:
            return MatchResult(0, [], self._root_handle)
        pages, node_id = self._m.rt_match(self._tree, list(token_ids))
        return MatchResult(
            len(pages) * self.page_size, pages, _NodeHandle(node_id)
        )

    def insert(self, token_ids: List[int], page_ids: List[int]) -> int:
        if self.disable:
            return 0
        return self._m.rt_insert(
            self._tree, list(token_ids), list(page_ids)
        )

    def inc_lock_ref(self, node):
        if node is not None:
            self._m.rt_lock(self._tree, node.id, 1)

    def dec_lock_ref(self, node):
        if node is not None:
            self._m.rt_lock(self._tree, node.id, -1)

    def evict(self, num_pages: int,
              free_page_fn: Callable[[List[int]], None],
              on_evict: Optional[Callable] = None) -> int:
        if self.disable:
            return 0
        freed = 0
        for tokens, pages in self._m.rt_evict(self._tree, num_pages):
            if on_evict is not None and pages:
                on_evict(tokens, pages)
            free_page_fn(pages)
            freed += len(pages)
        return freed

    def node_prefix_tokens(self, node):
        raise NotImplementedError(
            "native cache returns token paths from evict() directly"
        )

    @property
    def evictable_size(self) -> int:
        ev, _ = self._m.rt_sizes(self._tree)
        return ev * self.page_size

    @property
    def protected_size(self) -> int:
        _, pr = self._m.rt_sizes(self._tree)
        return pr * self.page_size

    def total_cached_tokens(self) -> int:
        return self.evictable_size + self.protected_size

    def pretty_print(self) -> str:
        return "<native radix tree>"


def create_radix_cache(page_size: int, disable: bool = False,
                       eviction_policy: str = "lru",
                       prefer_native: bool = True):
    """Factory: native C++ tree when built, python fallback otherwise."""
    if prefer_native and not disable and native_available():
        return RadixCacheCpp(page_size, disable, eviction_policy)
    from sglang_fluentllm_tpu.mem.radix_cache import RadixCache

    return RadixCache(page_size, disable, eviction_policy)
