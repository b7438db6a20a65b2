"""Radix-tree prefix cache over KV pages.

Semantics ported (not code) from the reference's ``mem_cache/radix_cache.py``
(``RadixCache:185``, page-granular in the FluentLLM fork — SURVEY A.2):

- tree keys are page-aligned chunks of token ids; node values are page ids;
- ``match_prefix`` returns the longest page-aligned cached prefix plus the
  node to lock; locked paths ("protected") are not evictable;
- ``insert`` dedups against existing paths and reports how many of the
  inserted pages were already present, so the caller can return the freshly
  written duplicates to the allocator (reference ``free_with_diff``);
- eviction pops LRU/LFU leaves with no lock refs.
"""

from __future__ import annotations

import dataclasses
import heapq
import time
from typing import Callable, Dict, List, Optional, Tuple

PageKey = Tuple[int, ...]


class TreeNode:
    __slots__ = (
        "children",
        "parent",
        "key",
        "value",
        "lock_ref",
        "last_access_time",
        "hit_count",
        "id",
    )
    _id_counter = 0

    def __init__(self):
        self.children: Dict[PageKey, "TreeNode"] = {}
        self.parent: Optional["TreeNode"] = None
        self.key: List[int] = []        # token ids, multiple of page_size
        self.value: List[int] = []      # page ids, len == len(key)//page_size
        self.lock_ref = 0
        self.last_access_time = time.monotonic()
        self.hit_count = 0
        self.id = TreeNode._id_counter
        TreeNode._id_counter += 1

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time


@dataclasses.dataclass
class MatchResult:
    prefix_len: int             # in tokens (page-aligned)
    page_ids: List[int]
    last_node: TreeNode


class RadixCache:
    def __init__(self, page_size: int, disable: bool = False,
                 eviction_policy: str = "lru"):
        self.page_size = page_size
        self.disable = disable
        self.eviction_policy = eviction_policy
        self.reset()

    def reset(self):
        self.root = TreeNode()
        self.root.lock_ref = 1
        self._evictable_pages = 0
        self._protected_pages = 0

    # ------------------------------------------------------------------
    def _page_chunks(self, key: List[int]):
        ps = self.page_size
        return [tuple(key[i : i + ps]) for i in range(0, len(key), ps)]

    def match_prefix(self, token_ids: List[int]) -> MatchResult:
        """Longest page-aligned cached prefix of ``token_ids``."""
        if self.disable:
            return MatchResult(0, [], self.root)
        ps = self.page_size
        aligned = (len(token_ids) // ps) * ps
        chunks = self._page_chunks(list(token_ids[:aligned]))
        node = self.root
        pages: List[int] = []
        i = 0
        while i < len(chunks):
            child = node.children.get(chunks[i])
            if child is None:
                break
            child_chunks = self._page_chunks(child.key)
            n_match = 0
            while (
                n_match < len(child_chunks)
                and i + n_match < len(chunks)
                and child_chunks[n_match] == chunks[i + n_match]
            ):
                n_match += 1
            if n_match < len(child_chunks):
                child = self._split_node(child, n_match)
            pages.extend(child.value)
            node = child
            node.last_access_time = time.monotonic()
            node.hit_count += 1
            i += n_match
        return MatchResult(len(pages) * ps, pages, node)

    def _split_node(self, node: TreeNode, n_pages: int) -> TreeNode:
        """Split ``node`` so its first ``n_pages`` pages become the parent."""
        ps = self.page_size
        upper = TreeNode()
        upper.key = node.key[: n_pages * ps]
        upper.value = node.value[:n_pages]
        upper.parent = node.parent
        upper.lock_ref = node.lock_ref
        upper.last_access_time = node.last_access_time
        upper.hit_count = node.hit_count
        upper.parent.children[tuple(upper.key[:ps])] = upper

        node.key = node.key[n_pages * ps :]
        node.value = node.value[n_pages:]
        node.parent = upper
        upper.children[tuple(node.key[:ps])] = node
        return upper

    # ------------------------------------------------------------------
    def insert(self, token_ids: List[int], page_ids: List[int]) -> int:
        """Insert a page-aligned sequence; returns #tokens whose pages were
        already cached (the caller should free its duplicate pages for that
        span via the allocator)."""
        if self.disable:
            return 0
        ps = self.page_size
        aligned = (len(token_ids) // ps) * ps
        token_ids = list(token_ids[:aligned])
        page_ids = list(page_ids[: aligned // ps])
        chunks = self._page_chunks(token_ids)

        node = self.root
        i = 0
        dup_pages = 0
        while i < len(chunks):
            child = node.children.get(chunks[i])
            if child is None:
                new = TreeNode()
                new.key = token_ids[i * ps :]
                new.value = page_ids[i:]
                new.parent = node
                node.children[chunks[i]] = new
                self._evictable_pages += len(new.value)
                return dup_pages * ps
            child_chunks = self._page_chunks(child.key)
            n_match = 0
            while (
                n_match < len(child_chunks)
                and i + n_match < len(chunks)
                and child_chunks[n_match] == chunks[i + n_match]
            ):
                n_match += 1
            if n_match < len(child_chunks):
                child = self._split_node(child, n_match)
            child.last_access_time = time.monotonic()
            dup_pages += n_match
            node = child
            i += n_match
        return dup_pages * ps

    # ------------------------------------------------------------------
    def inc_lock_ref(self, node: TreeNode):
        """Protect the path root..node from eviction (reference :451)."""
        while node is not None and node is not self.root:
            if node.lock_ref == 0:
                self._evictable_pages -= len(node.value)
                self._protected_pages += len(node.value)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode):
        while node is not None and node is not self.root:
            node.lock_ref -= 1
            if node.lock_ref == 0:
                self._evictable_pages += len(node.value)
                self._protected_pages -= len(node.value)
            node = node.parent

    # ------------------------------------------------------------------
    def node_prefix_tokens(self, node: TreeNode) -> List[int]:
        """Full token path root..node (for hicache hash-chain keys)."""
        parts = []
        while node is not None and node is not self.root:
            parts.append(node.key)
            node = node.parent
        out: List[int] = []
        for k in reversed(parts):
            out.extend(k)
        return out

    def evict(self, num_pages: int, free_page_fn: Callable[[List[int]], None],
              on_evict: Optional[Callable] = None):
        """Evict >= num_pages from LRU (or LFU) unlocked leaves.
        ``on_evict(token_prefix, pages)`` fires before the free (hicache
        write-back hook)."""
        if self.disable:
            return 0
        leaves = []
        for leaf in self._collect_leaves():
            if leaf.lock_ref == 0 and leaf is not self.root:
                pri = (
                    leaf.hit_count
                    if self.eviction_policy == "lfu"
                    else leaf.last_access_time
                )
                heapq.heappush(leaves, (pri, leaf.id, leaf))
        freed = 0
        while leaves and freed < num_pages:
            _, _, leaf = heapq.heappop(leaves)
            if on_evict is not None and leaf.value:
                on_evict(self.node_prefix_tokens(leaf), list(leaf.value))
            free_page_fn(leaf.value)
            freed += len(leaf.value)
            self._evictable_pages -= len(leaf.value)
            parent = leaf.parent
            del parent.children[tuple(leaf.key[: self.page_size])]
            if (
                parent is not self.root
                and not parent.children
                and parent.lock_ref == 0
            ):
                pri = (
                    parent.hit_count
                    if self.eviction_policy == "lfu"
                    else parent.last_access_time
                )
                heapq.heappush(leaves, (pri, parent.id, parent))
        return freed

    def _collect_leaves(self):
        stack = [self.root]
        while stack:
            node = stack.pop()
            if not node.children:
                yield node
            else:
                stack.extend(node.children.values())

    # ------------------------------------------------------------------
    @property
    def evictable_size(self) -> int:  # tokens
        return self._evictable_pages * self.page_size

    @property
    def protected_size(self) -> int:  # tokens
        return self._protected_pages * self.page_size

    def total_cached_tokens(self) -> int:
        return self.evictable_size + self.protected_size

    def pretty_print(self) -> str:
        lines = []

        def rec(node, depth):
            lines.append(
                "  " * depth
                + f"[{len(node.value)} pages, lock={node.lock_ref}] "
                + str(node.key[:8])
            )
            for c in node.children.values():
                rec(c, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)
