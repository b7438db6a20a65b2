"""Request-slot pool.

Analog of the reference's ``mem_cache/memory_pool.py:70 ReqToTokenPool``: maps
requests to stable integer indices used by the page table, and tracks the two
length counters whose gap makes overlap + speculative scheduling safe
(SURVEY A.1):

- ``alloced_len``  — KV slots reserved (>= verified; spec decode over-reserves)
- ``verified_len`` — tokens whose KV is known valid (advanced only after the
  forward that produced them is complete)

The token-position -> slot map itself is derived from ``KVAllocator``'s page
table (slot = page * page_size + offset), so no separate req_to_token tensor
is materialized host-side; device programs receive page tables directly.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class ReqPool:
    def __init__(self, max_reqs: int):
        self.max_reqs = max_reqs
        self._free: List[int] = list(range(max_reqs - 1, -1, -1))
        self.alloced_len = np.zeros((max_reqs,), dtype=np.int64)
        self.verified_len = np.zeros((max_reqs,), dtype=np.int64)

    def available(self) -> int:
        return len(self._free)

    def alloc(self) -> Optional[int]:
        if not self._free:
            return None
        idx = self._free.pop()
        self.alloced_len[idx] = 0
        self.verified_len[idx] = 0
        return idx

    def free(self, idx: int):
        self._free.append(idx)

    def clear(self):
        self._free = list(range(self.max_reqs - 1, -1, -1))
        self.alloced_len[:] = 0
        self.verified_len[:] = 0
