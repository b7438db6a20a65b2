"""Expert-parallel load balancing (EPLB).

Analog of the reference's ``managers/eplb_manager.py`` +
``managers/expert_location.py`` + ``managers/eplb_algorithms/deepseek.py``
(hierarchical balanced packing) + ``managers/expert_distribution.py``
(per-pass expert-choice recorder). Implemented from the algorithm's public
semantics: hot logical experts get redundant physical replicas, then
physical experts are packed onto EP ranks to equalize load.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ExpertLocationMetadata:
    """Logical<->physical expert maps (ExpertLocationMetadata:22 analog)."""

    physical_to_logical: np.ndarray  # [L, P] int
    logical_to_physical: List[List[List[int]]]  # [L][E] -> replica list
    physical_to_rank: np.ndarray     # [L, P] int

    @property
    def num_physical(self) -> int:
        return self.physical_to_logical.shape[1]

    def dispatch(self, layer: int, logical_id: int, token_idx: int) -> int:
        """Pick a physical replica for a token (static round-robin —
        expert_location_dispatch.py analog)."""
        replicas = self.logical_to_physical[layer][logical_id]
        return replicas[token_idx % len(replicas)]


def rebalance_experts(
    load: np.ndarray,        # [L, E] observed tokens per logical expert
    num_physical: int,       # E + redundant
    num_ranks: int,
) -> ExpertLocationMetadata:
    """Greedy balanced replication + LPT packing per layer.

    1) every logical expert gets one replica; the R extra replicas go to
       the expert with the highest load-per-replica (greedy);
    2) physical replicas (weight = load/replicas) are packed onto ranks by
       longest-processing-time-first under a per-rank slot capacity.
    """
    L, E = load.shape
    P = num_physical
    assert P >= E and P % num_ranks == 0
    cap = P // num_ranks
    p2l = np.zeros((L, P), np.int64)
    p2rank = np.zeros((L, P), np.int64)
    l2p: List[List[List[int]]] = []

    for layer in range(L):
        w = load[layer].astype(np.float64) + 1e-6
        replicas = np.ones(E, np.int64)
        for _ in range(P - E):
            replicas[np.argmax(w / replicas)] += 1
        # expand to physical list
        phys_logical = []
        phys_weight = []
        for e in range(E):
            for _ in range(int(replicas[e])):
                phys_logical.append(e)
                phys_weight.append(w[e] / replicas[e])
        order = np.argsort(-np.asarray(phys_weight))
        rank_load = np.zeros(num_ranks)
        rank_slots = [[] for _ in range(num_ranks)]
        for idx in order:
            # least-loaded rank with a free slot
            cands = [r for r in range(num_ranks)
                     if len(rank_slots[r]) < cap]
            r = min(cands, key=lambda r: rank_load[r])
            rank_slots[r].append(int(idx))
            rank_load[r] += phys_weight[idx]
        # physical ids are rank-major (rank r owns [r*cap, (r+1)*cap))
        layer_l2p: List[List[int]] = [[] for _ in range(E)]
        p = 0
        for r in range(num_ranks):
            for idx in rank_slots[r]:
                le = phys_logical[idx]
                p2l[layer, p] = le
                p2rank[layer, p] = r
                layer_l2p[le].append(p)
                p += 1
        l2p.append(layer_l2p)
    return ExpertLocationMetadata(p2l, l2p, p2rank)


def load_imbalance(load: np.ndarray, meta: ExpertLocationMetadata,
                   num_ranks: int) -> float:
    """max/mean per-rank load after placement (1.0 = perfect)."""
    L, E = load.shape
    rank_load = np.zeros((L, num_ranks))
    for layer in range(L):
        for p in range(meta.num_physical):
            le = meta.physical_to_logical[layer, p]
            n_rep = len(meta.logical_to_physical[layer][le])
            rank_load[layer, meta.physical_to_rank[layer, p]] += (
                load[layer, le] / n_rep
            )
    mean = rank_load.mean(axis=1) + 1e-9
    return float((rank_load.max(axis=1) / mean).mean())


class ExpertDistributionRecorder:
    """Per-layer logical-expert choice counts
    (ExpertDistributionRecorder:26 analog, 'stat' mode)."""

    def __init__(self, num_layers: int, num_experts: int):
        self.counts = np.zeros((num_layers, num_experts), np.int64)
        self.enabled = False

    def start(self):
        self.enabled = True

    def stop(self):
        self.enabled = False

    def reset(self):
        self.counts[:] = 0

    def record(self, layer: int, topk_ids: np.ndarray):
        if not self.enabled:
            return
        ids = np.asarray(topk_ids).reshape(-1)
        ids = ids[(ids >= 0) & (ids < self.counts.shape[1])]
        np.add.at(self.counts[layer], ids, 1)

    def dump(self):
        return {
            "counts": self.counts.tolist(),
            "total": int(self.counts.sum()),
        }


class EPLBManager:
    """Periodic rebalance driver (EPLBManager:18 analog): consumes the
    recorder's load, re-derives placement, reports the weight movement
    plan (physical slot -> logical expert)."""

    def __init__(self, recorder: ExpertDistributionRecorder,
                 num_physical: int, num_ranks: int):
        self.recorder = recorder
        self.num_physical = num_physical
        self.num_ranks = num_ranks
        self.meta: Optional[ExpertLocationMetadata] = None

    def rebalance(self) -> ExpertLocationMetadata:
        load = self.recorder.counts.astype(np.float64)
        self.meta = rebalance_experts(
            load, self.num_physical, self.num_ranks
        )
        imb = load_imbalance(load, self.meta, self.num_ranks)
        logger.info("EPLB rebalanced: imbalance=%.3f", imb)
        return self.meta
