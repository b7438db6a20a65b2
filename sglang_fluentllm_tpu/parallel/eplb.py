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


def _pack_lpt(weights: np.ndarray, n_bins: int, cap: int) -> List[List[int]]:
    """Longest-processing-time-first packing of items onto bins with a hard
    per-bin slot capacity. Returns item indices per bin."""
    order = np.argsort(-weights)
    bin_load = np.zeros(n_bins)
    bins: List[List[int]] = [[] for _ in range(n_bins)]
    for idx in order:
        cands = [b for b in range(n_bins) if len(bins[b]) < cap]
        b = min(cands, key=lambda b: bin_load[b])
        bins[b].append(int(idx))
        bin_load[b] += weights[idx]
    return bins


def rebalance_experts(
    load: np.ndarray,        # [L, E] observed tokens per logical expert
    num_physical: int,       # E + redundant
    num_ranks: int,
    num_nodes: int = 1,
) -> ExpertLocationMetadata:
    """Hierarchical balanced replication + packing per layer (reference
    ``eplb_algorithms/deepseek.py:84`` rebalance_experts_hierarchical).

    1) every logical expert gets one replica; the R extra replicas go to
       the expert with the highest load-per-replica (greedy — equivalent
       to the reference's replicate_experts loop);
    2) two-level packing: replicas are first packed onto NODES (DCN
       islands when ``num_nodes > 1``; the ICI-connected slice is flat, so
       single-host stays one level), then onto the ranks within each node,
       both by longest-processing-time-first under hard slot capacities.
    """
    L, E = load.shape
    P = num_physical
    assert P >= E and P % num_ranks == 0
    if num_ranks % max(num_nodes, 1) != 0:
        num_nodes = 1
    cap = P // num_ranks
    ranks_per_node = num_ranks // num_nodes
    node_cap = cap * ranks_per_node
    p2l = np.zeros((L, P), np.int64)
    p2rank = np.zeros((L, P), np.int64)
    l2p: List[List[List[int]]] = []

    for layer in range(L):
        w = load[layer].astype(np.float64) + 1e-6
        replicas = np.ones(E, np.int64)
        for _ in range(P - E):
            replicas[np.argmax(w / replicas)] += 1
        # expand to physical replica list
        phys_logical = []
        phys_weight = []
        for e in range(E):
            for _ in range(int(replicas[e])):
                phys_logical.append(e)
                phys_weight.append(w[e] / replicas[e])
        phys_weight = np.asarray(phys_weight)

        # level 1: replicas -> nodes
        node_bins = (
            _pack_lpt(phys_weight, num_nodes, node_cap)
            if num_nodes > 1
            else [list(range(len(phys_weight)))]
        )
        # level 2: within each node, replicas -> its ranks
        layer_l2p: List[List[int]] = [[] for _ in range(E)]
        for node, items in enumerate(node_bins):
            iw = phys_weight[items]
            rank_bins = _pack_lpt(iw, ranks_per_node, cap)
            for r_local, bin_items in enumerate(rank_bins):
                r = node * ranks_per_node + r_local
                for j, local_idx in enumerate(bin_items):
                    idx = items[local_idx]
                    p = r * cap + j
                    le = phys_logical[idx]
                    p2l[layer, p] = le
                    p2rank[layer, p] = r
                    layer_l2p[le].append(p)
        l2p.append(layer_l2p)
    return ExpertLocationMetadata(p2l, l2p, p2rank)


def stacked_tables(meta: ExpertLocationMetadata, max_rep: int):
    """Per-layer runtime routing arrays: (l2p [L,E,max_rep] int32,
    n_rep [L,E] int32). Replica lists are padded modulo so shapes stay
    rebalance-proof."""
    L, P = meta.physical_to_logical.shape
    E = len(meta.logical_to_physical[0])
    l2p = np.zeros((L, E, max_rep), np.int32)
    n_rep = np.ones((L, E), np.int32)
    for layer in range(L):
        for e, reps in enumerate(meta.logical_to_physical[layer]):
            assert reps, f"expert {e} lost all replicas at layer {layer}"
            assert len(reps) <= max_rep, (
                f"{len(reps)} replicas exceed table width {max_rep}"
            )
            n_rep[layer, e] = len(reps)
            for j in range(max_rep):
                l2p[layer, e, j] = reps[j % len(reps)]
    return l2p, n_rep


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
