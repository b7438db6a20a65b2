"""EPLB rebalancing + expert distribution recorder tests
(reference test_moe_ep / eplb coverage)."""

import numpy as np

from sglang_fluentllm_tpu.parallel.eplb import (
    EPLBManager,
    ExpertDistributionRecorder,
    load_imbalance,
    rebalance_experts,
)


class TestRebalance:
    def test_uniform_load_perfectly_balanced(self):
        load = np.ones((2, 8))
        meta = rebalance_experts(load, num_physical=8, num_ranks=4)
        assert load_imbalance(load, meta, 4) < 1.01
        # every logical expert placed exactly once
        for layer in range(2):
            assert sorted(meta.physical_to_logical[layer]) == list(range(8))

    def test_skewed_load_gets_replicas(self):
        load = np.ones((1, 8))
        load[0, 0] = 100.0  # hot expert
        meta = rebalance_experts(load, num_physical=12, num_ranks=4)
        # the hot expert received most of the redundancy
        assert len(meta.logical_to_physical[0][0]) >= 3
        # replication + packing keeps ranks close to balanced
        assert load_imbalance(load, meta, 4) < 1.6  # optimum here is ~1.53
        # unbalanced baseline for comparison: no replication
        base = rebalance_experts(load, num_physical=8, num_ranks=4)
        assert load_imbalance(load, meta, 4) < load_imbalance(
            load, base, 4
        )

    def test_all_logical_present(self):
        rng = np.random.RandomState(0)
        load = rng.exponential(1.0, size=(3, 16))
        meta = rebalance_experts(load, num_physical=24, num_ranks=8)
        for layer in range(3):
            present = set(meta.physical_to_logical[layer])
            assert present == set(range(16))
            # rank-major layout: P/ranks experts per rank
            counts = np.bincount(meta.physical_to_rank[layer], minlength=8)
            assert (counts == 3).all()

    def test_dispatch_round_robin(self):
        load = np.ones((1, 4))
        load[0, 2] = 50.0
        meta = rebalance_experts(load, num_physical=6, num_ranks=2)
        reps = meta.logical_to_physical[0][2]
        assert len(reps) >= 2
        picks = {meta.dispatch(0, 2, t) for t in range(8)}
        assert picks == set(reps)


class TestRecorder:
    def test_record_and_rebalance(self):
        rec = ExpertDistributionRecorder(num_layers=2, num_experts=4)
        rec.start()
        rec.record(0, np.array([[0, 1], [0, 2], [0, 3]]))
        rec.record(1, np.array([[3, 3]]))
        assert rec.counts[0, 0] == 3
        assert rec.counts[1, 3] == 2
        mgr = EPLBManager(rec, num_physical=8, num_ranks=2)
        meta = mgr.rebalance()
        # layer 0's hot expert 0 gets extra replicas
        assert len(meta.logical_to_physical[0][0]) >= 2
        rec.stop()
        rec.record(0, np.array([[1]]))
        assert rec.counts[0, 1] == 1  # unchanged after stop

    def test_dump(self):
        rec = ExpertDistributionRecorder(1, 2)
        rec.start()
        rec.record(0, np.array([0, 1, 1]))
        d = rec.dump()
        assert d["total"] == 3
