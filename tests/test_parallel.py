"""Multi-device parallelism tests on the virtual 8-device CPU mesh.

Mirrors the reference's strategy of running real TP/EP servers on multi-GPU
runners (SURVEY §4): here sharded jit programs on 8 virtual devices must
match single-device results exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.parallel.ep import moe_forward_ep
from tests.utils import TINY_DEEPSEEK_CFG, TINY_LLAMA_CFG, tiny_engine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def mk_mesh(dp=1, tp=8):
    devs = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


class TestEPMoE:
    def test_ep_matches_dense(self):
        cfg = ModelConfig.from_hf_dict(TINY_DEEPSEEK_CFG)
        cfg.num_experts = 8  # divisible by tp=8
        E, H, I, T = 8, 64, 64, 16
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                         jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
        ref = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)
        mesh = mk_mesh()
        with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
            out = moe_forward_ep(
                x, logits, w1, w2, cfg, mesh=mesh, use_gmm=False
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_ep_with_zero_experts(self):
        cfg = ModelConfig.from_hf_dict(TINY_DEEPSEEK_CFG)
        cfg.num_experts = 8
        cfg.num_zero_experts = 2
        E, H, I, T = 8, 64, 64, 12
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((T, E + 2)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                         jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
        ref = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)
        mesh = mk_mesh()
        out = moe_forward_ep(x, logits, w1, w2, cfg, mesh=mesh,
                             use_gmm=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestTPEngine:
    def test_tp_engine_matches_single(self):
        """Full engine with tp=8: greedy output equals single-device."""
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19, 88, 5]
        e1 = tiny_engine(TINY_LLAMA_CFG)
        ref = e1.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        # kv heads (2) not divisible by 8 -> use tp=2
        e2 = tiny_engine(TINY_LLAMA_CFG, tp_size=2)
        got = e2.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert got == ref

    def test_ep_engine_runs(self):
        cfg = dict(TINY_DEEPSEEK_CFG)
        cfg["n_routed_experts"] = 8
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19]
        e1 = tiny_engine(cfg)
        ref = e1.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        e2 = tiny_engine(cfg, tp_size=4, moe_parallel_strategy="ep")
        got = e2.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert got == ref


class TestDataParallel:
    def test_dp_router_matches_single(self):
        """dp=2 x tp=2 replicas: every request's greedy output equals the
        single-device engine; requests spread across both groups
        (reference DataParallelController semantics)."""
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        prompts = [[3, 11, 42, 7], [9, 1, 2], [50, 60, 70, 80, 90],
                   [5, 5, 5, 5, 5, 5]]
        e1 = tiny_engine(TINY_LLAMA_CFG)
        refs = [
            e1.generate(input_ids=p, sampling_params=sp)["output_ids"]
            for p in prompts
        ]
        e2 = tiny_engine(TINY_LLAMA_CFG, dp_size=2, tp_size=2)
        outs = e2.generate(input_ids=prompts, sampling_params=sp)
        assert [o["output_ids"] for o in outs] == refs
        from sglang_fluentllm_tpu.sched.dp_controller import (
            DataParallelController,
        )

        assert isinstance(e2.scheduler, DataParallelController)
        gens = [s.num_generated_tokens for s in e2.scheduler.schedulers]
        assert all(g > 0 for g in gens), gens  # both groups served work

    def test_dp_round_robin(self):
        sp = {"max_new_tokens": 2, "temperature": 0.0}
        e = tiny_engine(TINY_LLAMA_CFG, dp_size=2, tp_size=1,
                        load_balance_method="round_robin")
        outs = e.generate(
            input_ids=[[1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 5, 9]],
            sampling_params=sp,
        )
        assert len(outs) == 4
        gens = [s.num_generated_tokens for s in e.scheduler.schedulers]
        assert all(g > 0 for g in gens), gens


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestDpAttention:
    def test_dp_sharded_attention_matches_single(self):
        """Token-level DP-attention on a (dp=2, tp=4) mesh: per-group KV
        pools + DIFFERENT per-group batches under shard_map equal the
        single-device results for each group (reference dp_attention.py
        semantics; idle alignment = row padding by construction)."""
        from sglang_fluentllm_tpu.mem.kv_cache import create_kv_cache
        from sglang_fluentllm_tpu.models import get_model_class
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            RefAttentionBackend,
        )
        from sglang_fluentllm_tpu.parallel.dp_attention import (
            DpShardedAttention,
            build_dp_batch,
            create_dp_kv_cache,
            dp_kv_specs,
        )
        from sglang_fluentllm_tpu.runtime.forward_batch import (
            ForwardBatch,
            ForwardMode,
        )

        cfg = ModelConfig.from_hf_dict({
            "architectures": ["Qwen2ForCausalLM"],
            "model_type": "qwen2",
            "hidden_size": 128,
            "intermediate_size": 256,
            "num_attention_heads": 8,
            "num_key_value_heads": 4,
            "num_hidden_layers": 2,
            "vocab_size": 256,
            "max_position_embeddings": 512,
            "attention_bias": True,
        })
        mesh = mk_mesh(dp=2, tp=4)
        ps, B_l, S, Ppr = 16, 2, 16, 2
        slots = (1 + B_l * Ppr) * ps
        rng = np.random.RandomState(0)

        def group_batch(seed, mode, seq_prev=0):
            r = np.random.RandomState(seed)
            pages = np.zeros((B_l, Ppr), np.int32)
            for i in range(B_l):
                pages[i] = 1 + i * Ppr + np.arange(Ppr)
            if mode == ForwardMode.EXTEND:
                ids = r.randint(1, 255, (B_l, S)).astype(np.int32)
                pos = np.tile(np.arange(S, dtype=np.int32), (B_l, 1))
                loc = np.zeros((B_l, S), np.int32)
                for i in range(B_l):
                    loc[i] = pages[i, pos[i] // ps] * ps + pos[i] % ps
                seq = np.full((B_l,), S, np.int32)
                ql = np.full((B_l,), S, np.int32)
            else:
                ids = r.randint(1, 255, (B_l, 1)).astype(np.int32)
                pos = np.full((B_l, 1), seq_prev, np.int32)
                loc = pages[:, seq_prev // ps] * ps + seq_prev % ps
                loc = loc[:, None]
                seq = np.full((B_l,), seq_prev + 1, np.int32)
                ql = np.full((B_l,), 1, np.int32)
            return ForwardBatch(
                input_ids=jnp.asarray(ids), positions=jnp.asarray(pos),
                out_cache_loc=jnp.asarray(loc),
                page_tables=jnp.asarray(pages),
                seq_lens=jnp.asarray(seq), q_lens=jnp.asarray(ql),
                mode=mode, page_size=ps,
            )

        model_cls = get_model_class(cfg.architectures)
        dp_model = model_cls(cfg, DpShardedAttention(
            RefAttentionBackend(), mesh
        ))
        params = dp_model.init_dummy_params(seed=0, dtype=jnp.float32)
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, dp_model.param_specs(),
        )
        kv = create_dp_kv_cache(cfg, slots, dp=2, dtype=jnp.float32)
        kv = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            kv, dp_kv_specs(kv),
        )

        def ids_of(model, p, kvc, batch):
            kvc, h = model.forward(p, kvc, batch)
            idx = jnp.clip(batch.q_lens - 1, 0, h.shape[1] - 1)
            h_last = jnp.take_along_axis(
                h, idx[:, None, None], axis=1
            )[:, 0]
            lg = model.compute_logits(p, h_last)
            return kvc, jnp.argmax(lg, axis=-1)

        g0e = group_batch(1, ForwardMode.EXTEND)
        g1e = group_batch(2, ForwardMode.EXTEND)
        gbe = build_dp_batch([g0e, g1e])

        def shard_batch(b):
            spec = NamedSharding(mesh, P("dp"))
            return jax.tree.map(
                lambda x: jax.device_put(x, spec), b
            )

        with mesh:
            step = jax.jit(ids_of, static_argnums=(0,))
            kv, ids_e = step(dp_model, params, kv, shard_batch(gbe))
            g0d = group_batch(3, ForwardMode.DECODE, seq_prev=S)
            g1d = group_batch(4, ForwardMode.DECODE, seq_prev=S)
            gbd = build_dp_batch([g0d, g1d])
            kv, ids_d = step(dp_model, params, kv, shard_batch(gbd))
        ids_e, ids_d = np.asarray(ids_e), np.asarray(ids_d)

        # single-device per-group references
        ref_model = model_cls(cfg, RefAttentionBackend())
        p1 = ref_model.init_dummy_params(seed=0, dtype=jnp.float32)
        for g, (be, bd) in enumerate([(g0e, g0d), (g1e, g1d)]):
            kv1 = create_kv_cache(cfg, slots, dtype=jnp.float32)
            kv1, ref_e = ids_of(ref_model, p1, kv1, be)
            kv1, ref_d = ids_of(ref_model, p1, kv1, bd)
            np.testing.assert_array_equal(
                ids_e[g * B_l:(g + 1) * B_l], np.asarray(ref_e)
            )
            np.testing.assert_array_equal(
                ids_d[g * B_l:(g + 1) * B_l], np.asarray(ref_d)
            )


class TestEpDispatch:
    """Fixed-capacity all-to-all EP dispatch (DeepEP low-latency analog)."""

    def _case(self, E=8, H=64, I=32, T=32, K=2, seed=0):
        cfg = ModelConfig.from_hf_dict(dict(
            TINY_DEEPSEEK_CFG, n_routed_experts=E, num_experts_per_tok=K
        ))
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                         jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
        return cfg, x, logits, w1, w2

    def test_dispatch_matches_dense(self):
        from sglang_fluentllm_tpu.parallel.ep_dispatch import (
            EpLocationTables,
            moe_forward_ep_dispatch,
        )

        cfg, x, logits, w1, w2 = self._case()
        ref = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)
        mesh = mk_mesh(dp=1, tp=8)
        tables = EpLocationTables.identity(cfg.num_experts, 8)
        out = moe_forward_ep_dispatch(
            x, logits, w1, w2, cfg, mesh, tables, capacity_factor=8.0
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_dispatch_per_rank_token_counts(self):
        """Tokens are sharded, not replicated: each rank receives at most
        n_ranks * capacity assignments (the fixed-capacity contract)."""
        from sglang_fluentllm_tpu.parallel.ep_dispatch import (
            EpLocationTables,
            moe_forward_ep_dispatch,
        )

        cfg, x, logits, w1, w2 = self._case(T=64)
        mesh = mk_mesh(dp=1, tp=8)
        tables = EpLocationTables.identity(cfg.num_experts, 8)
        # tight capacity: still runs (drops allowed), output finite
        out = moe_forward_ep_dispatch(
            x, logits, w1, w2, cfg, mesh, tables, capacity_factor=0.5
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_eplb_rebalance_no_output_change(self):
        """Redundant experts + a mid-serving rebalance alter
        physical_to_rank but not the MoE output (VERDICT #5 done
        criterion)."""
        from sglang_fluentllm_tpu.parallel.ep_dispatch import (
            EpLocationTables,
            moe_forward_ep_dispatch,
            physical_expert_weights,
        )
        from sglang_fluentllm_tpu.parallel.eplb import rebalance_experts

        E, n = 8, 4
        cfg, x, logits, w1, w2 = self._case(E=E)
        ref = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)
        mesh = mk_mesh(dp=1, tp=n)

        outs = []
        metas = []
        for load_seed in (1, 2):
            load = np.random.RandomState(load_seed).rand(1, E) * 100
            meta = rebalance_experts(load, num_physical=12, num_ranks=n)
            metas.append(meta)
            tables = EpLocationTables.from_metadata(meta, 0, n)
            w1p = physical_expert_weights(w1, meta, 0)
            w2p = physical_expert_weights(w2, meta, 0)
            out = moe_forward_ep_dispatch(
                x, logits, w1p, w2p, cfg, mesh, tables,
                capacity_factor=8.0,
            )
            outs.append(np.asarray(out))
        assert not np.array_equal(
            metas[0].physical_to_rank, metas[1].physical_to_rank
        ) or not np.array_equal(
            metas[0].physical_to_logical, metas[1].physical_to_logical
        )
        np.testing.assert_allclose(outs[0], np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(outs[1], np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestEpDispatchEngine:
    def test_engine_ep_dispatch_and_live_rebalance(self):
        """Engine with --enable-ep-dispatch: outputs equal the dense
        engine; the expert recorder sees traffic; a live EPLB rebalance
        (with redundant experts) changes placement but not greedy
        output (VERDICT #5 done criterion, serving path)."""
        cfg = dict(TINY_DEEPSEEK_CFG)
        cfg["n_routed_experts"] = 8
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19, 2, 9]
        e1 = tiny_engine(cfg)
        ref = e1.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        e2 = tiny_engine(
            cfg, tp_size=4, moe_parallel_strategy="ep",
            enable_ep_dispatch=True, ep_dispatch_capacity_factor=8.0,
            ep_num_redundant_experts=4,
            enable_expert_distribution_recorder=True,
        )
        e2.runner.expert_recorder.start()
        got = e2.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert got == ref
        rec = e2.runner.expert_recorder
        assert rec.counts.sum() > 0
        # per-layer RUNTIME routing tables live in the params pytree
        ml = e2.runner.params["moe_layers"]
        L_moe = ml["w_gate_up"].shape[0]
        assert ml["ep_l2p"].shape[:2] == (L_moe, 8)
        assert ml["w_gate_up"].shape[1] == 12  # physical slots from init
        old_tables = e2.runner.model.ep_tables
        old_step = e2.runner._step  # jit wrapper identity
        meta = e2.runner.rebalance_experts()
        assert meta.num_physical == 12  # 8 + 4 redundant
        assert e2.runner.model.ep_tables is not old_tables
        # VERDICT r2 #8: a rebalance swaps runtime arrays, never retraces
        assert e2.runner._step is old_step
        e2.flush_cache()
        got2 = e2.generate(
            input_ids=prompt, sampling_params=sp
        )["output_ids"]
        assert got2 == ref


class TestDpAttentionEngine:
    """Engine-level DP-attention (VERDICT r2 #3): --attn-tp-size < --tp-size
    builds the (dp_attn, attn_tp) mesh, per-group KV pools + radix trees,
    group-major batches, and DpShardedAttention — full serving path, not a
    hand-built model (reference scheduler.py:1649 prepare_dp_attn_batch)."""

    PROMPTS = [
        [3, 11, 42, 7, 19, 88, 5],
        [9, 1, 2],
        [50, 60, 70, 80, 90],
        [5, 5, 5, 5, 5, 5],
        [100, 3, 42, 77, 8, 1, 9, 24],
    ]
    SP = {"max_new_tokens": 6, "temperature": 0.0}

    def test_engine_dp_attn_matches_single(self):
        e1 = tiny_engine(TINY_LLAMA_CFG)
        refs = [
            e1.generate(input_ids=p, sampling_params=self.SP)["output_ids"]
            for p in self.PROMPTS
        ]
        e2 = tiny_engine(TINY_LLAMA_CFG, tp_size=4, attn_tp_size=2)
        assert e2.runner.dp_attn_size == 2
        from sglang_fluentllm_tpu.parallel.dp_attention import (
            DpShardedAttention,
        )

        assert isinstance(e2.runner.attn_backend, DpShardedAttention)
        assert e2.runner.mesh.devices.shape == (2, 2)
        outs = e2.generate(input_ids=self.PROMPTS, sampling_params=self.SP)
        assert [o["output_ids"] for o in outs] == refs
        # both groups actually held requests
        groups = set(e2.scheduler.allocator._req_group.values())
        assert groups == {0, 1}, groups

    def test_dp_attn_prefix_cache_and_drain(self):
        """Radix reuse stays group-local; allocator accounting balances
        after drain in every group."""
        e = tiny_engine(TINY_LLAMA_CFG, tp_size=4, attn_tp_size=2,
                        max_total_tokens=512)
        outs = e.generate(input_ids=self.PROMPTS, sampling_params=self.SP)
        assert all(len(o["output_ids"]) == 6 for o in outs)
        # repeat the first prompt with a longer suffix -> prefix hit
        long_p = self.PROMPTS[0] + [33, 44, 55]
        out = e.generate(input_ids=long_p, sampling_params=self.SP)
        assert out["meta_info"]["cached_tokens"] > 0
        alloc = e.scheduler.allocator
        for g in range(alloc.n_groups):
            tree = e.scheduler.tree_caches[g]
            assert tree.protected_size == 0
            assert (
                alloc.available_tokens(g) + tree.evictable_size
                <= alloc.num_pages * alloc.page_size
            )

    def test_dp_attn_sampling_rows(self):
        """Per-request sampling params land on the right device rows
        (scatter through the group-major layout): mixed greedy +
        penalties batch."""
        e1 = tiny_engine(TINY_LLAMA_CFG)
        e2 = tiny_engine(TINY_LLAMA_CFG, tp_size=4, attn_tp_size=2)
        sp_pen = {"max_new_tokens": 6, "temperature": 0.0,
                  "repetition_penalty": 1.3}
        prompts = self.PROMPTS[:4]
        sps = [self.SP, sp_pen, self.SP, sp_pen]
        refs = [
            e1.generate(input_ids=p, sampling_params=s)["output_ids"]
            for p, s in zip(prompts, sps)
        ]
        outs = e2.generate(input_ids=prompts, sampling_params=sps)
        assert [o["output_ids"] for o in outs] == refs

    def test_dp_attn_rejects_unsupported(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="DP-attention"):
            tiny_engine(TINY_LLAMA_CFG, tp_size=4, attn_tp_size=2,
                        speculative_algorithm="EAGLE")


class TestGroupedAllocator:
    def test_global_local_roundtrip(self):
        from sglang_fluentllm_tpu.mem.dp_grouped import GroupedKVAllocator

        a = GroupedKVAllocator(8, 4, 16, 256, n_groups=2)
        a.set_group(0, 0)
        a.set_group(1, 1)
        s0 = a.alloc_extend(0, 0, 10)
        s1 = a.alloc_extend(1, 0, 10)
        assert s0 is not None and s1 is not None
        # group 1 slots live past the group stride
        assert (np.asarray(s1) >= a.stride * a.page_size).all()
        p0 = a.req_pages(0, 10)
        p1 = a.req_pages(1, 10)
        assert (p1 >= a.stride).all() and (p0 < a.stride).all()
        # free routes back to the owner group
        before0, before1 = a.available_pages(0), a.available_pages(1)
        a.free_req_pages(1, 10)
        assert a.available_pages(1) == before1 + 3
        assert a.available_pages(0) == before0
        # deferred free-group mixes groups and releases correctly
        a.free_group_begin()
        a.free_req_pages(0, 10)
        deferred = a.free_group_take()
        assert len(deferred) == 3
        a.release_pages(deferred)
        assert a.available_pages(0) == 8
        assert a.available_pages(1) == 8


class TestEpDispatchDefault:
    def test_ep_default_uses_dispatch_tables(self):
        """--moe-parallel-strategy ep alone (no extra flags) installs the
        token-sharded dispatcher tables (VERDICT r2 #5 done criterion)."""
        cfg = dict(TINY_DEEPSEEK_CFG)
        cfg["n_routed_experts"] = 8
        e = tiny_engine(cfg, tp_size=4, moe_parallel_strategy="ep")
        assert e.runner.model.ep_tables is not None
        assert e.runner.model.ep_tables.is_identity
        ml = e.runner.params["moe_layers"]
        assert "ep_l2p" in ml and "ep_n_rep" in ml
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        ref = tiny_engine(cfg).generate(
            input_ids=[3, 11, 42, 7, 19], sampling_params=sp
        )["output_ids"]
        got = e.generate(
            input_ids=[3, 11, 42, 7, 19], sampling_params=sp
        )["output_ids"]
        assert got == ref

    def test_drop_counter_and_autotune(self):
        """Undersized capacity drops assignments; the stats counter sees
        them and suggests a bigger factor."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.config.model_config import ModelConfig
        from sglang_fluentllm_tpu.parallel.ep_dispatch import (
            EpDispatchStats,
            EpLocationTables,
            moe_forward_ep_dispatch,
        )

        cfg = ModelConfig.from_hf_dict(TINY_DEEPSEEK_CFG)
        cfg.num_experts = 8
        E, H, T, n = 8, 64, 64, 4
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        # route EVERY token to expert 0 -> rank 0 overflows a tiny capacity
        logits = jnp.asarray(
            np.tile([10.0] + [0.0] * (E - 1), (T, 1)), jnp.float32
        )
        w1 = jnp.asarray(rng.standard_normal((E, H, 128)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, 64, H)) * 0.1, jnp.float32)
        mesh = mk_mesh(dp=1, tp=n)
        stats = EpDispatchStats(capacity_factor=0.25)
        tables = EpLocationTables.identity(E, n)
        out = moe_forward_ep_dispatch(
            x, logits, w1, w2, cfg, mesh, tables,
            capacity_factor=0.25, stats=stats,
        )
        jax.block_until_ready(out)
        assert stats.dropped > 0
        assert stats.suggest_capacity_factor() > 0.25

    def test_rebalanced_replicated_fallback_matches(self):
        """The tiny-batch replicated fallback consumes PHYSICAL weights +
        runtime tables correctly after a (non-identity) placement."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.config.model_config import ModelConfig
        from sglang_fluentllm_tpu.parallel.ep import moe_forward_ep
        from sglang_fluentllm_tpu.parallel.ep_dispatch import (
            EpLocationTables,
            physical_expert_weights,
        )
        from sglang_fluentllm_tpu.parallel.eplb import rebalance_experts

        cfg = ModelConfig.from_hf_dict(TINY_DEEPSEEK_CFG)
        cfg.num_experts = 8
        E, H, T, n = 8, 64, 12, 4
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((E, H, 128)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((E, 64, H)) * 0.1, jnp.float32)
        ref = moe_forward(x, logits, w1, w2, cfg, use_gmm=False)
        load = np.random.RandomState(1).rand(1, E) * 100
        meta = rebalance_experts(load, num_physical=12, num_ranks=n)
        tables = EpLocationTables.from_metadata(meta, 0, n)
        w1p = physical_expert_weights(w1, meta, 0)
        w2p = physical_expert_weights(w2, meta, 0)
        mesh = mk_mesh(dp=1, tp=n)
        out = moe_forward_ep(
            x, logits, w1p, w2p, cfg, mesh, use_gmm=False, tables=tables
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestDpAttentionMLA:
    def test_engine_dp_attn_mla_matches_single(self):
        """DP-attention over an MLA model (DpShardedMLAAttention): tp=4
        attn_tp=2 greedy == single-device."""
        cfg = dict(TINY_DEEPSEEK_CFG)
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        prompts = [[3, 11, 42, 7, 19], [9, 1, 2, 8], [50, 60, 70]]
        e1 = tiny_engine(cfg)
        refs = [
            e1.generate(input_ids=p, sampling_params=sp)["output_ids"]
            for p in prompts
        ]
        e2 = tiny_engine(cfg, tp_size=4, attn_tp_size=2)
        from sglang_fluentllm_tpu.parallel.dp_attention import (
            DpShardedMLAAttention,
        )

        assert isinstance(e2.runner.attn_backend, DpShardedMLAAttention)
        outs = e2.generate(input_ids=prompts, sampling_params=sp)
        assert [o["output_ids"] for o in outs] == refs


class TestDpRouterWithDpAttention:
    def test_dp_replicas_each_with_attn_groups(self):
        """Request-level DP router composed with token-level DP-attention:
        dp=2 replicas, each tp=4 with attn_tp=2 (two groups per replica)."""
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        prompts = [[3, 11, 42, 7], [9, 1, 2], [50, 60, 70, 80]]
        e1 = tiny_engine(TINY_LLAMA_CFG)
        refs = [
            e1.generate(input_ids=p, sampling_params=sp)["output_ids"]
            for p in prompts
        ]
        e2 = tiny_engine(TINY_LLAMA_CFG, dp_size=2, tp_size=4,
                         attn_tp_size=2)
        for r in e2.scheduler.runners:
            assert r.dp_attn_size == 2
            assert r.mesh.devices.shape == (2, 2)
        outs = e2.generate(input_ids=prompts, sampling_params=sp)
        assert [o["output_ids"] for o in outs] == refs
