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


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
