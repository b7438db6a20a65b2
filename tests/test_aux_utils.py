"""func_timer, slow-host detector, and CPU weight offload."""

import numpy as np


class TestFuncTimer:
    def test_sync_and_async(self):
        import asyncio

        from prometheus_client import generate_latest

        from sglang_fluentllm_tpu.metrics.collector import REGISTRY
        from sglang_fluentllm_tpu.metrics.func_timer import time_func

        @time_func
        def add(a, b):
            return a + b

        @time_func(name="custom")
        async def mul(a, b):
            return a * b

        assert add(2, 3) == 5
        assert asyncio.run(mul(2, 3)) == 6
        text = generate_latest(REGISTRY).decode()
        assert "func_latency_seconds" in text
        assert 'name="custom"' in text
        assert "add" in text

    def test_exceptions_still_recorded(self):
        import pytest

        from sglang_fluentllm_tpu.metrics.func_timer import (
            _get_histogram,
            time_func,
        )

        @time_func(name="boom")
        def boom():
            raise ValueError("x")

        with pytest.raises(ValueError):
            boom()
        h = _get_histogram().labels(name="boom")
        assert h._sum.get() >= 0


class TestSlowHostDetector:
    def test_single_process(self):
        from sglang_fluentllm_tpu.utils.slow_host_detector import execute

        times = execute()
        assert len(times) == 1 and times[0] > 0


class TestOffloader:
    def test_offloads_largest_first(self):
        import jax
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.runtime.offloader import (
            _MIN_OFFLOAD_BYTES,
            offload_params,
        )

        big = jnp.ones((4096, 4096), jnp.float32)        # 64 MiB
        assert big.nbytes >= _MIN_OFFLOAD_BYTES
        small = jnp.ones((8,), jnp.float32)
        params = {"embed": big, "norm": small}
        shardings = jax.tree.map(lambda x: x.sharding, params)
        out, moved, mask = offload_params(
            params, shardings, budget_gb=0.05)
        assert moved == big.nbytes
        assert out["embed"].sharding.memory_kind == "pinned_host"
        assert out["norm"].sharding.memory_kind != "pinned_host"
        assert mask == {"embed": True, "norm": False}
        # jit consumes host-resident weights via the in-jit onramp
        from sglang_fluentllm_tpu.runtime.offloader import onramp_params

        def f(p, x):
            p = onramp_params(p, mask)
            return x @ p["embed"] + p["norm"][0]

        y = jax.jit(f)(out, jnp.ones((2, 4096), jnp.float32))
        np.testing.assert_allclose(np.asarray(y)[0, 0], 4097.0)

    def test_zero_budget_noop(self):
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.runtime.offloader import offload_params

        params = {"w": jnp.ones((4, 4))}
        out, moved, mask = offload_params(params, None, 0.0)
        assert moved == 0 and out is params and mask is None

    def test_engine_cpu_offload_serves(self):
        """--cpu-offload-gb end-to-end: tiny budget offloads nothing
        big enough, engine still generates deterministically."""
        from tests.utils import tiny_engine

        import jax.numpy as jnp

        import sglang_fluentllm_tpu.runtime.offloader as off

        # drop the size floor so the tiny model's embed actually moves
        orig = off._MIN_OFFLOAD_BYTES
        off._MIN_OFFLOAD_BYTES = 1 << 10
        try:
            e = tiny_engine(cpu_offload_gb=0.001)
        finally:
            off._MIN_OFFLOAD_BYTES = orig
        assert e.runner._offload_mask is not None
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        a = e.generate(input_ids=[3, 5, 7], sampling_params=sp)
        b = e.generate(input_ids=[3, 5, 7], sampling_params=sp)
        assert a["output_ids"] == b["output_ids"]


class TestThinkingBudget:
    def test_forces_think_end_at_budget(self):
        """After thinking_budget generated tokens the engine emits the
        think-end token in-jit (reference apply_thinking_budgets)."""
        from tests.utils import tiny_engine

        e = tiny_engine()
        END = 99
        out = e.generate(
            input_ids=[3, 5, 7, 11],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "thinking_budget": 3, "think_end_id": END},
        )
        ids = out["output_ids"]
        assert len(ids) == 8
        assert ids[3] == END, ids
        # baseline without a budget differs at that position (dummy
        # weights never greedily pick 99 four steps in a row)
        base = e.generate(
            input_ids=[3, 5, 7, 11],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        )["output_ids"]
        assert base[:3] == ids[:3]

    def test_natural_close_deactivates(self):
        """A row that emits think_end naturally before the budget is
        never force-truncated (in-window deactivation in the fused
        decode scan)."""
        from tests.utils import tiny_engine

        e = tiny_engine()
        base = e.generate(
            input_ids=[3, 5, 7, 11],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        )["output_ids"]
        # think-end = the token the model emits naturally at step 1;
        # budget would otherwise force it again at step 5
        out = e.generate(
            input_ids=[3, 5, 7, 11],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "thinking_budget": 4,
                             "think_end_id": int(base[0])},
        )
        assert out["output_ids"] == base

    def test_invalid_budget_rejected(self):
        import pytest

        from sglang_fluentllm_tpu.sched.sampling_params import (
            SamplingParams,
        )

        with pytest.raises(ValueError):
            SamplingParams(thinking_budget=0)


from sglang_fluentllm_tpu.sched.custom_logit_processor import (  # noqa: E402
    CustomLogitProcessor,
)


class BoostProcessor(CustomLogitProcessor):
    def __call__(self, logits, custom_param_list=None):
        import numpy as np

        out = np.asarray(logits).copy()
        p = (custom_param_list or [{}])[0]
        out[:, int(p.get("token_id", 0))] += float(p.get("boost", 0.0))
        return out


class TestCustomLogitProcessor:
    def test_serialization_roundtrip(self):
        s = BoostProcessor().to_str()
        proc = CustomLogitProcessor.from_str(s)
        import numpy as np

        lg = np.zeros((1, 8), np.float32)
        out = proc(lg, [{"token_id": 3, "boost": 5.0}])
        assert out[0, 3] == 5.0 and out[0, 0] == 0.0

    def test_requires_enable_flag(self):
        import pytest

        from tests.utils import tiny_engine

        e = tiny_engine()
        with pytest.raises(ValueError, match="enable-custom"):
            e.generate(
                input_ids=[3, 5, 7],
                sampling_params={
                    "max_new_tokens": 2,
                    "custom_logit_processor": BoostProcessor().to_str(),
                },
            )

    def test_processor_steers_sampling(self):
        """A +1e9 boost on one token makes greedy pick it every step."""
        from tests.utils import tiny_engine

        e = tiny_engine(enable_custom_logit_processor=True)
        out = e.generate(
            input_ids=[3, 5, 7],
            sampling_params={
                "max_new_tokens": 4, "temperature": 0.0,
                "custom_logit_processor": BoostProcessor().to_str(),
                "custom_params": {"token_id": 42, "boost": 1e9},
            },
        )
        assert out["output_ids"] == [42, 42, 42, 42]
        # and without it, a different greedy path
        base = e.generate(
            input_ids=[3, 5, 7],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        )
        assert base["output_ids"] != [42, 42, 42, 42]


class TestSaveShardedModel:
    def test_roundtrip_native_checkpoint(self, tmp_path):
        """collective_rpc('save_sharded_model') writes shards that
        --load-format native restores bit-for-bit (greedy parity)."""
        from tests.utils import TINY_LLAMA_CFG, tiny_engine, write_model_dir

        e = tiny_engine()
        sp = {"max_new_tokens": 5, "temperature": 0.0}
        ref = e.generate(input_ids=[3, 9, 27], sampling_params=sp)
        out_dir = str(tmp_path / "ckpt")
        r = e.collective_rpc("save_sharded_model", path=out_dir,
                             max_shard_gb=0.0001)
        assert r["tensors"] > 0 and r["shards"] >= 1
        # config must sit next to the shards for a fresh engine
        import json
        import os

        with open(os.path.join(out_dir, "config.json"), "w") as fp:
            json.dump(TINY_LLAMA_CFG, fp)
        e2 = tiny_engine(model_path_override=out_dir,
                         load_format="native")
        out = e2.generate(input_ids=[3, 9, 27], sampling_params=sp)
        assert out["output_ids"] == ref["output_ids"]

    def test_unknown_rpc_rejected(self):
        import pytest

        from tests.utils import tiny_engine

        e = tiny_engine()
        with pytest.raises(AttributeError):
            e.collective_rpc("no_such_method")
