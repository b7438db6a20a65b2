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
