"""HttpServerEngineAdapter + named-warmup registry."""

import numpy as np
import pytest

from tests.server_utils import (
    kill_server,
    popen_launch_server,
    write_tiny_tokenizer,
)
from tests.utils import TINY_LLAMA_CFG, write_model_dir


@pytest.fixture(scope="module")
def live_server():
    model_dir = write_model_dir(TINY_LLAMA_CFG)
    write_tiny_tokenizer(model_dir)
    proc, base_url = popen_launch_server(
        model_dir, other_args=["--warmups", "bucket_sweep"]
    )
    yield base_url
    kill_server(proc)


class TestAdapter:
    def test_generate_and_admin_over_http(self, live_server):
        from sglang_fluentllm_tpu.entrypoints.http_server_engine import (
            HttpServerEngineAdapter,
        )

        eng = HttpServerEngineAdapter(
            launch=False, base_url=live_server,
            model_path="/nonexistent-unused",
        )
        out = eng.generate(
            input_ids=[3, 5, 7, 9],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 4
        out2 = eng.generate(
            input_ids=[3, 5, 7, 9],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        )
        assert out["output_ids"] == out2["output_ids"]
        assert eng.flush_cache().get("success", True)

    def test_update_weights_from_tensor_wire_format(self, live_server):
        """The adapter's base64 tensor payload round-trips through the
        server route and actually changes the served weights."""
        from sglang_fluentllm_tpu.entrypoints.http_server_engine import (
            HttpServerEngineAdapter,
        )

        eng = HttpServerEngineAdapter(
            launch=False, base_url=live_server,
            model_path="/nonexistent-unused",
        )
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        before = eng.generate(input_ids=[3, 5, 7, 9],
                              sampling_params=sp)["output_ids"]
        # build a full scaled checkpoint locally with the same seed the
        # server used, then ship it through the adapter
        from tests.test_vs_hf import to_hf_state_dict
        from tests.utils import tiny_engine

        local = tiny_engine()
        import jax

        params = jax.device_get(local.runner.params)
        sd = to_hf_state_dict(params, False)
        named = [(k, np.asarray(
            v.numpy() if hasattr(v, "numpy") else v) * 2.0)
            for k, v in sd.items()]
        r = eng.update_weights_from_tensor(named)
        assert r.get("success"), r
        after = eng.generate(input_ids=[3, 5, 7, 9],
                             sampling_params=sp)["output_ids"]
        assert before != after


class TestWarmupRegistry:
    def test_unknown_name_is_skipped(self):
        import asyncio

        from sglang_fluentllm_tpu.entrypoints.warmup import (
            execute_warmups,
        )

        asyncio.run(execute_warmups(["no_such_warmup"], engine=None))

    def test_registry_has_builtins(self):
        from sglang_fluentllm_tpu.entrypoints.warmup import (
            _warmup_registry,
        )

        assert "bucket_sweep" in _warmup_registry
        assert "long_prefill" in _warmup_registry
