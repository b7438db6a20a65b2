"""Double-sparsity sparse decode (reference
triton_ops/double_sparsity_attention.py + double_sparsity_backend.py):
heavy-channel approximate scores -> top-k token selection -> exact
attention over the selected set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.utils import TINY_LLAMA_CFG, tiny_engine


class TestDsOp:
    def _case(self, B=2, T=64, Hq=4, Hk=2, D=16, seed=0):
        r = np.random.RandomState(seed)
        q = jnp.asarray(r.standard_normal((B, Hq, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, T, Hk, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, T, Hk, D)), jnp.float32)
        seq = jnp.asarray([T, T - 10], jnp.int32)
        return q, k, v, seq

    def _dense(self, q, k, v, seq, scale):
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            mha_attend,
        )

        B = q.shape[0]
        return mha_attend(
            q[:, None], k, v, seq, jnp.ones((B,), jnp.int32), scale
        )[:, 0]

    def test_full_topk_equals_dense(self):
        """k_top >= seq: selection keeps every valid token -> exact."""
        from sglang_fluentllm_tpu.ops.attention.double_sparsity import (
            ds_decode_attend,
        )

        q, k, v, seq = self._case()
        heavy = jnp.tile(jnp.arange(16, dtype=jnp.int32), (2, 1))
        out = ds_decode_attend(q, k, v, seq, heavy, k_top=64,
                               sm_scale=0.25)
        ref = self._dense(q, k, v, seq, 0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_sparse_approximates_dense(self):
        """With all channels as labels, the approx scores are EXACT, so
        top-k keeps the softmax mass leaders: small error vs dense."""
        from sglang_fluentllm_tpu.ops.attention.double_sparsity import (
            ds_decode_attend,
        )

        q, k, v, seq = self._case(seed=3)
        heavy = jnp.tile(jnp.arange(16, dtype=jnp.int32), (2, 1))
        out = ds_decode_attend(q, k, v, seq, heavy, k_top=32,
                               sm_scale=0.25)
        ref = self._dense(q, k, v, seq, 0.25)
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 0.15, err

    def test_newest_token_always_selected(self):
        from sglang_fluentllm_tpu.ops.attention.double_sparsity import (
            ds_decode_attend,
        )

        q, k, v, seq = self._case(seed=5)
        # adversarial labels (single channel): still must include newest
        heavy = jnp.zeros((2, 1), jnp.int32)
        out = ds_decode_attend(q, k, v, seq, heavy, k_top=4,
                               sm_scale=0.25)
        assert np.isfinite(np.asarray(out)).all()


class TestDsEngine:
    def test_engine_double_sparsity_runs(self):
        """--enable-double-sparsity serves; short sequences (below the
        threshold) match the dense engine exactly."""
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19, 88, 5]
        ref = tiny_engine(TINY_LLAMA_CFG).generate(
            input_ids=prompt, sampling_params=sp
        )["output_ids"]
        e = tiny_engine(TINY_LLAMA_CFG, enable_double_sparsity=True,
                        ds_sparse_decode_threshold=64,
                        ds_heavy_channel_num=8, ds_heavy_token_num=32)
        from sglang_fluentllm_tpu.ops.attention.double_sparsity import (
            DoubleSparsityBackend,
        )

        assert isinstance(e.runner.attn_backend, DoubleSparsityBackend)
        got = e.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert got == ref  # below threshold -> dense path

    def test_engine_sparse_path_generates(self):
        """Past the threshold the sparse decode path actually runs."""
        e = tiny_engine(TINY_LLAMA_CFG, enable_double_sparsity=True,
                        ds_sparse_decode_threshold=8,
                        ds_heavy_channel_num=16, ds_heavy_token_num=16,
                        max_total_tokens=2048)
        prompt = list(range(1, 65))
        out = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 8
