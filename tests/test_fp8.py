"""FP8 block-quantized weight tests (reference test_block_fp8.py analog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sglang_fluentllm_tpu.ops.quant.fp8 import (
    QuantizedWeight,
    dequantize,
    fp8_block_matmul,
    fp8_matmul_ref,
    matmul,
    quantize_weight,
)


class TestQuantize:
    def test_roundtrip_error(self):
        rng = np.random.RandomState(0)
        w = rng.standard_normal((256, 384)).astype(np.float32)
        qw = quantize_weight(w)
        assert qw.w8.dtype == jnp.float8_e4m3fn
        assert qw.scale.shape == (2, 3)
        deq = np.asarray(dequantize(qw))
        rel = np.abs(deq - w) / (np.abs(w) + 1e-6)
        assert np.median(rel) < 0.04  # e4m3 ~2 mantissa bits

    def test_unaligned_shapes(self):
        rng = np.random.RandomState(1)
        w = rng.standard_normal((100, 200)).astype(np.float32)
        qw = quantize_weight(w)
        deq = np.asarray(dequantize(qw))
        assert deq.shape == w.shape
        assert np.median(np.abs(deq - w) / (np.abs(w) + 1e-6)) < 0.04

    def test_block_scales_adapt(self):
        """Blocks with very different magnitudes keep relative accuracy."""
        w = np.ones((256, 256), np.float32)
        w[:128, :128] *= 1000.0
        w[128:, 128:] *= 0.001
        qw = quantize_weight(w)
        deq = np.asarray(dequantize(qw))
        np.testing.assert_allclose(deq, w, rtol=0.1)

    def test_matmul_ref_close(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        w = rng.standard_normal((256, 128)).astype(np.float32)
        exact = np.asarray(x) @ w
        got = np.asarray(fp8_matmul_ref(x, quantize_weight(w)))
        rel = np.abs(got - exact) / (np.abs(exact) + 1e-3)
        assert np.median(rel) < 0.05

    def test_matmul_dispatch(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(matmul(x, w)), np.asarray(x @ w), rtol=1e-5
        )
        q = matmul(x, quantize_weight(np.asarray(w)))
        assert q.shape == (4, 128)


class TestPallasKernel:
    def test_kernel_matches_ref(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.standard_normal((64, 256)), jnp.bfloat16)
        w = rng.standard_normal((256, 256)).astype(np.float32)
        qw = quantize_weight(w)
        ref = np.asarray(fp8_matmul_ref(x, qw), np.float32)
        with pltpu.force_tpu_interpret_mode():
            out = fp8_block_matmul(x, qw.w8, qw.scale)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), ref, rtol=0.1, atol=0.5
        )

    def test_kernel_unaligned_m(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.standard_normal((37, 128)), jnp.bfloat16)
        w = rng.standard_normal((128, 128)).astype(np.float32)
        qw = quantize_weight(w)
        ref = np.asarray(fp8_matmul_ref(x, qw), np.float32)
        with pltpu.force_tpu_interpret_mode():
            out = fp8_block_matmul(x, qw.w8, qw.scale)
        assert out.shape == (37, 128)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), ref, rtol=0.1, atol=0.5
        )


class TestFp8Engine:
    def test_fp8_engine_generates(self):
        from tests.utils import tiny_engine

        sp = {"max_new_tokens": 6, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19]
        base = tiny_engine().generate(
            input_ids=prompt, sampling_params=sp)["output_ids"]
        e = tiny_engine(quantization="fp8")
        # weights really are quantized
        from sglang_fluentllm_tpu.ops.quant.fp8 import QuantizedWeight

        assert isinstance(
            e.runner.params["layers"]["q_proj"], QuantizedWeight)
        out = e.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert len(out) == 6
        # fp8 weight-only should agree with bf16 on the first greedy token
        assert out[0] == base[0]
