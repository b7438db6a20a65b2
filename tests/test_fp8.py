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


class TestInt8W8A8:
    """W8A8 INT8 path (reference layers/dense/gemms/int8 +
    w8a8_int8.py)."""

    def test_weight_roundtrip_accuracy(self):
        from sglang_fluentllm_tpu.ops.quant.int8 import (
            quantize_weight_int8,
        )

        rng = np.random.RandomState(0)
        w = rng.standard_normal((64, 96)).astype(np.float32)
        qw = quantize_weight_int8(w)
        deq = np.asarray(qw.w8, np.float32) * np.asarray(qw.scale)[None, :]
        rel = np.abs(deq - w).max() / np.abs(w).max()
        assert rel < 0.01  # per-channel int8: <1% peak error

    def test_matmul_close_to_f32(self):
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.ops.quant.int8 import (
            int8_matmul,
            quantize_weight_int8,
        )

        rng = np.random.RandomState(1)
        x = rng.standard_normal((8, 64)).astype(np.float32)
        w = rng.standard_normal((64, 96)).astype(np.float32)
        qw = quantize_weight_int8(w)
        got = np.asarray(int8_matmul(jnp.asarray(x), qw))
        ref = x @ w
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.03

    def test_engine_w8a8_generates(self):
        from tests.utils import tiny_engine

        e = tiny_engine(quantization="w8a8_int8")
        out = e.generate(
            input_ids=[3, 11, 42, 7, 19],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 5
        out2 = e.generate(
            input_ids=[3, 11, 42, 7, 19],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )
        assert out["output_ids"] == out2["output_ids"]

    def test_w8a8_output_close_to_unquantized(self):
        from tests.utils import tiny_engine

        sp = {"max_new_tokens": 8, "temperature": 0.0,
              "return_logprob": True}
        e1 = tiny_engine()
        o1 = e1.generate(input_ids=[3, 11, 42, 7, 19], sampling_params=sp)
        e2 = tiny_engine(quantization="w8a8_int8")
        o2 = e2.generate(input_ids=[3, 11, 42, 7, 19], sampling_params=sp)
        # int8 is near-lossless at tiny scales: greedy tokens match
        assert o1["output_ids"] == o2["output_ids"]


class TestInt4W4A16:
    """Weight-only INT4 path (VERDICT r3 #6; reference
    compressed-tensors pack-quantized w4a16 / GPTQ-class): nibble
    packing, per-group dequant, Pallas kernel parity, engine e2e."""

    def test_pack_unpack_roundtrip_exact(self):
        from sglang_fluentllm_tpu.ops.quant.int4 import (
            _unpack_nibbles,
            quantize_weight_int4,
        )

        rng = np.random.RandomState(0)
        w = rng.standard_normal((256, 96)).astype(np.float32)
        qw = quantize_weight_int4(w)
        assert qw.w4.shape == (128, 96)
        assert qw.scale.shape == (2, 96)
        # unpack reproduces the exact int4 code for every element
        g = np.asarray(qw.w4).reshape(2, 64, 96)
        import jax.numpy as jnp

        codes = np.asarray(_unpack_nibbles(jnp.asarray(g)))
        assert codes.min() >= -8 and codes.max() <= 7
        deq = codes.astype(np.float32) * np.asarray(qw.scale)[:, None, :]
        deq = deq.reshape(256, 96)
        # per-group symmetric int4: error bounded by scale/2
        bound = np.repeat(np.asarray(qw.scale), 128, axis=0) / 2 + 1e-6
        assert (np.abs(deq - w) <= bound).all()

    def test_dequant_matches_matmul_ref(self):
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.ops.quant.int4 import (
            dequantize_int4,
            int4_matmul_ref,
            quantize_weight_int4,
        )

        rng = np.random.RandomState(1)
        w = rng.standard_normal((200, 96)).astype(np.float32)  # unaligned K
        x = rng.standard_normal((8, 200)).astype(np.float32)
        qw = quantize_weight_int4(w)
        assert qw.k == 200
        deq = np.asarray(dequantize_int4(qw))
        assert deq.shape == (200, 96)
        got = np.asarray(int4_matmul_ref(jnp.asarray(x), qw))
        np.testing.assert_allclose(got, x @ deq, rtol=2e-4, atol=2e-4)
        # quantization error vs the f32 weights stays bounded (int4 on
        # N(0,1) weights: ~0.14 peak relative over a 200-deep reduction)
        ref = x @ w
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.2

    def test_kernel_matches_ref(self):
        """Pallas dequant GEMM == jnp reference (interpret mode on CPU)."""
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu

        from sglang_fluentllm_tpu.ops.quant.int4 import (
            int4_block_matmul,
            int4_matmul_ref,
            quantize_weight_int4,
        )

        rng = np.random.RandomState(2)
        K, N, M = 256, 256, 24
        w = rng.standard_normal((K, N)).astype(np.float32)
        x = rng.standard_normal((M, K)).astype(np.float32)
        qw = quantize_weight_int4(w)
        ref = np.asarray(int4_matmul_ref(jnp.asarray(x), qw))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(int4_block_matmul(
                jnp.asarray(x), qw.w4, qw.scale, block_m=16, block_n=256))
        # kernel runs bf16 operands with f32 accumulation; the reference
        # dequants to f32 — differences are bf16 rounding only
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-1)

    def test_stacked_layer_slices(self):
        """Stacked [L, K, N] weights quantize with leading dims and scan
        slices stay kernel-shaped."""
        import jax

        from sglang_fluentllm_tpu.ops.quant.int4 import (
            QuantizedWeightInt4,
            quantize_weight_int4,
        )

        rng = np.random.RandomState(3)
        w = rng.standard_normal((3, 128, 64)).astype(np.float32)
        qw = quantize_weight_int4(w)
        assert qw.w4.shape == (3, 64, 64)
        leaves, treedef = jax.tree.flatten(qw)
        sl = jax.tree.unflatten(treedef, [x[1] for x in leaves])
        assert isinstance(sl, QuantizedWeightInt4)
        assert sl.w4.shape == (64, 64) and sl.k == 128

    def test_engine_w4a16_generates(self):
        from tests.utils import tiny_engine

        sp = {"max_new_tokens": 6, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19]
        base = tiny_engine().generate(
            input_ids=prompt, sampling_params=sp)["output_ids"]
        e = tiny_engine(quantization="w4a16")
        from sglang_fluentllm_tpu.ops.quant.int4 import QuantizedWeightInt4

        assert isinstance(
            e.runner.params["layers"]["q_proj"], QuantizedWeightInt4)
        out = e.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert len(out) == 6
        out2 = e.generate(input_ids=prompt,
                          sampling_params=sp)["output_ids"]
        assert out == out2
        # int4 weight-only agrees with bf16 on the first greedy token
        assert out[0] == base[0]
