"""FP8 block-scaled weight quantization + matmul.

Analog of the reference's FP8 stack: ``layers/quantization/fp8.py``
(``Fp8Config:46``) + the DeepGEMM / Triton block GEMMs
(``layers/dense/gemms/fp8/fp8_kernel.py``). Weights are stored
``float8_e4m3fn`` with f32 scales per (BLOCK x BLOCK) tile of the [in, out]
matrix (DeepSeek block-quant layout), halving weight HBM traffic — the
decode-throughput lever.

Two compute paths:
- jnp reference: dequantize + matmul (XLA fuses the scale into the gemm
  epilogue per tile when shapes allow);
- Pallas kernel ``fp8_block_matmul``: accumulates x_tile @ w8_tile per
  k-block and applies the block scale on accumulation (DeepGEMM analog).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FP8_MAX = 448.0
BLOCK = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """fp8 weight [in, out] (+ leading dims) with per-block f32 scales."""

    w8: jax.Array      # [..., K, N] float8_e4m3fn
    scale: jax.Array   # [..., ceil(K/B), ceil(N/B)] float32


def quantize_weight(w: np.ndarray, block: int = BLOCK) -> QuantizedWeight:
    """Per-(block x block) symmetric quantization of the trailing 2 dims."""
    w = np.asarray(w, np.float32)
    *lead, K, N = w.shape
    Kp = -(-K // block) * block
    Np = -(-N // block) * block
    wp = np.zeros((*lead, Kp, Np), np.float32)
    wp[..., :K, :N] = w
    t = wp.reshape(*lead, Kp // block, block, Np // block, block)
    amax = np.abs(t).max(axis=(-3, -1), keepdims=True)
    scale = np.maximum(amax / FP8_MAX, 1e-12)
    q = (t / scale).astype(jnp.float8_e4m3fn)
    q = np.asarray(q).reshape(*lead, Kp, Np)[..., :K, :N]
    return QuantizedWeight(
        w8=jnp.asarray(q),
        scale=jnp.asarray(scale.squeeze(-1).squeeze(-2)),
    )


def dequantize(qw: QuantizedWeight) -> jax.Array:
    """jnp reference dequant to f32."""
    w8 = qw.w8
    *lead, K, N = w8.shape
    B = BLOCK
    Kb, Nb = qw.scale.shape[-2], qw.scale.shape[-1]
    Kp, Np = Kb * B, Nb * B
    wp = jnp.zeros((*lead, Kp, Np), jnp.float32)
    wp = wp.at[..., :K, :N].set(w8.astype(jnp.float32))
    t = wp.reshape(*lead, Kb, B, Nb, B)
    t = t * qw.scale[..., :, None, :, None]
    return t.reshape(*lead, Kp, Np)[..., :K, :N]


def fp8_matmul_ref(x: jax.Array, qw: QuantizedWeight) -> jax.Array:
    """Reference path: dequant + matmul (f32 accumulation)."""
    w = dequantize(qw).astype(x.dtype)
    return x @ w


# ----------------------------------------------------------------------
# Pallas block-dequant matmul (DeepGEMM analog)
# ----------------------------------------------------------------------

def _fp8_mm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    w = w_ref[:].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += part * s_ref[0, 0]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def fp8_block_matmul(
    x: jax.Array,            # [M, K] bf16/f32
    w8: jax.Array,           # [K, N] float8_e4m3fn (K, N multiples of 128)
    scale: jax.Array,        # [K/128, N/128] f32
    block_m: int = 128,
) -> jax.Array:
    M, K = x.shape
    N = w8.shape[1]
    B = BLOCK
    assert K % B == 0 and N % B == 0, "pad weights to 128 multiples"
    Mp = -(-M // block_m) * block_m
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    n_k = K // B
    grid = (Mp // block_m, N // B, n_k)
    out = pl.pallas_call(
        functools.partial(_fp8_mm_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, B), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda m, n, k: (k, n),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, B), lambda m, n, k: (m, n),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N * 2,
            transcendentals=0,
        ),
    )(x, w8, scale)
    return out[:M]


def _kernel_ok(w8: jax.Array) -> bool:
    K, N = w8.shape[-2], w8.shape[-1]
    return K % BLOCK == 0 and N % BLOCK == 0


def matmul(x: jax.Array, w) -> jax.Array:
    """Dispatch: plain array or QuantizedWeight (models call this).

    On TPU, quantized weights go through the Pallas block-dequant GEMM
    (DeepGEMM analog, reference ``layers/dense/gemms/fp8/fp8_kernel.py``)
    so FP8 weights halve HBM traffic in the production forward; the jnp
    dequant path serves CPU tests and non-128-aligned shapes."""
    from sglang_fluentllm_tpu.ops.quant.int4 import (
        QuantizedWeightInt4,
        int4_matmul,
    )
    from sglang_fluentllm_tpu.ops.quant.int8 import (
        QuantizedWeightInt8,
        int8_matmul,
    )

    if isinstance(w, QuantizedWeightInt4):
        return int4_matmul(x, w)
    if isinstance(w, QuantizedWeightInt8):
        return int8_matmul(x, w)
    if isinstance(w, QuantizedWeight):
        if jax.default_backend() == "tpu" and _kernel_ok(w.w8):
            lead = x.shape[:-1]
            K = x.shape[-1]
            x2 = x.reshape(-1, K)
            M = x2.shape[0]
            if M >= 128:
                block_m = 128
            else:
                block_m = max(16, 1 << (M - 1).bit_length())
            out = fp8_block_matmul(x2, w.w8, w.scale, block_m=block_m)
            return out.reshape(*lead, w.w8.shape[-1])
        return fp8_matmul_ref(x, w).astype(x.dtype)
    return x @ w
