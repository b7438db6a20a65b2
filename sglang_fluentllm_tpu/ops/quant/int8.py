"""W8A8 INT8 quantization (per-channel weights, per-token activations).

Analog of the reference's INT8 stack (``layers/dense/gemms/int8/``,
``layers/quantization/w8a8_int8.py``). TPU-native compute path: the MXU
multiplies int8 x int8 into an int32 accumulator natively
(``lax.dot_general`` with ``preferred_element_type=int32``) at twice the
bf16 rate, and the per-token/per-channel scales apply in the f32
epilogue — no dequantized weight copy ever materializes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeightInt8:
    """int8 weight [..., K, N] with per-output-channel f32 scales."""

    w8: jax.Array      # [..., K, N] int8
    scale: jax.Array   # [..., N] float32


def quantize_weight_int8(w: np.ndarray) -> QuantizedWeightInt8:
    """Symmetric per-output-channel quantization of the trailing dim."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=-2, keepdims=True)          # [..., 1, N]
    scale = np.maximum(amax / 127.0, 1e-12)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return QuantizedWeightInt8(
        w8=jnp.asarray(q),
        scale=jnp.asarray(scale.squeeze(-2).astype(np.float32)),
    )


def quantize_activation(x: jax.Array):
    """Per-token symmetric int8 quantization ([..., K] rows)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jax.Array, qw: QuantizedWeightInt8) -> jax.Array:
    """W8A8: quantize activations per token, int8 MXU dot, f32 epilogue."""
    xq, xscale = quantize_activation(x)
    acc = jax.lax.dot_general(
        xq, qw.w8,
        dimension_numbers=(((x.ndim - 1,), (qw.w8.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xscale * qw.scale
    return out.astype(x.dtype)
