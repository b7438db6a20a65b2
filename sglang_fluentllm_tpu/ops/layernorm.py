"""RMSNorm ops (analog of reference layers/layernorm.py fused kernels).

On TPU these are plain jnp expressions — XLA fuses the normalization into
neighboring matmuls, which is exactly what the reference's fused CUDA kernels
do by hand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def fused_add_rms_norm(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-6
):
    """Returns (normed(x + residual), x + residual) — reference
    ``layernorm.py`` fused residual-add RMSNorm contract."""
    resid = (x.astype(jnp.float32) + residual.astype(jnp.float32))
    var = jnp.mean(resid * resid, axis=-1, keepdims=True)
    out = resid * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype), resid.astype(x.dtype)
