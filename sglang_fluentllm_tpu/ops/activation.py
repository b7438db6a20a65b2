"""Activation ops (analog of reference layers/activation.py SiluAndMul)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(x: jax.Array) -> jax.Array:
    """Input [..., 2*d] = concat(gate, up); returns silu(gate) * up."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(x: jax.Array) -> jax.Array:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=True) * up


ACT2FN = {
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}
