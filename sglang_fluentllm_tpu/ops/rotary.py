"""Rotary position embeddings.

Analog of the reference's ``layers/rotary_embedding.py`` (all RoPE variants:
base, linear/dynamic-NTK, YaRN, llama3, DeepSeek-YaRN). TPU design: the
cos/sin table is precomputed once as a device constant and gathered by the
(padded, static-shape) position tensor inside the jitted step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _base_inv_freq(rotary_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (
        theta ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim)
    )


def _llama3_inv_freq(inv_freq: np.ndarray, scaling: Dict[str, Any]) -> np.ndarray:
    factor = scaling.get("factor", 8.0)
    low_factor = scaling.get("low_freq_factor", 1.0)
    high_factor = scaling.get("high_freq_factor", 4.0)
    old_len = scaling.get("original_max_position_embeddings", 8192)
    low_wavelen = old_len / low_factor
    high_wavelen = old_len / high_factor
    wavelen = 2 * math.pi / inv_freq
    new = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(is_medium, smoothed, new)


def _yarn_find_dim(num_rot: float, dim: int, theta: float, max_pos: int) -> float:
    return (dim * math.log(max_pos / (num_rot * 2 * math.pi))) / (
        2 * math.log(theta)
    )


def _yarn_inv_freq(
    rotary_dim: int, theta: float, scaling: Dict[str, Any]
) -> Tuple[np.ndarray, float]:
    factor = scaling.get("factor", 1.0)
    orig_max = scaling.get("original_max_position_embeddings", 4096)
    beta_fast = scaling.get("beta_fast", 32)
    beta_slow = scaling.get("beta_slow", 1)
    extrap = _base_inv_freq(rotary_dim, theta)
    interp = extrap / factor
    low = max(
        math.floor(_yarn_find_dim(beta_fast, rotary_dim, theta, orig_max)), 0
    )
    high = min(
        math.ceil(_yarn_find_dim(beta_slow, rotary_dim, theta, orig_max)),
        rotary_dim - 1,
    )
    rng = np.clip(
        (np.arange(rotary_dim // 2, dtype=np.float64) - low)
        / max(high - low, 0.001),
        0,
        1,
    )
    mask = 1.0 - rng  # 1 -> extrapolation, 0 -> interpolation
    inv_freq = interp * (1 - mask) + extrap * mask
    # attention scaling (mscale)
    mscale_all_dim = scaling.get("mscale_all_dim", 0.0)
    mscale_cfg = scaling.get("mscale", 1.0)

    def _mscale(scale, m):
        if scale <= 1 or m == 0:
            return 1.0
        return 0.1 * m * math.log(scale) + 1.0

    if mscale_all_dim:
        mscale = _mscale(factor, mscale_cfg) / _mscale(factor, mscale_all_dim)
    else:
        mscale = _mscale(factor, mscale_cfg)
    return inv_freq, mscale


def compute_rope_tables(
    rotary_dim: int,
    max_position: int,
    theta: float,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Returns (cos[max_pos, rot/2], sin[max_pos, rot/2], mscale)."""
    mscale = 1.0
    positions = np.arange(max_position, dtype=np.float64)
    if rope_scaling is None or not rope_scaling:
        inv_freq = _base_inv_freq(rotary_dim, theta)
    else:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        if rtype == "linear":
            inv_freq = _base_inv_freq(rotary_dim, theta)
            positions = positions / rope_scaling.get("factor", 1.0)
        elif rtype == "llama3":
            inv_freq = _llama3_inv_freq(
                _base_inv_freq(rotary_dim, theta), rope_scaling
            )
        elif rtype in ("yarn", "deepseek_yarn"):
            inv_freq, mscale = _yarn_inv_freq(rotary_dim, theta, rope_scaling)
        elif rtype in ("default", "mrope", ""):
            inv_freq = _base_inv_freq(rotary_dim, theta)
        else:
            inv_freq = _base_inv_freq(rotary_dim, theta)
    freqs = np.outer(positions, inv_freq)
    return (
        (np.cos(freqs) * mscale).astype(np.float32),
        (np.sin(freqs) * mscale).astype(np.float32),
        mscale,
    )


def apply_rope(
    x: jax.Array,      # [..., n_heads, rotary_dim] or [..., rotary_dim]
    cos: jax.Array,    # [..., rot/2] gathered by position
    sin: jax.Array,
    interleaved: bool = False,
) -> jax.Array:
    """NeoX-style (half-split) or GPT-J-style (interleaved) rotation."""
    if x.ndim == cos.ndim + 1:
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    if interleaved:
        x1 = x[..., ::2]
        x2 = x[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return jnp.stack([o1, o2], axis=-1).reshape(x.shape).astype(x.dtype)
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


class RotaryEmbedding:
    """Holds the device cos/sin tables; gathered by positions at call time."""

    def __init__(
        self,
        rotary_dim: int,
        max_position: int,
        theta: float,
        rope_scaling: Optional[Dict[str, Any]] = None,
        interleaved: bool = False,
    ):
        cos, sin, mscale = compute_rope_tables(
            rotary_dim, max_position, theta, rope_scaling
        )
        self.cos = jnp.asarray(cos)
        self.sin = jnp.asarray(sin)
        self.mscale = mscale
        self.rotary_dim = rotary_dim
        self.interleaved = interleaved

    def __call__(self, positions: jax.Array, q: jax.Array, k: jax.Array):
        cos = self.cos[positions]
        sin = self.sin[positions]
        if q.shape[-1] > self.rotary_dim:
            q_rot = apply_rope(
                q[..., : self.rotary_dim], cos, sin, self.interleaved
            )
            q = jnp.concatenate([q_rot, q[..., self.rotary_dim:]], axis=-1)
        else:
            q = apply_rope(q, cos, sin, self.interleaved)
        if k.shape[-1] > self.rotary_dim:
            k_rot = apply_rope(
                k[..., : self.rotary_dim], cos, sin, self.interleaved
            )
            k = jnp.concatenate([k_rot, k[..., self.rotary_dim:]], axis=-1)
        else:
            k = apply_rope(k, cos, sin, self.interleaved)
        return q, k
