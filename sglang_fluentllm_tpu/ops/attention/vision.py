"""ViT / vision-encoder attention — cache-free bidirectional attention.

Parity target: reference ``srt/layers/attention/vision.py`` (VisionAttention,
VisionSdpaAttention, VisionTritonAttention, apply_rotary_pos_emb_vision).

TPU-first design decisions (vs the reference's CUDA path):
- The reference keeps two inner backends (a Triton varlen prefill kernel and
  an SDPA path with a python-built block-diagonal mask from ``cu_seqlens``).
  On TPU a single XLA einsum-softmax-einsum chain is already MXU-bound for
  ViT shapes (S ~ 1k-16k patches, D=64..128); the mask is built from
  *segment ids* with a vectorized compare, never a python loop, so the whole
  thing stays inside one jit with static shapes.
- Variable-length image packing ("flatten_batch" / ``cu_seqlens`` in the
  reference) is expressed as a ``[B, S]`` int32 segment-id tensor: patches of
  the same image share an id, padding is id 0. Block-diagonal masking falls
  out of ``seg[i] == seg[j] & seg > 0`` — identical semantics to the
  reference's ``mask[..., start:end, start:end] = True`` loop
  (vision.py:239-258) with no host-side mask construction or lru_cache.
- softmax runs in f32 always (the reference's use_full_precision_softmax
  flag exists because fp16 softmax overflows; on TPU the VPU f32 softmax is
  free relative to the MXU matmuls, so we do not ship the half-precision
  footgun at all).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# rotary for vision towers (2D rope: freqs precomputed per patch position)
# ---------------------------------------------------------------------------
def rotate_half(x: jnp.ndarray, interleaved: bool = False) -> jnp.ndarray:
    """Reference vision.py:24-31 semantics."""
    if not interleaved:
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)
    x1, x2 = x[..., ::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_vision_rotary(
    x: jnp.ndarray,
    freqs: jnp.ndarray,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Apply rotary embedding to the leading ``rotary_dim`` of each head.

    x: [..., S, H, D]; freqs: [S, rotary_dim/2] (radians per position) or
    broadcastable [..., S, rotary_dim/2]. Matches reference
    ``apply_rotary_pos_emb_vision`` (vision.py:59-64): compute in f32, cast
    back to the input dtype.
    """
    xf = x.astype(jnp.float32)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    if interleaved:
        cos = jnp.repeat(cos, 2, axis=-1)
        sin = jnp.repeat(sin, 2, axis=-1)
    else:
        cos = jnp.concatenate([cos, cos], axis=-1)
        sin = jnp.concatenate([sin, sin], axis=-1)
    # broadcast over the head axis: [S, d] -> [S, 1, d]
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    ro = cos.shape[-1]
    rot = xf[..., :ro] * cos + rotate_half(xf[..., :ro], interleaved) * sin
    return jnp.concatenate([rot, xf[..., ro:]], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# core attention
# ---------------------------------------------------------------------------
def vision_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray] = None,
    *,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Bidirectional full attention for vision towers.

    q/k/v: [B, S, H, D]. segment_ids: optional [B, S] int32; tokens attend
    only within their own segment, id 0 is padding (attends nowhere, output
    zeroed). Returns [B, S, H, D] in q.dtype.

    Equivalent to reference VisionSdpaAttention.forward with
    flatten_batch=True masks (vision.py:280-320) and to the Triton varlen
    path (VisionTritonAttention, vision.py:323-360), unified.
    """
    B, S, H, D = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(D)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if segment_ids is not None:
        seg = segment_ids
        ok = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] > 0)
        scores = jnp.where(ok[:, None, :, :], scores, _NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    if segment_ids is not None:
        # padding queries (seg==0) saw an all-masked row -> uniform softmax;
        # zero them so downstream sums over padding are exact.
        p = p * (segment_ids[:, None, :, None] > 0)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# the module: qkv + out projections around the core, TP over heads
# ---------------------------------------------------------------------------
class VisionAttention:
    """Functional VisionAttention block (reference vision.py:67-252).

    Parameters are a flat pytree (``param_shapes``); ``sharding_spec`` gives
    the tensor-parallel layout: qkv column-parallel over heads, out_proj
    row-parallel — the analog of the reference's
    QKVParallelLinear/RowParallelLinear split (vision.py:110-139).
    """

    def __init__(
        self,
        embed_dim: int,
        num_heads: int,
        projection_size: Optional[int] = None,
        qkv_bias: bool = True,
        proj_bias: bool = True,
    ):
        projection_size = projection_size or embed_dim
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = projection_size // num_heads
        self.qkv_bias = qkv_bias
        self.proj_bias = proj_bias

    def param_shapes(self) -> Dict[str, Any]:
        E, Hp = self.embed_dim, self.num_heads * self.head_dim
        shapes = {
            "qkv_proj": (E, 3 * Hp),
            "out_proj": (Hp, E),
        }
        if self.qkv_bias:
            shapes["qkv_bias"] = (3 * Hp,)
        if self.proj_bias:
            shapes["out_bias"] = (E,)
        return shapes

    def sharding_spec(self) -> Dict[str, P]:
        spec = {
            "qkv_proj": P(None, "tp"),
            "out_proj": P("tp", None),
        }
        if self.qkv_bias:
            spec["qkv_bias"] = P("tp")
        if self.proj_bias:
            spec["out_bias"] = P(None)
        return spec

    def __call__(
        self,
        params: Dict[str, jnp.ndarray],
        x: jnp.ndarray,
        *,
        rotary_freqs: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, S, E] -> [B, S, E]."""
        B, S, _ = x.shape
        H, D = self.num_heads, self.head_dim
        qkv = x @ params["qkv_proj"]
        if self.qkv_bias:
            qkv = qkv + params["qkv_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, H, D)
        v = v.reshape(B, S, H, D)
        if rotary_freqs is not None:
            q = apply_vision_rotary(q, rotary_freqs)
            k = apply_vision_rotary(k, rotary_freqs)
        o = vision_attention(q, k, v, segment_ids)
        o = o.reshape(B, S, H * D) @ params["out_proj"]
        if self.proj_bias:
            o = o + params["out_bias"]
        return o
