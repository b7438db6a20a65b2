"""ViT attention (ops/attention/vision.py) vs an explicit per-segment
reference — parity with srt/layers/attention/vision.py semantics."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_fluentllm_tpu.ops.attention.vision import (
    VisionAttention,
    apply_vision_rotary,
    vision_attention,
)


def _ref_attn(q, k, v):
    # q,k,v: [S, H, D] full bidirectional
    S, H, D = q.shape
    out = np.zeros_like(q, dtype=np.float32)
    for h in range(H):
        s = (q[:, h].astype(np.float32) @ k[:, h].astype(np.float32).T) / math.sqrt(D)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[:, h] = p @ v[:, h].astype(np.float32)
    return out


def test_full_attention_matches_reference():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 17, 3, 8
    q, k, v = (rng.standard_normal((B, S, H, D)).astype(np.float32) for _ in range(3))
    got = np.asarray(vision_attention(jnp.array(q), jnp.array(k), jnp.array(v)))
    want = np.stack([_ref_attn(q[b], k[b], v[b]) for b in range(B)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_segment_packing_is_block_diagonal():
    """Packing two images into one row must equal attending each alone."""
    rng = np.random.default_rng(1)
    S1, S2, H, D = 9, 6, 2, 16
    S = S1 + S2 + 3  # 3 padding patches
    q, k, v = (rng.standard_normal((1, S, H, D)).astype(np.float32) for _ in range(3))
    seg = np.zeros((1, S), dtype=np.int32)
    seg[0, :S1] = 1
    seg[0, S1 : S1 + S2] = 2
    packed = np.asarray(
        vision_attention(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(seg))
    )
    a = _ref_attn(q[0, :S1], k[0, :S1], v[0, :S1])
    b = _ref_attn(q[0, S1 : S1 + S2], k[0, S1 : S1 + S2], v[0, S1 : S1 + S2])
    np.testing.assert_allclose(packed[0, :S1], a, atol=1e-5)
    np.testing.assert_allclose(packed[0, S1 : S1 + S2], b, atol=1e-5)
    # padding rows are zeroed
    np.testing.assert_allclose(packed[0, S1 + S2 :], 0.0, atol=0)


def test_vision_rotary_rotates_pairs():
    S, H, D = 5, 2, 8
    x = np.zeros((1, S, H, D), dtype=np.float32)
    x[..., 0] = 1.0  # unit vector in dim 0; pairs are (0, D/2)
    freqs = np.linspace(0, 1.0, S)[:, None] * np.ones((1, D // 2))
    got = np.asarray(apply_vision_rotary(jnp.array(x), jnp.array(freqs)))
    # rotating (1, 0) by theta -> (cos, sin) in the (d, d + D/2) plane
    np.testing.assert_allclose(got[0, :, 0, 0], np.cos(freqs[:, 0]), atol=1e-6)
    np.testing.assert_allclose(got[0, :, 0, D // 2], np.sin(freqs[:, 0]), atol=1e-6)
    # norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.linalg.norm(x, axis=-1), atol=1e-6
    )


def test_vision_rotary_partial_dim_passthrough():
    rng = np.random.default_rng(2)
    S, H, D, RO = 4, 1, 16, 8
    x = rng.standard_normal((S, H, D)).astype(np.float32)
    freqs = rng.standard_normal((S, RO // 2)).astype(np.float32)
    got = np.asarray(apply_vision_rotary(jnp.array(x), jnp.array(freqs)))
    np.testing.assert_allclose(got[..., RO:], x[..., RO:], atol=1e-6)


def test_module_end_to_end_shapes_and_tp_spec():
    rng = np.random.default_rng(3)
    mod = VisionAttention(embed_dim=32, num_heads=4)
    params = {
        k: jnp.array(rng.standard_normal(s).astype(np.float32) * 0.05)
        for k, s in mod.param_shapes().items()
    }
    x = jnp.array(rng.standard_normal((2, 10, 32)).astype(np.float32))
    freqs = jnp.array(rng.standard_normal((10, 4)).astype(np.float32))
    seg = jnp.ones((2, 10), dtype=jnp.int32)
    out = mod(params, x, rotary_freqs=freqs, segment_ids=seg)
    assert out.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(out)).all()
    spec = mod.sharding_spec()
    assert set(spec) == set(mod.param_shapes())
    assert spec["qkv_proj"] == __import__("jax").sharding.PartitionSpec(None, "tp")


def test_module_packing_invariance():
    """The module output for image A is identical whether A is packed with B
    or padded alone — the property the reference's mask cache guarantees."""
    rng = np.random.default_rng(4)
    mod = VisionAttention(embed_dim=16, num_heads=2)
    params = {
        k: jnp.array(rng.standard_normal(s).astype(np.float32) * 0.1)
        for k, s in mod.param_shapes().items()
    }
    SA, SB = 6, 4
    xa = rng.standard_normal((1, SA, 16)).astype(np.float32)
    xb = rng.standard_normal((1, SB, 16)).astype(np.float32)
    packed_x = jnp.array(np.concatenate([xa, xb], axis=1))
    seg = jnp.array([[1] * SA + [2] * SB], dtype=jnp.int32)
    packed = mod(params, packed_x, segment_ids=seg)
    alone = mod(params, jnp.array(xa), segment_ids=jnp.ones((1, SA), jnp.int32))
    np.testing.assert_allclose(
        np.asarray(packed[0, :SA]), np.asarray(alone[0]), atol=1e-5
    )
