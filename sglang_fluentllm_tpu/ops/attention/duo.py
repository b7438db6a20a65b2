"""DuoAttention — retrieval heads keep full KV, streaming heads keep
attention sinks + a recent window.

Reference: ``srt/layers/attention/duo_attn_backend.py`` (+
``duo_attn_triton.py``): per-(layer, kv-head) scores thresholded at the
``sparsity`` quantile decide which heads are RETRIEVAL (full causal
attention) vs STREAMING (first ``sink_size`` tokens + last
``recent_size`` tokens). This backend computes both patterns over the
dense gathered context and selects per kv head — correctness-first; the
memory win (dropping streaming heads' mid-range KV) rides on the same
mask once the pools split.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


def duo_head_mask(head_scores: np.ndarray, sparsity: float) -> np.ndarray:
    """[L, Hk] bool full-attention mask from scores (reference
    ``duo_attn_backend.py:128``: score >= quantile(sparsity))."""
    thresh = np.quantile(head_scores, sparsity)
    return head_scores >= thresh


def duo_attend(
    q: jax.Array,          # [B, S, Hq, D]
    k: jax.Array,          # [B, T, Hk, D]
    v: jax.Array,          # [B, T, Hk, D]
    q_pos: jax.Array,      # [B, S]
    seq_lens: jax.Array,   # [B]
    full_heads: jax.Array,  # [Hk] bool (this layer's mask)
    sink: int,
    recent: int,
    sm_scale: float,
) -> jax.Array:
    B, S, Hq, D = q.shape
    T, Hk = k.shape[1], k.shape[2]
    G = Hq // Hk
    t_ids = jnp.arange(T)
    valid = t_ids[None, :] < seq_lens[:, None]            # [B, T]
    causal = t_ids[None, None, :] <= q_pos[:, :, None]    # [B, S, T]
    stream = (t_ids[None, None, :] < sink) | (
        t_ids[None, None, :] > q_pos[:, :, None] - recent)
    base = causal & valid[:, None, :]
    # per-kv-head mask: [B, Hk, S, T]
    mask = jnp.where(
        full_heads[None, :, None, None],
        base[:, None],
        (base & stream)[:, None],
    )
    qg = q.reshape(B, S, Hk, G, D)
    s = jnp.einsum(
        "bshgd,bthd->bhgst", qg.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * sm_scale
    s = jnp.where(mask[:, :, None], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(mask[:, :, None], -1, keepdims=True), p, 0.0)
    o = jnp.einsum("bhgst,bthd->bshgd", p, v.astype(jnp.float32))
    return o.reshape(B, S, Hq, D).astype(q.dtype)


class DuoAttentionBackend:
    """Backend for models served with ``duo_attention_config`` in their
    HF config: {"sink_size", "recent_size", "sparsity", "head_scores"
    ([L, Hk]) or none (all heads full)}."""

    name = "duo"

    def __init__(self, config):
        hf = config.hf_config
        duo = hf.get("duo_attention_config") or {}
        self.sink = int(duo.get("sink_size", 128))
        self.recent = int(duo.get("recent_size", 256))
        L = config.num_hidden_layers
        Hk = config.num_key_value_heads
        scores = duo.get("head_scores")
        if scores is None:
            mask = np.ones((L, Hk), bool)
        else:
            mask = duo_head_mask(
                np.asarray(scores, np.float32),
                float(duo.get("sparsity", 0.5)),
            )
        self.full_heads = jnp.asarray(mask)

    def __call__(self, kv_cache, layer_id, q, k_new, v_new, batch,
                 sm_scale, **kw):
        from sglang_fluentllm_tpu.mem.kv_cache import mha_write
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            page_gather_mha,
        )

        B, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B * S, Hk, D), v_new.reshape(B * S, Hk, D),
        )
        k = page_gather_mha(
            kv_cache.k[layer_id], batch.page_tables, batch.page_size
        )[..., :D]
        v = page_gather_mha(
            kv_cache.v[layer_id], batch.page_tables, batch.page_size
        )[..., :D]
        out = duo_attend(
            q, k, v, batch.positions, batch.seq_lens,
            self.full_heads[layer_id], self.sink, self.recent, sm_scale,
        )
        return out, kv_cache
