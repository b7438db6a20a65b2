"""NSA — Native Sparse Attention (compress / select / window branches).

Reference: ``srt/models/qwen3_nsa.py`` + ``srt/layers/attention/
native_sparse_attention/`` (compress_kv.py gated compression,
compress_attn.py block-causal compressed attention + select-score
transform, select_attn.py top-k block attention). Semantics transcribed
from the torch/triton reference:

- gated compression: block b covers tokens [b*s, b*s+K); the block's
  K tokens are combined with softmax(gate_proj(flatten(block))) weights
  (``compress_kv.py:44``).
- compressed attention: block b is visible to query position t iff
  t >= b*s + K - 1 (``compress_attn.py:37``); queries with no visible
  block output zero.
- selection: per select-block score = sum over overlapping compressed
  blocks of prob * overlap/stride (``compress_attn.py:103``); scores
  aggregate over the q-head group of each kv head; the first
  ``n_init`` blocks and the ``n_local`` blocks at the query are forced
  (``compress_attn.py:249-260``); top-``top_n`` blocks attend.
- window branch: sliding-window attention over the last W tokens.
- fusion: per-head sigmoid gates computed FROM the three branch
  outputs (gate_feature='attention', ``qwen3_nsa.py:810-833``).

All-dense jnp formulation over gathered K/V: static shapes, MXU
matmuls; the compressed buffer is recomputed per call (the reference
caches it — a TPU-side compressed pool is the planned optimization).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30
KEEP = 999999.0


@dataclasses.dataclass
class NSAParams:
    """Per-layer NSA weights (checkpoint: ``attn.compress_attn.
    compress_{key,value}.gate_proj.weight``, ``attn.gate_fusion.
    gate_weight.weight``)."""

    gate_k: jax.Array    # [K*Dqk, K] compress-key gate
    gate_v: jax.Array    # [K*Dv, K] compress-value gate
    fusion_w: jax.Array  # [Hq, 3, 3*Dv] branch-gate weights


def gated_compress(
    x: jax.Array,        # [B, T, Hk, D]
    gate_w: jax.Array,   # [K*D, K]
    kernel: int,
    stride: int,
) -> jax.Array:
    """[B, NB, Hk, D] compressed blocks (NB = (T - K)//s + 1, static)."""
    B, T, Hk, D = x.shape
    NB = max((T - kernel) // stride + 1, 0)
    if NB == 0:
        return jnp.zeros((B, 0, Hk, D), x.dtype)
    starts = jnp.arange(NB) * stride
    idx = starts[:, None] + jnp.arange(kernel)[None, :]   # [NB, K]
    blocks = x[:, idx]                                    # [B, NB, K, Hk, D]
    blocks = blocks.swapaxes(2, 3)                        # [B, NB, Hk, K, D]
    flat = blocks.reshape(B, NB, Hk, kernel * D)
    gate = jax.nn.softmax(
        (flat.astype(jnp.float32) @ gate_w.astype(jnp.float32)), axis=-1
    )                                                     # [B, NB, Hk, K]
    out = jnp.einsum(
        "bnhk,bnhkd->bnhd", gate, blocks.astype(jnp.float32)
    )
    return out.astype(x.dtype)


def _gqa_scores(q, k, sm_scale):
    """q [B,S,Hq,D], k [B,T,Hk,D] -> [B,Hq,S,T] f32 (heads grouped)."""
    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk
    qg = q.reshape(B, S, Hk, G, D)
    s = jnp.einsum(
        "bshgd,bthd->bhgst", qg.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * sm_scale
    return s.reshape(B, Hk * G, S, k.shape[1])  # head-major per kv group


def _gqa_attend(probs, v):
    """probs [B,Hq,S,T], v [B,T,Hk,Dv] -> [B,S,Hq,Dv]."""
    B, Hq, S, T = probs.shape
    Hk = v.shape[2]
    G = Hq // Hk
    p = probs.reshape(B, Hk, G, S, T)
    o = jnp.einsum("bhgst,bthd->bshgd", p, v.astype(jnp.float32))
    return o.reshape(B, S, Hq, v.shape[-1])


def nsa_attend(
    q: jax.Array,          # [B, S, Hq, Dqk] (rope applied)
    k: jax.Array,          # [B, T, Hk, Dqk] dense gathered keys
    v: jax.Array,          # [B, T, Hk, Dv]
    q_pos: jax.Array,      # [B, S] global position of each query
    seq_lens: jax.Array,   # [B] valid context length
    params: NSAParams,
    kernel: int,
    stride: int,
    select_size: int,
    top_n: int,
    n_init: int,
    n_local: int,
    window: int,
    sm_scale: float,
) -> jax.Array:
    """Full NSA: (cmp, slc, win) branches + sigmoid gate fusion.
    Returns [B, S, Hq, Dv]."""
    B, S, Hq, Dqk = q.shape
    T, Hk = k.shape[1], k.shape[2]
    Dv = v.shape[-1]
    G = Hq // Hk
    valid_t = jnp.arange(T)[None, :] < seq_lens[:, None]   # [B, T]

    # ---- compressed branch -----------------------------------------
    ck = gated_compress(k, params.gate_k, kernel, stride)  # [B,NB,Hk,Dqk]
    cv = gated_compress(v, params.gate_v, kernel, stride)
    NB = ck.shape[1]
    if NB > 0:
        cs = _gqa_scores(q, ck, sm_scale)                  # [B,Hq,S,NB]
        blk_last = jnp.arange(NB) * stride + kernel - 1    # [NB]
        vis = q_pos[:, None, :, None] >= blk_last[None, None, None, :]
        cs = jnp.where(vis, cs, NEG)
        any_vis = jnp.any(vis, axis=-1, keepdims=True)
        cprobs = jax.nn.softmax(cs, axis=-1)
        cprobs = jnp.where(any_vis, cprobs, 0.0)           # no-block rows
        cmp_o = _gqa_attend(cprobs, cv)                    # [B,S,Hq,Dv]
    else:
        cprobs = jnp.zeros((B, Hq, S, 0), jnp.float32)
        cmp_o = jnp.zeros((B, S, Hq, Dv), jnp.float32)

    # ---- selection scores (compress_attn.py:_compute_select_score) --
    NSel = -(-T // select_size)
    sel_start = jnp.arange(NSel) * select_size             # [NSel]
    if NB > 0:
        blk_start = jnp.arange(NB) * stride
        blk_end = blk_start + kernel
        overlap = (
            jnp.minimum(blk_end[None, :],
                        (sel_start + select_size)[:, None])
            - jnp.maximum(blk_start[None, :], sel_start[:, None])
        )
        w = jnp.maximum(overlap, 0).astype(jnp.float32) / stride
        sel_scores = jnp.einsum("bhsn,mn->bhsm", cprobs, w)
    else:
        sel_scores = jnp.zeros((B, Hq, S, NSel), jnp.float32)
    # aggregate q-head groups onto kv heads (sum; "virtual_k_group sum")
    sel_scores = sel_scores.reshape(B, Hk, G, S, NSel).sum(2)
    # forced blocks: first n_init, and the n_local blocks ending at the
    # query's own block (clamped into causal range)
    q_blk = q_pos // select_size                           # [B, S]
    sel_ids = jnp.arange(NSel)[None, None, :]
    if n_init > 0:
        init_mask = (sel_ids < n_init) & (sel_ids <= q_blk[..., None])
        sel_scores = jnp.where(init_mask[:, None], KEEP, sel_scores)
    if n_local > 0:
        local_mask = (sel_ids > q_blk[..., None] - n_local) & (
            sel_ids <= q_blk[..., None])
        sel_scores = jnp.where(local_mask[:, None], KEEP, sel_scores)
    # causal: blocks beyond the query's block are invalid
    causal_blk = sel_ids <= q_blk[..., None]               # [B, S, NSel]
    sel_scores = jnp.where(causal_blk[:, None], sel_scores, NEG)

    K_sel = min(top_n, NSel)
    _, top_blk = jax.lax.top_k(sel_scores, K_sel)          # [B,Hk,S,Ksel]
    # token-level mask: token t' selected iff its select-block is in the
    # top-k set for (kv head, query)
    tok_blk = jnp.arange(T) // select_size                 # [T]
    sel_mask = jnp.any(
        tok_blk[None, None, None, None, :]
        == top_blk[..., None], axis=-2,
    )                                                      # [B,Hk,S,T]
    # expand to q heads, add causal + validity
    sel_mask = jnp.repeat(sel_mask, G, axis=1)             # [B,Hq,S,T]
    causal = (jnp.arange(T)[None, None, :]
              <= q_pos[:, :, None])                        # [B,S,T]
    sel_mask = sel_mask & causal[:, None] & valid_t[:, None, None, :]

    full_s = _gqa_scores(q, k, sm_scale)                   # [B,Hq,S,T]
    slc_s = jnp.where(sel_mask, full_s, NEG)
    slc_p = jax.nn.softmax(slc_s, axis=-1)
    slc_p = jnp.where(
        jnp.any(sel_mask, axis=-1, keepdims=True), slc_p, 0.0)
    slc_o = _gqa_attend(slc_p, v)

    # ---- sliding-window branch -------------------------------------
    win_mask = causal & (
        jnp.arange(T)[None, None, :] > q_pos[:, :, None] - window
    )
    win_mask = win_mask[:, None] & valid_t[:, None, None, :]
    win_s = jnp.where(win_mask, full_s, NEG)
    win_p = jax.nn.softmax(win_s, axis=-1)
    win_p = jnp.where(
        jnp.any(win_mask, axis=-1, keepdims=True), win_p, 0.0)
    win_o = _gqa_attend(win_p, v)

    # ---- gate fusion (qwen3_nsa.py:810) -----------------------------
    feats = jnp.stack(
        [cmp_o.astype(jnp.float32), slc_o.astype(jnp.float32),
         win_o.astype(jnp.float32)], axis=-2)              # [B,S,Hq,3,Dv]
    flat = feats.reshape(B, S, Hq, 3 * Dv)
    gates = jax.nn.sigmoid(jnp.einsum(
        "bshf,hgf->bshg", flat, params.fusion_w.astype(jnp.float32)
    ))                                                     # [B,S,Hq,3]
    out = jnp.einsum("bshg,bshgd->bshd", gates, feats)
    return out.astype(q.dtype)


class NSAAttentionBackend:
    """Attention backend for NSA models: scatter the new KV into the
    paged pool, gather the dense context, run the three-branch sparse
    attention (role of the reference's NSA triton backend family)."""

    name = "nsa"

    def __call__(self, kv_cache, layer_id, q, k_new, v_new, batch,
                 sm_scale, nsa: Optional[NSAParams] = None,
                 kernel=32, stride=16, select_size=64, top_n=16,
                 n_init=1, n_local=2, window=512, **kw):
        from sglang_fluentllm_tpu.mem.kv_cache import WindowKV, mha_write
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            page_gather_mha,
        )

        B, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        if isinstance(kv_cache, WindowKV):
            # fused-decode-window view (kv_cache.WindowKV): append the new
            # token to the dense gathered history and attend over it —
            # zero gathers in-window; pool writes are deferred to
            # window_close (one bulk scatter per window)
            assert S == 1 and batch.mode.is_decode()
            pool = kv_cache.pool
            pos = jnp.minimum(batch.seq_lens - 1, kv_cache.hk.shape[2] - 1)
            Dp = kv_cache.hk.shape[-1]
            kn, vn = k_new, v_new
            if Dp != D:
                pad = ((0, 0), (0, 0), (0, 0), (0, Dp - D))
                kn = jnp.pad(kn, pad)
                vn = jnp.pad(vn, pad)
            bidx = jnp.arange(B, dtype=jnp.int32)
            hk = kv_cache.hk.at[layer_id, bidx, pos].set(kn[:, 0])
            hv = kv_cache.hv.at[layer_id, bidx, pos].set(vn[:, 0])
            out = nsa_attend(
                q, hk[layer_id][..., :D], hv[layer_id][..., :D],
                batch.positions, batch.seq_lens, nsa,
                kernel=kernel, stride=stride, select_size=select_size,
                top_n=top_n, n_init=n_init, n_local=n_local,
                window=window, sm_scale=sm_scale,
            )
            return out, WindowKV(pool=pool, hk=hk, hv=hv)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B * S, Hk, D), v_new.reshape(B * S, Hk, D),
        )
        k = page_gather_mha(
            kv_cache.k[layer_id], batch.page_tables, batch.page_size
        )[..., :D]                                  # [B, T, Hk, D]
        v = page_gather_mha(
            kv_cache.v[layer_id], batch.page_tables, batch.page_size
        )[..., :D]
        out = nsa_attend(
            q, k, v, batch.positions, batch.seq_lens, nsa,
            kernel=kernel, stride=stride, select_size=select_size,
            top_n=top_n, n_init=n_init, n_local=n_local,
            window=window, sm_scale=sm_scale,
        )
        return out, kv_cache
