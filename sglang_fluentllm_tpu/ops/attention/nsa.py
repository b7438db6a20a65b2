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


# ----------------------------------------------------------------------
# Compressed-cache maintenance (NSAKVCache.ck/cv; reference role:
# native_sparse_attention/compress_kv.py cached compressed buffers)
# ----------------------------------------------------------------------

def _sanitize_sidx(state_idx: jax.Array, n_rows: int) -> jax.Array:
    """Padded rows (state_idx < 0) target the trash row (last)."""
    return jnp.where(state_idx < 0, n_rows - 1, state_idx)


def nsa_refresh_blocks(ck, cv, layer_id, k_dense, v_dense, seq_lens,
                       state_idx, params: NSAParams, kernel: int,
                       stride: int):
    """Recompute ALL complete compressed blocks from the gathered dense
    history and write them into the per-request rows (EXTEND /
    TARGET_VERIFY: the dense history is in hand anyway, and recompute-
    from-scratch is what keeps radix-prefix reuse and spec rollback
    correct — a prefix cached by another request never leaves stale
    rows, see NSAKVCache docstring)."""
    B, T = k_dense.shape[:2]
    ckb = gated_compress(k_dense, params.gate_k, kernel, stride)
    cvb = gated_compress(v_dense, params.gate_v, kernel, stride)
    NB = ckb.shape[1]
    if NB == 0:
        return ck, cv
    NB = min(NB, ck.shape[2])
    ckb, cvb = ckb[:, :NB], cvb[:, :NB]
    nb = jnp.where(seq_lens >= kernel, (seq_lens - kernel) // stride + 1, 0)
    bidx = jnp.arange(NB, dtype=jnp.int32)[None, :]
    # invalid blocks -> OOB index, dropped by the scatter
    tgt = jnp.where(bidx < nb[:, None], bidx, ck.shape[2])
    sidx = _sanitize_sidx(state_idx, ck.shape[1])[:, None]
    Dc = ck.shape[-1]
    ck = ck.at[layer_id, sidx, tgt].set(
        ckb[..., :Dc].astype(ck.dtype), mode="drop")
    cv = cv.at[layer_id, sidx, tgt].set(
        cvb[..., :Dc].astype(cv.dtype), mode="drop")
    return ck, cv


def nsa_append_block(ck, cv, layer_id, tail_k, tail_v, seq_lens,
                     state_idx, params: NSAParams, kernel: int,
                     stride: int):
    """DECODE single-step maintenance: when the step completes a block
    (``(T - kernel) % stride == 0``), compress the last ``kernel`` tokens
    (``tail_k/v [B, kernel, Hk, D]``, current token included) and write
    row ``(T - kernel) // stride``."""
    ckb = gated_compress(tail_k, params.gate_k, kernel, stride)[:, 0]
    cvb = gated_compress(tail_v, params.gate_v, kernel, stride)[:, 0]
    T = seq_lens
    completes = (T >= kernel) & ((T - kernel) % stride == 0)
    b_new = jnp.maximum((T - kernel) // stride, 0)
    tgt = jnp.where(completes, b_new, ck.shape[2])  # OOB drop
    sidx = _sanitize_sidx(state_idx, ck.shape[1])
    Dc = ck.shape[-1]
    ck = ck.at[layer_id, sidx, tgt].set(
        ckb[..., :Dc].astype(ck.dtype), mode="drop")
    cv = cv.at[layer_id, sidx, tgt].set(
        cvb[..., :Dc].astype(cv.dtype), mode="drop")
    return ck, cv


def select_overlap_weights(NB, NSel, kernel, stride, select_size):
    """[NSel, NB] select-score transform weights: per select-block score
    = sum over overlapping compressed blocks of prob * overlap/stride
    (compress_attn.py:103) — shared by dense and sparse paths."""
    blk_start = jnp.arange(NB) * stride
    sel_start = jnp.arange(NSel) * select_size
    overlap = (
        jnp.minimum((blk_start + kernel)[None, :],
                    (sel_start + select_size)[:, None])
        - jnp.maximum(blk_start[None, :], sel_start[:, None])
    )
    return jnp.maximum(overlap, 0).astype(jnp.float32) / stride


class NSAAttentionBackend:
    """Attention backend for NSA models: scatter the new KV into the
    paged pool, gather the dense context, run the three-branch sparse
    attention (role of the reference's NSA triton backend family).

    With an NSAKVCache (production pools), decode S=1 runs the SPARSE
    path: compressed branch over the cached per-request rows, top-k
    block selection, and attention over ONLY the selected + window
    tokens — the full history is never materialized (reference
    ``native_sparse_attention/select_attn.py`` role)."""

    name = "nsa"

    def __call__(self, kv_cache, layer_id, q, k_new, v_new, batch,
                 sm_scale, nsa: Optional[NSAParams] = None,
                 kernel=32, stride=16, select_size=64, top_n=16,
                 n_init=1, n_local=2, window=512, **kw):
        from sglang_fluentllm_tpu.mem.kv_cache import (
            NSAKVCache,
            WindowKV,
            mha_write,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            page_gather_mha,
        )

        B, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        hyper = dict(kernel=kernel, stride=stride, select_size=select_size,
                     top_n=top_n, n_init=n_init, n_local=n_local,
                     window=window)
        if isinstance(kv_cache, NSAKVCache):
            if batch.mode.is_decode() and S == 1 \
                    and batch.state_idx is not None:
                return self._decode_sparse(
                    kv_cache, layer_id, q, k_new, v_new, batch,
                    sm_scale, nsa, **hyper)
            # extend / verify: dense three-branch over the gathered
            # history + full compressed-row refresh
            pool = mha_write(
                kv_cache.pool, layer_id, loc,
                k_new.reshape(B * S, Hk, D), v_new.reshape(B * S, Hk, D),
            )
            k = page_gather_mha(
                pool.k[layer_id], batch.page_tables, batch.page_size
            )[..., :D]
            v = page_gather_mha(
                pool.v[layer_id], batch.page_tables, batch.page_size
            )[..., :D]
            out = nsa_attend(
                q, k, v, batch.positions, batch.seq_lens, nsa,
                sm_scale=sm_scale, **hyper,
            )
            ck, cv = kv_cache.ck, kv_cache.cv
            if batch.state_idx is not None:
                ck, cv = nsa_refresh_blocks(
                    ck, cv, layer_id, k, v, batch.seq_lens,
                    batch.state_idx, nsa, kernel, stride,
                )
            return out, NSAKVCache(pool=pool, ck=ck, cv=cv)
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
            if isinstance(pool, NSAKVCache) and batch.state_idx is not None:
                # keep the compressed rows current so a later long-context
                # window of the same request can take the sparse path
                tk, tv = self._tail_from_dense(
                    hk[layer_id], hv[layer_id], batch.seq_lens, kernel, D)
                ck, cv = nsa_append_block(
                    pool.ck, pool.cv, layer_id, tk, tv, batch.seq_lens,
                    batch.state_idx, nsa, kernel, stride,
                )
                pool = NSAKVCache(pool=pool.pool, ck=ck, cv=cv)
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

    # ------------------------------------------------------------------
    @staticmethod
    def _tail_from_dense(hk_l, hv_l, seq_lens, kernel, D):
        """Last ``kernel`` tokens [B, kernel, Hk, D] from the dense
        window buffers (clamped to >= 0 for short rows; short rows never
        complete a block so their values are dropped by the append)."""
        B = hk_l.shape[0]
        tidx = jnp.maximum(
            seq_lens[:, None] - kernel + jnp.arange(kernel)[None, :], 0
        )
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        return hk_l[bidx, tidx][..., :D], hv_l[bidx, tidx][..., :D]

    def _decode_sparse(self, kv_cache, layer_id, q, k_new, v_new, batch,
                       sm_scale, nsa: NSAParams, kernel, stride,
                       select_size, top_n, n_init, n_local, window):
        """Sparse decode over the paged pool (S=1).

        Bandwidth per step: compressed rows (T/stride tokens-equivalent)
        + top_n*select_size selected tokens + window tokens — never the
        full history (reference select_attn.py / compress_attn.py role).
        The sliding-window branch rides the fused-write multirow kernel
        (which also commits the current token to the pool in-kernel,
        keeping the layer scan an aliased-pallas chain); the select
        branch reads the pool through the NSA select kernel, or a jnp
        per-head gather off-TPU."""
        from sglang_fluentllm_tpu.mem.kv_cache import NSAKVCache
        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            paged_decode_multirow,
        )

        pool, ck, cv = kv_cache.pool, kv_cache.ck, kv_cache.cv
        B, S, Hq, D = q.shape
        Hk = k_new.shape[2]
        G = Hq // Hk
        Dp = pool.k.shape[-1]
        ps = batch.page_size
        T = batch.seq_lens                       # includes current token
        q_pos = T - 1

        # ---- window branch + pool write ------------------------------
        if jax.default_backend() == "tpu":
            # fused-write multirow kernel: commits the current token to
            # the pool IN-KERNEL (aliased chain, no per-layer pool copy)
            # and computes the sliding-window branch in the same pass
            q2 = q[:, 0]
            kn2, vn2 = k_new[:, 0], v_new[:, 0]
            if Dp != D:
                pad3 = ((0, 0), (0, 0), (0, Dp - D))
                q2 = jnp.pad(q2, pad3)
                kn2 = jnp.pad(kn2, pad3)
                vn2 = jnp.pad(vn2, pad3)
            win_o, k2, v2 = paged_decode_multirow(
                q2, pool.k, pool.v, layer_id,
                batch.page_tables, T,
                k_new=kn2, v_new=vn2,
                new_slots=batch.out_cache_loc[:, 0],
                window=window,
                page_size=ps, sm_scale=sm_scale,
                run_only=batch.pages_are_runs,
            )
            pool = type(pool)(k=k2, v=v2)
            win_o = win_o[..., :D].reshape(B, Hk, G, D)
        else:
            # CPU/test fallback: scatter write + sparse gather of the
            # last `window` tokens only (still never the full history)
            from sglang_fluentllm_tpu.mem.kv_cache import mha_write

            pool = mha_write(
                pool, layer_id, batch.out_cache_loc.reshape(-1),
                k_new.reshape(B * S, Hk, D),
                v_new.reshape(B * S, Hk, D),
            )
            qf0 = (q.astype(jnp.float32) * sm_scale).reshape(B, Hk, G, D)
            Wp = min(window, batch.page_tables.shape[1] * ps)
            wk, wv = self._gather_tail(
                pool, layer_id, batch, T, Wp, D)   # [B, Wp, Hk, D]
            wpos = (T[:, None] - Wp
                    + jnp.arange(Wp)[None, :])     # [B, Wp] token ids
            wvalid = wpos >= jnp.maximum(T - window, 0)[:, None]
            wvalid &= wpos >= 0
            s = jnp.einsum("bhgd,bnhd->bhgn", qf0,
                           wk.astype(jnp.float32))
            s = jnp.where(wvalid[:, None, None, :], s, NEG)
            p = jax.nn.softmax(s, axis=-1)
            p = jnp.where(
                jnp.any(wvalid, axis=-1)[:, None, None, None], p, 0.0)
            win_o = jnp.einsum("bhgn,bnhd->bhgd", p,
                               wv.astype(jnp.float32))

        # ---- compressed-cache append (may complete one block) --------
        tail_k, tail_v = self._gather_tail(
            pool, layer_id, batch, T, kernel, D)
        ck, cv = nsa_append_block(
            ck, cv, layer_id, tail_k, tail_v, T, batch.state_idx,
            nsa, kernel, stride,
        )

        # ---- compressed branch over the cached rows ------------------
        Tcap = batch.page_tables.shape[1] * ps
        NBcap = ck.shape[2]
        NB = min(max((Tcap - kernel) // stride + 1, 0), NBcap)
        sidx = _sanitize_sidx(batch.state_idx, ck.shape[1])
        ckb = ck[layer_id, sidx, :NB]            # [B, NB, Hk, D]
        cvb = cv[layer_id, sidx, :NB]
        nb = jnp.where(T >= kernel, (T - kernel) // stride + 1, 0)
        qf = (q.astype(jnp.float32) * sm_scale).reshape(B, Hk, G, D)
        cs = jnp.einsum("bhgd,bnhd->bhgn", qf,
                        ckb.astype(jnp.float32))  # [B, Hk, G, NB]
        vis = jnp.arange(NB)[None, :] < nb[:, None]       # [B, NB]
        cs = jnp.where(vis[:, None, None, :], cs, NEG)
        any_vis = jnp.any(vis, axis=-1)[:, None, None, None]
        cprobs = jax.nn.softmax(cs, axis=-1)
        cprobs = jnp.where(any_vis, cprobs, 0.0)
        cmp_o = jnp.einsum("bhgn,bnhd->bhgd", cprobs,
                           cvb.astype(jnp.float32))       # [B, Hk, G, D]

        # ---- select scores + top-k blocks ----------------------------
        NSel = -(-Tcap // select_size)
        w = select_overlap_weights(NB, NSel, kernel, stride, select_size)
        sel_scores = jnp.einsum("bhgn,mn->bhgm", cprobs, w)
        sel_scores = sel_scores.sum(2)                    # [B, Hk, NSel]
        q_blk = q_pos // select_size                      # [B]
        sel_ids = jnp.arange(NSel)[None, :]               # [1, NSel]
        if n_init > 0:
            init_mask = (sel_ids < n_init) & (sel_ids <= q_blk[:, None])
            sel_scores = jnp.where(init_mask[:, None], KEEP, sel_scores)
        if n_local > 0:
            local_mask = (sel_ids > q_blk[:, None] - n_local) & (
                sel_ids <= q_blk[:, None])
            sel_scores = jnp.where(local_mask[:, None], KEEP, sel_scores)
        causal_blk = sel_ids <= q_blk[:, None]
        sel_scores = jnp.where(causal_blk[:, None], sel_scores, NEG)
        Ksel = min(top_n, NSel)
        _, top_blk = jax.lax.top_k(sel_scores, Ksel)      # [B, Hk, Ksel]
        # mark blocks that only made top-k as NEG padding as invalid
        blk_valid = jnp.take_along_axis(
            jnp.broadcast_to(causal_blk[:, None], sel_scores.shape),
            top_blk, axis=-1,
        )
        top_blk = jnp.where(blk_valid, top_blk, -1)

        # ---- select branch over ONLY the chosen blocks ---------------
        slc_o = self._select_attend(
            pool, layer_id, qf, top_blk, batch, T, select_size, Dp, D,
        )                                                  # [B, Hk, G, D]

        # ---- gate fusion (qwen3_nsa.py:810) --------------------------
        feats = jnp.stack([
            cmp_o.reshape(B, 1, Hq, D)[:, 0],
            slc_o.reshape(B, 1, Hq, D)[:, 0],
            win_o.astype(jnp.float32).reshape(B, 1, Hq, D)[:, 0],
        ], axis=-2)                                        # [B, Hq, 3, D]
        flat = feats.reshape(B, Hq, 3 * D)
        gates = jax.nn.sigmoid(jnp.einsum(
            "bhf,hgf->bhg", flat, nsa.fusion_w.astype(jnp.float32)
        ))                                                 # [B, Hq, 3]
        out = jnp.einsum("bhg,bhgd->bhd", gates, feats)
        out = out[:, None].astype(q.dtype)                 # [B, 1, Hq, D]
        return out, NSAKVCache(pool=pool, ck=ck, cv=cv)

    @staticmethod
    def _gather_tail(pool, layer_id, batch, T, kernel, D):
        """Last ``kernel`` tokens of each row from the paged pool
        ([B, kernel, Hk, D]); reads AFTER the fused write, so the
        current token is present. Combined (layer, head, slot) index
        gather on the STACKED pool — ``pool.k[layer_id]`` would
        dynamic-slice-copy a whole layer per call."""
        ps = batch.page_size
        B = T.shape[0]
        Hk = pool.k.shape[1]
        tidx = jnp.maximum(
            T[:, None] - kernel + jnp.arange(kernel)[None, :], 0
        )                                         # [B, kernel] token ids
        pt = batch.page_tables
        slot = jnp.take_along_axis(pt, tidx // ps, axis=1) * ps + tidx % ps
        lidx = jnp.broadcast_to(
            jnp.asarray(layer_id, jnp.int32), (B, kernel, Hk))
        hidx = jnp.broadcast_to(
            jnp.arange(Hk, dtype=jnp.int32), (B, kernel, Hk))
        sidx = jnp.broadcast_to(slot[:, :, None], (B, kernel, Hk))
        k = pool.k[lidx, hidx, sidx]              # [B, kernel, Hk, Dp]
        v = pool.v[lidx, hidx, sidx]
        return k[..., :D], v[..., :D]

    @staticmethod
    def _select_attend(pool, layer_id, qf, top_blk, batch, T,
                       select_size, Dp, D):
        """Attention over the union of the selected blocks' tokens.

        jnp per-head gather formulation (CPU / fallback): bandwidth is
        already sparse (only selected tokens move), but it pays a
        dynamic-slice copy of one layer; the Pallas kernel path
        (pallas_nsa_select.py) reads the stacked pool in place."""
        import os

        B, Hk, G, _ = qf.shape
        Ksel = top_blk.shape[-1]
        ss = select_size
        ps = batch.page_size
        # default = jnp gather: measured on the axon v5e
        # (perf/nsa_decode_v2_r5.log vs _jnpsel), the XLA gather path
        # runs the 8k sparse step in 13.5 ms while the Pallas select
        # kernel takes 56 ms — its ~1024 small DMA issues per call are
        # the cost, not the bytes. The kernel stays available
        # (SFT_NSA_SELECT_KERNEL=1) for runtimes with cheap DMA issue.
        use_kernel = (
            jax.default_backend() == "tpu"
            and ss % 8 == 0
            and (ss % ps == 0 or ps % ss == 0)
            and os.environ.get("SFT_NSA_SELECT_KERNEL", "0") == "1"
        )
        if use_kernel:
            from sglang_fluentllm_tpu.ops.attention.pallas_nsa_select import (
                nsa_select_decode,
            )

            out, _, _ = nsa_select_decode(
                qf.astype(jnp.bfloat16), pool.k, pool.v, layer_id,
                batch.page_tables, T, top_blk,
                select_size=ss, page_size=ps,
                run_only=batch.pages_are_runs,
            )
            return out[..., :D].astype(jnp.float32)
        # token ids of the selected blocks (invalid block -> token cap)
        tok = (
            top_blk[..., None] * ss
            + jnp.arange(ss)[None, None, None, :]
        ).reshape(B, Hk, Ksel * ss)               # [B, Hk, N]
        valid = (top_blk[..., None] >= 0) & (
            (top_blk[..., None] * ss
             + jnp.arange(ss)[None, None, None, :]) < T[:, None, None, None]
        )
        valid = valid.reshape(B, Hk, Ksel * ss)
        tok = jnp.clip(tok, 0, batch.page_tables.shape[1] * ps - 1)
        pt = batch.page_tables                    # [B, P]
        N = Ksel * ss
        slot = (
            jnp.take_along_axis(
                pt, (tok // ps).reshape(B, Hk * N), axis=1,
            ) * ps + (tok % ps).reshape(B, Hk * N)
        ).reshape(B, Hk, N)
        # combined (layer, head, slot) gather on the stacked pool — no
        # per-layer dynamic-slice copy
        lidx = jnp.broadcast_to(
            jnp.asarray(layer_id, jnp.int32), (B, Hk, N))
        hidx = jnp.broadcast_to(
            jnp.arange(Hk, dtype=jnp.int32)[None, :, None], (B, Hk, N))
        ksel = pool.k[lidx, hidx, slot][..., :D]   # [B, Hk, N, D]
        vsel = pool.v[lidx, hidx, slot][..., :D]
        s = jnp.einsum("bhgd,bhnd->bhgn", qf, ksel.astype(jnp.float32))
        s = jnp.where(valid[:, :, None, :], s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(
            jnp.any(valid, axis=-1)[:, :, None, None], p, 0.0)
        return jnp.einsum("bhgn,bhnd->bhgd", p, vsel.astype(jnp.float32))
