"""DSA — DeepSeek Sparse Attention (V3.2 lightning indexer + top-k MLA).

Reference: ``srt/layers/attention/dsa_backend.py`` +
``srt/layers/attention/dsa/nsa_indexer.py`` (IndexerBf16). Semantics:

    score(t, s) = sum_h w[t, h] * relu(q_idx[t, h] . k_idx[s])
    keep top-``index_topk`` context positions s <= t per query t,
    then MLA-attend over ONLY the selected latents.

TPU design: the indexer's context scoring is an MQA-shaped matmul over
the per-token index-key cache (one d_idx vector per token, gathered by
page table), the top-k is a masked ``lax.top_k``, and the sparse attend
is gather(selected latents) + dense masked MQA — all static shapes, so
XLA tiles everything onto the MXU. Selection only engages when the
context exceeds ``index_topk``; shorter contexts select everything and
match dense attention bit-for-bit (tested).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def indexer_scores(
    q_idx: jax.Array,    # [B, h_idx, d_idx] f32/bf16 (rope already applied)
    w: jax.Array,        # [B, h_idx] f32 (scaled weights)
    keys: jax.Array,     # [B, T, d_idx] gathered index keys
    seq_lens: jax.Array,  # [B] valid context length per row
) -> jax.Array:
    """[B, T] selection logits; invalid positions = -inf."""
    s = jnp.einsum(
        "bhd,btd->bht", q_idx.astype(jnp.float32),
        keys.astype(jnp.float32),
    )
    s = jnp.einsum("bh,bht->bt", w.astype(jnp.float32), jax.nn.relu(s))
    T = keys.shape[1]
    valid = jnp.arange(T)[None, :] < seq_lens[:, None]
    return jnp.where(valid, s, -jnp.inf)


def select_topk(
    scores: jax.Array,   # [B, T] (-inf at invalid)
    topk: int,
) -> Tuple[jax.Array, jax.Array]:
    """(positions [B, K] i32, valid [B, K] bool). K = min(topk, T)."""
    T = scores.shape[1]
    K = min(topk, T)
    vals, pos = jax.lax.top_k(scores, K)
    return pos.astype(jnp.int32), vals > -jnp.inf


def gather_slots(page_tables: jax.Array, positions: jax.Array,
                 page_size: int) -> jax.Array:
    """Token positions -> global KV slot ids via the page table."""
    page = jnp.take_along_axis(
        page_tables, positions // page_size, axis=1
    )
    return page * page_size + positions % page_size


def mla_sparse_attend(
    q_eff: jax.Array,     # [B, Hq, r_pad + rope_pad] (absorbed query)
    lat: jax.Array,       # [slots, r_pad + rope_pad] latent cache
    sel_slots: jax.Array,  # [B, K]
    sel_valid: jax.Array,  # [B, K]
    r: int,
    sm_scale: float,
) -> jax.Array:
    """Masked MQA over the selected latents -> [B, Hq, r] latent ctx."""
    sel = lat[sel_slots]                        # [B, K, dim]
    scores = jnp.einsum(
        "bhd,bkd->bhk", q_eff.astype(jnp.float32),
        sel.astype(jnp.float32),
    ) * sm_scale
    scores = jnp.where(sel_valid[:, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # all-invalid rows (padded) produce nan -> zero them
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    return jnp.einsum(
        "bhk,bkd->bhd", probs, sel[..., :r].astype(jnp.float32)
    )


def mla_sparse_attend_multi(
    q_eff: jax.Array,      # [B, Cq, Hq, dim] absorbed queries (chunk)
    lat: jax.Array,        # [slots, dim]
    sel_slots: jax.Array,  # [B, Cq, K]
    sel_valid: jax.Array,  # [B, Cq, K]
    r: int,
    sm_scale: float,
) -> jax.Array:
    """Per-query sparse MLA attend for a chunk of queries
    -> [B, Cq, Hq, r] latent ctx (extend-phase DSA)."""
    sel = lat[sel_slots]                           # [B, Cq, K, dim]
    scores = jnp.einsum(
        "bqhd,bqkd->bqhk", q_eff.astype(jnp.float32),
        sel.astype(jnp.float32),
    ) * sm_scale
    scores = jnp.where(sel_valid[:, :, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    return jnp.einsum(
        "bqhk,bqkd->bqhd", probs, sel[..., :r].astype(jnp.float32)
    )
