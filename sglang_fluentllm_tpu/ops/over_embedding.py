"""Over-embedding (OEP): hashed n-gram embeddings for LongCat Flash.

Reference: ``srt/layers/over_embedding.py`` (FusedOverEmbedding) +
``srt/oe_utils.py`` (token table) + the flashinfer
``compute_n_gram_ids_v2`` kernel contract. Semantics:

    F = (N - 1) * K hash families; family i = (n - 2) * K + k covers
    n-grams of length n = i // K + 2 with modulus m_i = M + 2 i + 1
    (odd moduli near M = vocab * oe_vocab_size_ratio).

    id_i(t) = (sum_{d=0}^{n-1} token[t - d] * V^d) mod m_i + offset_i

    where V = vocab size, offset_i = sum_{j<i} m_j indexes the fused
    table whose family-i block has exactly m_i rows. Each family embeds
    into hidden/F dims, projects up to hidden via a per-family matrix,
    and the final embedding is the MEAN over (word embedding, F
    projected n-gram embeddings).

Out-of-range history (t - d < 0) contributes token 0, i.e. nothing —
``0 * V^d == 0`` — which is also what the zero-padded history tail
produces, so prefix-cache reuse and fresh starts agree by construction.

TPU design: the reference needs a CUDA kernel plus a device token table
updated in-place because the overlap scheduler doesn't know the last
few sampled tokens host-side. Here the same holds (future-token ring),
so decode threads a per-request token-history RING through the KV-cache
pytree (functional updates inside jit), while extend gets the chunk
boundary's preceding tokens from the host (``batch.hist_tail``) and
computes every shifted view by pure slicing — no scatter, no dynamic
shapes. Modular arithmetic runs in uint32 via shift-add (Russian
peasant) multiplication, exact for any modulus < 2^31 without int64.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

RING_W = 8  # history ring width; supports n-grams up to N = RING_W + 1


def oep_constants(vocab: int, m_base: int, oe_k: int,
                  oe_n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mods [F], weights [F, N], offsets [F]) — reference
    ``FusedOverEmbedding.__init__`` precompute (over_embedding.py:170).

    weights[i, d] = V^d mod m_i; offsets are exclusive row sums of the
    per-family moduli (= per-family table sizes) into the fused table.
    """
    F = (oe_n - 1) * oe_k
    mods = np.zeros((F,), np.int64)
    weights = np.zeros((F, oe_n), np.int64)
    for i in range(F):
        m = m_base + 2 * i + 1
        mods[i] = m
        for d in range(oe_n):
            weights[i, d] = pow(vocab, d, m)
    offsets = np.concatenate([[0], np.cumsum(mods)[:-1]])
    return (mods.astype(np.int32), weights.astype(np.int32),
            offsets.astype(np.int32))


def mulmod(a: jax.Array, b: jax.Array, m: jax.Array) -> jax.Array:
    """(a * b) mod m elementwise in uint32, exact for m < 2^31.

    Shift-add: fold b's bits MSB-first, keeping the accumulator < m so
    every intermediate (2r + a) stays below 3 * 2^31 < 2^32. b and m
    broadcast; a is reduced mod m first.
    """
    a = a.astype(jnp.uint32) % m.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    mu = m.astype(jnp.uint32)
    r = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape, mu.shape),
                  jnp.uint32)
    for bit in range(30, -1, -1):
        r = (r * 2) % mu
        take = (b >> np.uint32(bit)) & np.uint32(1)
        r = (r + take * a) % mu
    return r.astype(jnp.int32)


def ngram_ids(
    toks: jax.Array,      # [..., N] token at delta d back (d=0 current)
    mods: jax.Array,      # [F]
    weights: jax.Array,   # [F, N]
    offsets: jax.Array,   # [F]
    oe_k: int,
) -> jax.Array:
    """Fused-table ids [..., F] for every hash family.

    Family i uses only its first n = i // K + 2 deltas; later deltas are
    masked out (the kernel contract: an n-gram never reads past n - 1
    tokens back).
    """
    F, N = weights.shape
    n_of = jnp.arange(F, dtype=jnp.int32) // oe_k + 2        # [F]
    acc = jnp.zeros(toks.shape[:-1] + (F,), jnp.int32)
    for d in range(N):
        term = mulmod(toks[..., d, None], weights[:, d], mods)
        term = jnp.where(d < n_of, term, 0)
        acc = ((acc.astype(jnp.uint32) + term.astype(jnp.uint32))
               % mods.astype(jnp.uint32)).astype(jnp.int32)
    return acc + offsets


def oep_combine(
    word_emb: jax.Array,   # [B, S, H]
    oe_table: jax.Array,   # [sum_m, H // F]
    oe_proj: jax.Array,    # [F, H // F, H]
    ids: jax.Array,        # [B, S, F]
) -> jax.Array:
    """mean(word, proj_i(table[ids_i]) for all F families) -> [B, S, H]
    (reference FusedOverEmbedding.forward bmm + mean)."""
    F = oe_proj.shape[0]
    gathered = oe_table[ids]                       # [B, S, F, H/F]
    oe = jnp.einsum(
        "bsfd,fdh->bsh", gathered.astype(jnp.float32),
        oe_proj.astype(jnp.float32),
    )
    out = (word_emb.astype(jnp.float32) + oe) / (F + 1)
    return out.astype(word_emb.dtype)


def ring_update_extend(
    ring: jax.Array,       # [rows, RING_W] i32
    rows: jax.Array,       # [B] row per request (trash-mapped already)
    tokens_ext: jax.Array,  # [B, RING_W + S] hist tail ++ chunk tokens
    start: jax.Array,      # [B] first position of the chunk
    q_len: jax.Array,      # [B] valid tokens in the chunk
) -> jax.Array:
    """Leave each request's ring holding its last RING_W tokens.

    Pure arithmetic, no scatter ordering hazards: ring column c gets the
    LARGEST position p <= last with p % RING_W == c, looked up in
    ``tokens_ext`` (whose leading RING_W entries are the host-provided
    tail, zero-padded below position 0 — the missing-token convention).
    """
    W = RING_W
    last = start + jnp.maximum(q_len, 1) - 1                  # [B]
    c = jnp.arange(W, dtype=jnp.int32)[None, :]               # [1, W]
    p = last[:, None] - (last[:, None] - c) % W               # [B, W]
    idx = jnp.clip(p - start[:, None] + W, 0, tokens_ext.shape[1] - 1)
    vals = jnp.take_along_axis(tokens_ext, idx, axis=1)
    vals = jnp.where(p >= 0, vals, 0)
    new_rows = jnp.where((q_len > 0)[:, None], vals, ring[rows])
    return ring.at[rows].set(new_rows)


def ring_history(
    ring: jax.Array,   # [rows, RING_W]
    rows: jax.Array,   # [B]
    pos: jax.Array,    # [B] current position
    n_back: int,
) -> jax.Array:
    """[B, n_back] tokens at positions pos-1 .. pos-n_back (0 below 0)."""
    j = jnp.arange(1, n_back + 1, dtype=jnp.int32)[None, :]
    p = pos[:, None] - j
    vals = jnp.take_along_axis(ring[rows], p % RING_W, axis=1)
    return jnp.where(p >= 0, vals, 0)
