"""Pallas kernel for the DSA lightning-indexer context scoring.

TPU-native analog of the reference's ``dsa/nsa_indexer.py`` fp8-paged
indexer kernels (``_get_topk_paged`` scoring stage): decode-phase
selection scores

    score[b, t] = sum_h w[b, h] * relu(q[b, h, :] . k_idx[t, :])

computed by streaming the per-token index-key rows DIRECTLY from the
paged pool with the same double-buffered page-run DMA scheme as the
decode attention kernels — the XLA fallback (``ref_backend.page_gather``
+ ``dsa.indexer_scores``) first materializes the gathered [B, T, d]
keys to HBM and then re-reads them for the matmul, paying the context
bytes twice per layer per step.

Top-k stays in XLA (``lax.top_k`` is already tuned); this kernel only
replaces the gather + score stage. Falls back when the chunk width
isn't lane-aligned (``supported``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _idx_kernel(
    # scalar prefetch
    layer_ref,         # [1] int32
    page_tables_ref,   # [B, P_pad] int32 (SMEM)
    seq_lens_ref,      # [B] int32 (SMEM)
    # inputs
    q_ref,             # [h, d] VMEM (this row's index queries)
    w_ref,             # [1, h] VMEM f32 (scaled head weights)
    idx_hbm,           # [L, slots, d] HBM index-key pool
    # outputs
    s_ref,             # [1, T_pad] VMEM f32 scores
    # scratch
    k_buf,             # [2, chunk_t, d] VMEM
    sem,               # DMA sems [2]
    *,
    page_size: int,
    pages_per_chunk: int,
    max_chunks: int,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    ps = page_size
    ppc = pages_per_chunk
    chunk_t = ppc * ps

    def big_dma(slot, c):
        first = page_tables_ref[b, c * ppc]
        return pltpu.make_async_copy(
            idx_hbm.at[layer, pl.ds(first * ps, chunk_t), :],
            k_buf.at[slot], sem.at[slot],
        )

    def fixups(slot, c):
        first = page_tables_ref[b, c * ppc]
        n_pages = pl.cdiv(seq_lens_ref[b], ps)
        out = []
        for i in range(ppc):
            page = page_tables_ref[b, c * ppc + i]
            bad = (page != first + i) & (c * ppc + i < n_pages)
            out.append((bad, pltpu.make_async_copy(
                idx_hbm.at[layer, pl.ds(page * ps, ps), :],
                k_buf.at[slot, pl.ds(i * ps, ps), :],
                sem.at[slot],
            )))
        return out

    def start(slot, c):
        big_dma(slot, c).start()

    def finish(slot, c):
        big_dma(slot, c).wait()
        todo = fixups(slot, c)
        for bad, dma in todo:
            @pl.when(bad)
            def _():
                dma.start()
        for bad, dma in todo:
            @pl.when(bad)
            def _():
                dma.wait()

    seq_len = seq_lens_ref[b]
    nc = pl.cdiv(jnp.maximum(seq_len, 1), chunk_t)
    q = q_ref[...]
    w = w_ref[...]                                   # [1, h]

    start(0, 0)

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            start(1 - slot, c + 1)

        finish(slot, c)
        k = k_buf[slot]                              # [chunk_t, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [h, chunk_t]
        s = jax.lax.dot_general(
            w, jnp.maximum(s, 0.0), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [1, chunk_t]
        col = c * chunk_t + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk_t), 1)
        s = jnp.where(col < seq_len, s, NEG_INF)
        s_ref[0, pl.ds(c * chunk_t, chunk_t)] = s[0]
        return carry

    jax.lax.fori_loop(0, nc, body, 0)

    # chunks past the context: fill with NEG so top-k never picks them
    def fill(c, carry):
        @pl.when(c >= nc)
        def _():
            s_ref[0, pl.ds(c * chunk_t, chunk_t)] = jnp.full(
                (chunk_t,), NEG_INF, jnp.float32)
        return carry

    jax.lax.fori_loop(0, max_chunks, fill, 0)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "pages_per_chunk", "interpret"),
)
def dsa_indexer_scores_paged(
    q_idx: jax.Array,        # [B, h, d] (rope applied)
    w: jax.Array,            # [B, h] f32 (scaled weights)
    idx_pool: jax.Array,     # [L, slots, d_pad]
    layer_id: jax.Array,     # scalar int32
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,     # [B] int32
    *,
    page_size: int,
    pages_per_chunk: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """[B, P * page_size] f32 selection scores (NEG_INF when invalid)."""
    B, h, d = q_idx.shape
    d_pad = idx_pool.shape[-1]
    if d != d_pad:
        q_idx = jnp.pad(q_idx, ((0, 0), (0, 0), (0, d_pad - d)))
    P = page_tables.shape[1]
    T = P * page_size
    if pages_per_chunk <= 0:
        pages_per_chunk = max(1, min(P, 512 // page_size))
    P_pad = math.ceil(P / pages_per_chunk) * pages_per_chunk
    if P_pad != P:
        page_tables = jnp.pad(page_tables, ((0, 0), (0, P_pad - P)))
    max_chunks = P_pad // pages_per_chunk
    chunk_t = pages_per_chunk * page_size
    T_pad = max_chunks * chunk_t

    layer = jnp.asarray(layer_id, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, h, d_pad), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, h), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, 1, T_pad), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_t, d_pad), idx_pool.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _idx_kernel,
            page_size=page_size,
            pages_per_chunk=pages_per_chunk,
            max_chunks=max_chunks,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, T_pad), jnp.float32),
        interpret=interpret,
    )(
        layer, page_tables, seq_lens,
        q_idx, w.astype(jnp.float32)[:, None, :], idx_pool,
    )
    return out[:, 0, :T]


def supported(page_size: int, h: int, num_pages: int) -> bool:
    """Mosaic constraints: lane-aligned chunk stores + sublane-friendly
    head count (mirrors the wrapper's pages_per_chunk default)."""
    ppc = max(1, min(num_pages, 512 // page_size))
    return (ppc * page_size) % 128 == 0 and h % 8 == 0


def dsa_pallas_mode() -> str:
    import os

    mode = os.environ.get("SFT_DSA_PALLAS", "auto")
    if mode == "auto":
        return "auto" if jax.default_backend() == "tpu" else "off"
    return mode
