"""Pallas paged decode attention (MHA/GQA).

TPU-native replacement for the reference's flashinfer/flashmla decode path
(``layers/attention/flashinfer_backend.py`` role). One grid cell per
(batch row, kv head): the G = Hq/Hk query heads attend over that request's
paged KV, streamed page-group by page-group from HBM into double-buffered
VMEM scratch via async DMA, with an online-softmax accumulator — flash
attention over a page table, no dense gather ever materialized.

Layout contract (mem/kv_cache.py): ``k/v: [H_kv, slots, D]`` where page ``p``
occupies the contiguous slot block ``[p*page_size, (p+1)*page_size)``; page 0
is padding. ``page_tables: [B, P]`` (padded with 0), ``seq_lens: [B]``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    page_tables_ref,   # [B, P] int32 (SMEM)
    seq_lens_ref,      # [B] int32 (SMEM)
    # inputs
    q_ref,             # [1, 1, G, D] VMEM (this batch row, this kv head)
    k_hbm,             # [H_kv, num_pages, page_size, D] HBM
    v_hbm,             # [H_kv, num_pages, page_size, D] HBM
    # outputs
    o_ref,             # [1, 1, G, D] VMEM
    # scratch
    k_buf,             # [2, PPC, page_size, D] VMEM
    v_buf,             # [2, PPC, page_size, D] VMEM
    sem,               # DMA sems [2, 2]
    *,
    page_size: int,
    pages_per_chunk: int,
    sm_scale: float,
    logit_cap: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    chunk_t = pages_per_chunk * page_size
    seq_len = seq_lens_ref[b]
    num_chunks = pl.cdiv(seq_len, chunk_t)
    max_chunks = pl.cdiv(page_tables_ref.shape[1], pages_per_chunk)

    def page_dmas(slot, c):
        dmas = []
        for i in range(pages_per_chunk):
            page = page_tables_ref[b, c * pages_per_chunk + i]
            dmas.append(pltpu.make_async_copy(
                k_hbm.at[h, page], k_buf.at[slot, i], sem.at[slot, 0],
            ))
            dmas.append(pltpu.make_async_copy(
                v_hbm.at[h, page], v_buf.at[slot, i], sem.at[slot, 1],
            ))
        return dmas

    def start_chunk(slot, c):
        for dma in page_dmas(slot, c):
            dma.start()

    def wait_chunk(slot, c):
        # each .wait() consumes one completion on its semaphore
        for dma in page_dmas(slot, c):
            dma.wait()

    start_chunk(0, 0)

    q = q_ref[0, 0]  # [G, D], native dtype (bf16 in production)
    G = q.shape[0]

    def body(c, carry):
        acc, m, l = carry
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            start_chunk(next_slot, c + 1)

        wait_chunk(slot, c)
        k = k_buf[slot].reshape(chunk_t, -1)     # [T, D] native dtype
        v = v_buf[slot].reshape(chunk_t, -1)     # [T, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                             # [G, T] f32 accum
        if logit_cap > 0:
            s = logit_cap * jnp.tanh(s / logit_cap)
        col = (
            c * chunk_t
            + jax.lax.broadcasted_iota(jnp.int32, (G, chunk_t), 1)
        )
        s = jnp.where(col < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    D = q_ref.shape[3]
    acc0 = jnp.zeros((G, D), jnp.float32)
    m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((G, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_chunks, body, (acc0, m0, l0))
    # padded rows (seq_len == 0) never enter the loop: acc/l stay 0
    out = acc / jnp.maximum(l, 1e-20)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "sm_scale", "logit_cap", "pages_per_chunk"),
)
def paged_decode_attention(
    q: jax.Array,            # [B, Hq, D]
    k_cache: jax.Array,      # [H_kv, slots, D]
    v_cache: jax.Array,      # [H_kv, slots, D]
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,     # [B] int32
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: float = 0.0,
    pages_per_chunk: int = 0,
) -> jax.Array:
    B, Hq, D = q.shape
    Hk = k_cache.shape[0]
    G = Hq // Hk
    P = page_tables.shape[1]
    if pages_per_chunk <= 0:
        # target ~512-token chunks, but no more pages than the table has
        pages_per_chunk = max(1, min(P, 512 // page_size))
    # pad the page table so chunks divide it evenly
    P_pad = math.ceil(P / pages_per_chunk) * pages_per_chunk
    if P_pad != P:
        page_tables = jnp.pad(page_tables, ((0, 0), (0, P_pad - P)))

    q = q.reshape(B, Hk, G, D)
    # view the cache page-wise: [Hk, num_pages, page_size, D] (free reshape)
    k_cache = k_cache.reshape(Hk, -1, page_size, D)
    v_cache = v_cache.reshape(Hk, -1, page_size, D)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G, D), lambda b, h, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, D), lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_chunk, page_size, D), k_cache.dtype),
            pltpu.VMEM((2, pages_per_chunk, page_size, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    chunk_t = pages_per_chunk * page_size
    kernel = functools.partial(
        _decode_kernel,
        page_size=page_size,
        pages_per_chunk=pages_per_chunk,
        sm_scale=sm_scale,
        logit_cap=logit_cap,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hq * D * P_pad * page_size * 2,
            bytes_accessed=(
                B * Hk * P_pad * page_size * D * 2
                * k_cache.dtype.itemsize
            ),
            transcendentals=B * Hq * P_pad * page_size,
        ),
    )(page_tables, seq_lens, q, k_cache, v_cache)
    return out.reshape(B, Hq, D)
