"""Pallas NSA select-branch decode kernel (top-k block attention).

Reads ONLY the selected blocks' tokens from the paged pool — the sparse
NSA contract (reference ``native_sparse_attention/select_attn.py``, 494
LoC Triton): per (row, kv-head), the top-k select blocks chosen from the
compressed-branch probabilities are DMA'd from HBM and attended with a
streaming softmax. Bandwidth per (row, head) = top_n * select_size
tokens, independent of context length.

Design follows ``pallas_decode_multirow.py`` (same scalar-prefetch /
double-buffered DMA / aliased-pool conventions): one grid cell owns
``rows`` batch rows; work items are (row, kv head, select block); the
pool flows through as an aliased passthrough so the layer scan stays a
copy-free chain. The current token is already in the pool — the sparse
decode path runs the fused-write multirow (window-branch) kernel first.

Block DMA shapes: ``select_size`` consecutive tokens. With
``select_size >= page_size`` the block covers whole pages — fetched as
one coalesced run DMA plus per-page fixups (allocator hands out
sequential pages; see multirow's big_dmas). With ``page_size >
select_size`` the block sits inside one page — a single strided DMA.
Caller guarantees ``select_size % 8 == 0`` (sublane tile) and one of
``select_size % page_size == 0`` / ``page_size % select_size == 0``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
G_PAD = 8


def _sel_kernel(
    # scalar prefetch
    layer_ref,         # [1] int32
    page_tables_ref,   # [B, P] int32 (SMEM)
    seq_lens_ref,      # [B] int32
    top_blk_ref,       # [B, Hk, Ksel] int32 (-1 = skip)
    # inputs
    q_ref,             # [rows, Hk, G_PAD, D] VMEM (scaled)
    k_hbm,             # [L, Hk, slots, D] HBM
    v_hbm,             # [L, Hk, slots, D] HBM
    # outputs
    o_ref,             # [rows, Hk, G_PAD, D] VMEM
    k_out,             # aliased passthrough
    v_out,
    # scratch
    k_buf,             # [nbuf, ss, D] VMEM
    v_buf,
    acc_ref,           # [G_PAD, D] f32
    m_ref,             # [G_PAD, 128] f32
    l_ref,             # [G_PAD, 128] f32
    sem,               # DMA sems [nbuf, 2]
    *,
    rows: int,
    nbuf: int,
    page_size: int,
    select_size: int,
    ksel: int,
    num_kv_heads: int,
    run_only: bool,
):
    blk = pl.program_id(0)
    layer = layer_ref[0]
    ps = page_size
    ss = select_size
    Hk = num_kv_heads
    per_row = Hk * ksel
    n_work = rows * per_row

    def row_of(t):
        return blk * rows + t // per_row

    def head_of(t):
        return (t // ksel) % Hk

    def j_of(t):
        return t % ksel

    def blk_of(t):
        return top_blk_ref[row_of(t), head_of(t), j_of(t)]

    def valid(t):
        return blk_of(t) >= 0

    def big_dmas(slot, t):
        b = row_of(t)
        h = head_of(t)
        ts = jnp.maximum(blk_of(t), 0) * ss
        if ss >= ps:
            first = page_tables_ref[b, ts // ps]
            start = first * ps
        else:
            page = page_tables_ref[b, ts // ps]
            start = page * ps + ts % ps
        return [
            pltpu.make_async_copy(
                k_hbm.at[layer, h, pl.ds(start, ss), :],
                k_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, h, pl.ds(start, ss), :],
                v_buf.at[slot], sem.at[slot, 1],
            ),
        ]

    def fixup_dmas(slot, t):
        """Per-page patches when the block's pages are not a physical
        run (ss >= ps case only)."""
        if ss < ps:
            return []
        b = row_of(t)
        h = head_of(t)
        ts = jnp.maximum(blk_of(t), 0) * ss
        first = page_tables_ref[b, ts // ps]
        npg = ss // ps
        n_pages = pl.cdiv(seq_lens_ref[b], ps)
        out = []
        for i in range(npg):
            page = page_tables_ref[b, ts // ps + i]
            bad = (page != first + i) & (ts // ps + i < n_pages)
            grp = [
                pltpu.make_async_copy(
                    k_hbm.at[layer, h, pl.ds(page * ps, ps), :],
                    k_buf.at[slot, pl.ds(i * ps, ps), :],
                    sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    v_hbm.at[layer, h, pl.ds(page * ps, ps), :],
                    v_buf.at[slot, pl.ds(i * ps, ps), :],
                    sem.at[slot, 1],
                ),
            ]
            out.append((bad, grp))
        return out

    def start(slot, t):
        for dma in big_dmas(slot, t):
            dma.start()

    def wait_and_fixup(slot, t):
        for dma in big_dmas(slot, t):
            dma.wait()
        if run_only or ss < ps:
            return
        fixes = fixup_dmas(slot, t)
        for cond, grp in fixes:
            @pl.when(cond)
            def _():
                for dma in grp:
                    dma.start()
        for cond, grp in fixes:
            @pl.when(cond)
            def _():
                for dma in grp:
                    dma.wait()

    o_ref[:] = jnp.zeros_like(o_ref)

    for t0 in range(min(nbuf - 1, n_work)):
        @pl.when(valid(t0))
        def _(t0=t0):
            start(t0 % nbuf, t0)

    def body(t, carry):
        r = t // per_row
        h = head_of(t)
        j = j_of(t)
        slot = jax.lax.rem(t, nbuf)
        b = row_of(t)

        t_ahead = jnp.minimum(t + nbuf - 1, n_work - 1)

        @pl.when((t + nbuf - 1 < n_work) & valid(t_ahead))
        def _():
            start(jax.lax.rem(t_ahead, nbuf), t_ahead)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        @pl.when(valid(t))
        def _():
            wait_and_fixup(slot, t)
            ts = blk_of(t) * ss
            seq_len = seq_lens_ref[b]
            qh = q_ref[r, h]                     # [G_PAD, D]
            k = k_buf[slot]                      # [ss, D]
            v = v_buf[slot]
            s = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # [G_PAD, ss]
            col = ts + jax.lax.broadcasted_iota(
                jnp.int32, (G_PAD, ss), 1)
            s = jnp.where(col < seq_len, s, NEG_INF)
            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(j == ksel - 1)
        def _():
            l = l_ref[:, :1]
            o_ref[r, h] = (
                acc_ref[:] / jnp.maximum(l, 1e-20)
            ).astype(o_ref.dtype)

        return carry

    jax.lax.fori_loop(0, n_work, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("select_size", "page_size", "rows", "run_only"),
)
def nsa_select_decode(
    q: jax.Array,            # [B, Hk, G, D] (ALREADY sm_scale-scaled)
    k_cache: jax.Array,      # [L, Hk, slots, D]
    v_cache: jax.Array,
    layer_id: jax.Array,     # scalar int32
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,     # [B] int32 (including current token)
    top_blk: jax.Array,      # [B, Hk, Ksel] int32, -1 = skip
    *,
    select_size: int,
    page_size: int,
    rows: int = 8,
    run_only: bool = False,
):
    B, Hk, G, D = q.shape
    Dp = k_cache.shape[-1]
    Ksel = top_blk.shape[-1]
    assert G <= G_PAD, f"q-group {G} > {G_PAD}"
    assert select_size % 8 == 0
    assert select_size % page_size == 0 or page_size % select_size == 0
    rows = max(1, min(rows, B))
    B_pad = math.ceil(B / rows) * rows
    qs = q
    if Dp != D:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    if G != G_PAD:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, G_PAD - G), (0, 0)))
    if B_pad != B:
        qs = jnp.pad(qs, ((0, B_pad - B), (0, 0), (0, 0), (0, 0)))
        page_tables = jnp.pad(page_tables, ((0, B_pad - B), (0, 0)))
        seq_lens = jnp.pad(seq_lens, (0, B_pad - B))
        top_blk = jnp.pad(
            top_blk, ((0, B_pad - B), (0, 0), (0, 0)),
            constant_values=-1,
        )
    qs = qs.astype(k_cache.dtype)

    nbuf = 8
    buf_bytes = select_size * Dp * k_cache.dtype.itemsize * 2
    while nbuf > 2 and nbuf * buf_bytes > 8 * 1024 * 1024:
        nbuf //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B_pad // rows,),
        in_specs=[
            pl.BlockSpec(
                (rows, Hk, G_PAD, Dp), lambda blk, *_: (blk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (rows, Hk, G_PAD, Dp), lambda blk, *_: (blk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, select_size, Dp), k_cache.dtype),
            pltpu.VMEM((nbuf, select_size, Dp), v_cache.dtype),
            pltpu.VMEM((G_PAD, Dp), jnp.float32),
            pltpu.VMEM((G_PAD, 128), jnp.float32),
            pltpu.VMEM((G_PAD, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
        ],
    )
    kernel = functools.partial(
        _sel_kernel,
        rows=rows,
        nbuf=nbuf,
        page_size=page_size,
        select_size=select_size,
        ksel=Ksel,
        num_kv_heads=Hk,
        run_only=run_only,
    )
    layer_in = jnp.asarray(layer_id, jnp.int32).reshape(1)
    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, Hk, G_PAD, Dp), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * Hk * G_PAD * Dp * Ksel * select_size * 2,
            bytes_accessed=(
                B_pad * Hk * Ksel * select_size * Dp * 2
                * k_cache.dtype.itemsize
            ),
            transcendentals=B_pad * Hk * G_PAD * Ksel * select_size,
        ),
    )(layer_in, page_tables, seq_lens,
      jnp.asarray(top_blk, jnp.int32), qs, k_cache, v_cache)
    return out[:B, :, :G, :], k_cache, v_cache
