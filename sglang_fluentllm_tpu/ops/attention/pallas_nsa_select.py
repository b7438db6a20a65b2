"""Pallas NSA select-branch decode kernel (top-k block attention).

Reads ONLY the selected blocks' tokens from the paged pool — the sparse
NSA contract (reference ``native_sparse_attention/select_attn.py``, 494
LoC Triton): per (row, kv-head), the top-k select blocks chosen from the
compressed-branch probabilities are DMA'd from HBM and attended.

Work decomposition (round-5 v2): ONE work item per (row, kv head) that
issues ALL Ksel block-pair DMAs at once and runs a single softmax over
the [G_PAD, Ksel*ss] score tile. The v1 kernel used one work item per
(row, head, block) with a streaming softmax — 512 sequential small
items at the 8k bench geometry, whose per-item fixed cost (DMA latency
+ tiny vector ops) made the sparse path 12x SLOWER than dense
(perf/nsa_decode_r5.log). Fewer, fatter items put every DMA in flight
together and feed the MXU one fat tile.

Invalid block slots (id < 0, top-k padding) DMA page 0 (the pool's
scratch page) so start/wait counts stay unconditional; their columns are
masked in the score tile. Requires ``select_size % 8 == 0`` and one of
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
    k_buf,             # [nbuf, Ksel, ss, D] VMEM
    v_buf,
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
    n_work = rows * Hk

    def row_of(t):
        return blk * rows + t // Hk

    def head_of(t):
        return t % Hk

    def block_start(t, j):
        """First pool slot of select block j (clamped for invalid)."""
        b = row_of(t)
        ts = jnp.maximum(top_blk_ref[b, head_of(t), j], 0) * ss
        if ss >= ps:
            return page_tables_ref[b, ts // ps] * ps
        page = page_tables_ref[b, ts // ps]
        return page * ps + ts % ps

    def all_dmas(slot, t):
        h = head_of(t)
        out = []
        for j in range(ksel):
            start = block_start(t, j)
            out.append(pltpu.make_async_copy(
                k_hbm.at[layer, h, pl.ds(start, ss), :],
                k_buf.at[slot, j], sem.at[slot, 0],
            ))
            out.append(pltpu.make_async_copy(
                v_hbm.at[layer, h, pl.ds(start, ss), :],
                v_buf.at[slot, j], sem.at[slot, 1],
            ))
        return out

    def fixup_dmas(slot, t):
        """Per-page patches when a block's pages are not a physical run
        (ss >= ps case only)."""
        if ss < ps or run_only:
            return []
        b = row_of(t)
        h = head_of(t)
        npg = ss // ps
        n_pages = pl.cdiv(seq_lens_ref[b], ps)
        out = []
        for j in range(ksel):
            ts = jnp.maximum(top_blk_ref[b, h, j], 0) * ss
            first = page_tables_ref[b, ts // ps]
            for i in range(npg):
                page = page_tables_ref[b, ts // ps + i]
                bad = (page != first + i) & (ts // ps + i < n_pages)
                grp = [
                    pltpu.make_async_copy(
                        k_hbm.at[layer, h, pl.ds(page * ps, ps), :],
                        k_buf.at[slot, j, pl.ds(i * ps, ps), :],
                        sem.at[slot, 0],
                    ),
                    pltpu.make_async_copy(
                        v_hbm.at[layer, h, pl.ds(page * ps, ps), :],
                        v_buf.at[slot, j, pl.ds(i * ps, ps), :],
                        sem.at[slot, 1],
                    ),
                ]
                out.append((bad, grp))
        return out

    def start(slot, t):
        for dma in all_dmas(slot, t):
            dma.start()

    def wait_and_fixup(slot, t):
        for dma in all_dmas(slot, t):
            dma.wait()
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

    for t0 in range(min(nbuf - 1, n_work)):
        start(t0 % nbuf, t0)

    def body(t, carry):
        r = t // Hk
        h = head_of(t)
        b = row_of(t)
        slot = jax.lax.rem(t, nbuf)

        t_ahead = t + nbuf - 1

        @pl.when(t_ahead < n_work)
        def _():
            start(jax.lax.rem(t_ahead, nbuf), t_ahead)

        wait_and_fixup(slot, t)
        seq_len = seq_lens_ref[b]
        qh = q_ref[r, h]                         # [G_PAD, D]
        D = qh.shape[-1]
        k = k_buf[slot].reshape(ksel * ss, D)
        v = v_buf[slot].reshape(ksel * ss, D)
        s = jax.lax.dot_general(
            qh, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [G_PAD, ksel*ss]
        # mask per block: invalid block or token >= seq_len
        iota = jax.lax.broadcasted_iota(jnp.int32, (G_PAD, ksel * ss), 1)
        col_in_blk = jax.lax.rem(iota, ss)
        mask = jnp.zeros((G_PAD, ksel * ss), jnp.bool_)
        for j in range(ksel):
            bj = top_blk_ref[b, h, j]
            mj = (
                (iota >= j * ss) & (iota < (j + 1) * ss)
                & (bj >= 0)
                & (bj * ss + col_in_blk < seq_len)
            )
            mask = mask | mj
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(mask, p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-20)
        o_ref[r, h] = o.astype(o_ref.dtype)
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

    nbuf = 2
    buf_bytes = Ksel * select_size * Dp * k_cache.dtype.itemsize * 2
    while nbuf > 1 and nbuf * buf_bytes > 16 * 1024 * 1024:
        nbuf -= 1

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
            pltpu.VMEM((nbuf, Ksel, select_size, Dp), k_cache.dtype),
            pltpu.VMEM((nbuf, Ksel, select_size, Dp), v_cache.dtype),
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
