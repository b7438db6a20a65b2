"""Multi-row Pallas MLA decode kernels (bf16 latents + FP8 per-token KV).

TPU-native flashmla analog (reference ``layers/attention/flashmla_backend.py``
— base module and the FP8 per-token-KV module ``flash_mla_ckv_fp8_per_token``
``:127,208``, the SnapMLA north star). Absorbed MLA decode is MQA over the
compressed latents:

    q_eff  = [q_nope @ W_kc | q_pe]     # [B, H, r + dr]
    s      = q_eff . k_token            # k_token = [ckv | rope]
    ctx    = softmax(s) . ckv           # latent context, [B, H, r]

Two cache layouts (mem/kv_cache.py):

- **bf16**: combined latent rows ``lat[L, slots, r_pad + rope_pad]``; one
  stream per token; V is the first ``r`` lanes of K.
- **fp8**: ``ckv8[L, slots, r]`` float8_e4m3fn + packed bf16
  ``tail[L, slots, tail_pad]`` = ``[rope | scale_hi | scale_lo]``. The
  kernel dequantizes per token ON LOAD in VMEM — ``k = fp8(ckv) * scale``
  — so HBM sees 1 byte/latent-dim instead of 2 (the SnapMLA win), and the
  f32 scale is reconstructed from its two-bf16 split.

Same structural design as ``pallas_decode_multirow``: row blocks, stacked
layer input (no per-layer pool copy), page-run coalesced DMA with per-page
fallback, double buffering across the flat (row, chunk) work list. The run
fast-path may over-read one chunk past the last valid page (pool keeps
``RUN_SLACK_PAGES`` spare pages).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
    RUN_SLACK_PAGES,  # noqa: F401  (re-export: shared pool contract)
)

NEG_INF = -1e30


def _e4m3_to_bf16(x):
    """fp8 latent -> bf16 for the MXU via manual integer widening
    (bf16_bits = s<<15 | (e+120)<<7 | m<<4, denormals -> signed zero).

    Mosaic's native e4m3 convert was THE fp8-KV kernel bottleneck:
    0.58x of bf16-KV at 8k ctx with astype, 0.92x with this path
    (perf/mla_kernel_longctx_r5.log vs mla_kernel_bitcast_r5.log).
    Denormal flush loses values < 2^-6 * scale — <= 1.4e-2 absolute on
    unit-scaled latents, below the kernel's parity tolerance.
    SFT_MLA_FP8_BITCAST=0 restores the exact native convert."""
    import os

    if os.environ.get("SFT_MLA_FP8_BITCAST", "1") == "0":
        return x.astype(jnp.bfloat16)
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    s = jnp.left_shift(jnp.right_shift(u, 7) & 1, 15)
    e = jnp.right_shift(u, 3) & 0xF
    m = u & 7
    bits = s | jnp.left_shift(e + 120, 7) | jnp.left_shift(m, 4)
    bits = jnp.where(e == 0, s, bits)  # denormals -> signed zero
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16)


def _mla_kernel(
    # scalar prefetch
    layer_ref,         # [1] int32
    page_tables_ref,   # [B, P] int32
    seq_lens_ref,      # [B] int32
    new_slots_ref,     # [B] int32 (fused write)
    # inputs
    q_ref,             # [rows, H, Dq] VMEM (scaled q_eff)
    c0_hbm,            # lat [L, slots, Dl] | ckv8 [L, slots, r]
    *rest,
    # static
    rows: int,
    page_size: int,
    pages_per_chunk: int,
    max_chunks: int,
    r_dim: int,
    rope_dr: int,
    fp8: bool,
    run_only: bool,
    fused_write: bool,
):
    if fp8:
        (c1_hbm, n0_ref, n1_ref, o_ref, c0_out, c1_out, b0, b1,
         acc_ref, m_ref, l_ref, g0_ref, g1_ref, sem, wsem) = rest
    else:
        (n0_ref, o_ref, c0_out, b0, acc_ref, m_ref, l_ref, g0_ref,
         sem, wsem) = rest
        c1_hbm = None
        n1_ref = None
        g1_ref = None
        b1 = None

    blk = pl.program_id(0)
    layer = layer_ref[0]
    ps = page_size
    ppc = pages_per_chunk
    chunk_t = ppc * ps
    n_work = rows * max_chunks
    H = q_ref.shape[1]

    def row_of(t):
        return blk * rows + t // max_chunks

    def chunk_of(t):
        return t % max_chunks

    def big_dmas(slot, t):
        b = row_of(t)
        c = chunk_of(t)
        first = page_tables_ref[b, c * ppc]
        out = [pltpu.make_async_copy(
            c0_hbm.at[layer, pl.ds(first * ps, chunk_t), :],
            b0.at[slot], sem.at[slot, 0],
        )]
        if fp8:
            out.append(pltpu.make_async_copy(
                c1_hbm.at[layer, pl.ds(first * ps, chunk_t), :],
                b1.at[slot], sem.at[slot, 1],
            ))
        return out

    def fixup_dmas(slot, t):
        b = row_of(t)
        c = chunk_of(t)
        first = page_tables_ref[b, c * ppc]
        n_pages = pl.cdiv(seq_lens_ref[b], ps)
        out = []
        for i in range(ppc):
            page = page_tables_ref[b, c * ppc + i]
            bad = (page != first + i) & (c * ppc + i < n_pages)
            grp = [pltpu.make_async_copy(
                c0_hbm.at[layer, pl.ds(page * ps, ps), :],
                b0.at[slot, pl.ds(i * ps, ps), :],
                sem.at[slot, 0],
            )]
            if fp8:
                grp.append(pltpu.make_async_copy(
                    c1_hbm.at[layer, pl.ds(page * ps, ps), :],
                    b1.at[slot, pl.ds(i * ps, ps), :],
                    sem.at[slot, 1],
                ))
            out.append((bad, grp))
        return out

    def start(slot, t):
        for dma in big_dmas(slot, t):
            dma.start()

    def wait_and_fixup(slot, t):
        for dma in big_dmas(slot, t):
            dma.wait()
        if run_only:
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

    def valid(t):
        b = row_of(t)
        nc = pl.cdiv(seq_lens_ref[b], chunk_t)
        return chunk_of(t) < nc

    o_ref[:] = jnp.zeros_like(o_ref)

    if fused_write:
        # In-kernel write of the current token's latent row, as an RMW on
        # the tile-aligned group containing the slot (Mosaic forbids
        # slicing the pool's slot dim below its 8-sublane XLA tile; see
        # pallas_decode_multirow._mr_kernel).  Groups never span pages and
        # a decode row's newest page is its own, so no cross-row races.
        GK = g0_ref.shape[1]

        def rmw(read):
            dmas = []
            for r in range(rows):
                slot = new_slots_ref[blk * rows + r]
                base = (slot // GK) * GK
                p0 = c0_hbm.at[layer, pl.ds(base, GK), :]
                pairs = [(p0, g0_ref.at[r])]
                if fp8:
                    p1 = c1_hbm.at[layer, pl.ds(base, GK), :]
                    pairs.append((p1, g1_ref.at[r]))
                for hbm, vmem in pairs:
                    if read:
                        dmas.append(pltpu.make_async_copy(hbm, vmem, wsem))
                    else:
                        dmas.append(pltpu.make_async_copy(vmem, hbm, wsem))
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()

        rmw(True)
        sub = jax.lax.broadcasted_iota(jnp.int32, (GK, 1), 0)
        for r in range(rows):
            slot = new_slots_ref[blk * rows + r]
            msk = sub == slot % GK
            if fp8:
                # select in bf16 (8-bit select is unsupported on the VPU;
                # e4m3 -> bf16 -> e4m3 is exact)
                g0_ref[r] = jnp.where(
                    msk, n0_ref[r].astype(jnp.bfloat16),
                    g0_ref[r].astype(jnp.bfloat16),
                ).astype(g0_ref.dtype)
                g1_ref[r] = jnp.where(msk, n1_ref[r], g1_ref[r])
            else:
                g0_ref[r] = jnp.where(msk, n0_ref[r], g0_ref[r])
        rmw(False)

    @pl.when(valid(0))
    def _():
        start(0, 0)

    def body(t, carry):
        b = row_of(t)
        c = chunk_of(t)
        nc = pl.cdiv(seq_lens_ref[b], chunk_t)
        slot = jax.lax.rem(t, 2)
        t_next = jnp.minimum(t + 1, n_work - 1)

        @pl.when((t + 1 < n_work) & valid(t_next))
        def _():
            start(jax.lax.rem(t + 1, 2), t_next)

        @pl.when(valid(t))
        def _():
            wait_and_fixup(slot, t)

            @pl.when(c == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)
                m_ref[:] = jnp.full_like(m_ref, NEG_INF)
                l_ref[:] = jnp.zeros_like(l_ref)

            seq_len = seq_lens_ref[b]
            r = t // max_chunks
            q = q_ref[r]                             # [H, Dq]
            if fp8:
                ckv8 = b0[slot]                      # [chunk_t, r_dim] fp8
                tail = b1[slot]                      # [chunk_t, tail_pad]
                # f32 per-token scale from its two-bf16 split (lane
                # positions rope_dr, rope_dr+1; q is zero on those lanes)
                scale = (
                    tail[:, rope_dr].astype(jnp.float32)
                    + tail[:, rope_dr + 1].astype(jnp.float32)
                )[None, :]                           # [1, chunk_t]
                # scale factors OUT of the wide [chunk_t, r_dim] K/V and
                # into the small [H, chunk_t] score/prob tensors: one
                # exact e4m3->bf16 cast replaces the f32 dequant chain
                # (was ~2x decode-kernel slowdown vs bf16 KV, the
                # opposite of the SnapMLA intent)
                k8b = _e4m3_to_bf16(ckv8)            # exact cast
                s = jax.lax.dot_general(
                    q[:, :r_dim], k8b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                s += jax.lax.dot_general(
                    q[:, r_dim:], tail.astype(q.dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                v = k8b
                v_colscale = scale                   # applied to P below
            else:
                k = b0[slot]                         # [chunk_t, Dl]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                v = k[:, :r_dim]
                v_colscale = None

            col = (
                c * chunk_t
                + jax.lax.broadcasted_iota(jnp.int32, (H, chunk_t), 1)
            )
            s = jnp.where(col < seq_len, s, NEG_INF)
            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            if v_colscale is not None:
                # fold the per-token KV scale into P (f32) instead of
                # dequantizing V: ctx = (P * scale) . fp8(V)-as-bf16
                p = p * v_colscale
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

            @pl.when(c == nc - 1)
            def _():
                l = l_ref[:, :1]
                o_ref[r] = (
                    acc_ref[:] / jnp.maximum(l, 1e-20)
                ).astype(o_ref.dtype)

        return carry

    jax.lax.fori_loop(0, n_work, body, 0)


def _common(q_eff, page_tables, seq_lens, page_size, pages_per_chunk, rows):
    B, H, Dq = q_eff.shape
    P = page_tables.shape[1]
    if pages_per_chunk <= 0:
        pages_per_chunk = max(1, min(P, 512 // page_size))
    P_pad = math.ceil(P / pages_per_chunk) * pages_per_chunk
    if P_pad != P:
        page_tables = jnp.pad(page_tables, ((0, 0), (0, P_pad - P)))
    max_chunks = P_pad // pages_per_chunk
    rows = max(1, min(rows, B))
    B_pad = math.ceil(B / rows) * rows
    if B_pad != B:
        q_eff = jnp.pad(q_eff, ((0, B_pad - B), (0, 0), (0, 0)))
        page_tables = jnp.pad(page_tables, ((0, B_pad - B), (0, 0)))
        seq_lens = jnp.pad(seq_lens, (0, B_pad - B))
    return (q_eff, page_tables, seq_lens, pages_per_chunk, max_chunks,
            rows, B_pad)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "sm_scale", "r_dim", "pages_per_chunk",
                     "rows", "run_only"),
)
def mla_decode_multirow(
    q_eff: jax.Array,        # [B, H, Dl] (q_abs | 0pad | q_pe | 0pad)
    lat: jax.Array,          # [L, slots, Dl] bf16 combined latents
    layer_id: jax.Array,
    page_tables: jax.Array,  # [B, P]
    seq_lens: jax.Array,     # [B]
    lat_new: jax.Array = None,   # [B, Dl] fused write (current token row)
    new_slots: jax.Array = None,
    *,
    page_size: int,
    sm_scale: float,
    r_dim: int,              # kv_lora_rank (V = first r_dim lanes)
    pages_per_chunk: int = 0,
    rows: int = 8,
    run_only: bool = False,
) -> jax.Array:
    """bf16 path; returns latent context [B, H, r_dim]."""
    B, H, Dl = q_eff.shape
    fused_write = lat_new is not None
    GK = 8  # pool slot-dim slices must align to the 8-sublane XLA tile
    if not fused_write:
        lat_new = jnp.zeros((B, Dl), lat.dtype)
        new_slots = jnp.zeros((B,), jnp.int32)
    lat_new = lat_new.astype(lat.dtype)
    B_in = B
    (q_eff, page_tables, seq_lens, ppc, max_chunks, rows, B_pad) = _common(
        q_eff, page_tables, seq_lens, page_size, pages_per_chunk, rows
    )
    if B_pad != B_in:
        lat_new = jnp.pad(lat_new, ((0, B_pad - B_in), (0, 0)))
        new_slots = jnp.pad(new_slots, (0, B_pad - B_in))
    new_slots = jnp.asarray(new_slots, jnp.int32)
    lat_new = jnp.broadcast_to(lat_new[:, None], (B_pad, GK, Dl))
    layer_id = jnp.asarray(layer_id, jnp.int32).reshape(1)
    qs = (q_eff.astype(jnp.float32) * sm_scale).astype(lat.dtype)
    chunk_t = ppc * page_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, H, Dl), lambda blk, *_: (blk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, GK, Dl), lambda blk, *_: (blk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (rows, H, r_dim), lambda blk, *_: (blk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_t, Dl), lat.dtype),
            pltpu.VMEM((H, r_dim), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((rows, GK, Dl), lat.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _mla_kernel, rows=rows, page_size=page_size, pages_per_chunk=ppc,
        max_chunks=max_chunks, r_dim=r_dim, rope_dr=0, fp8=False,
        run_only=run_only, fused_write=fused_write,
    )
    out, lat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, H, r_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct(lat.shape, lat.dtype),
        ),
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * H * Dl * max_chunks * chunk_t * 2,
            bytes_accessed=(
                B_pad * max_chunks * chunk_t * Dl * lat.dtype.itemsize
            ),
            transcendentals=B_pad * H * max_chunks * chunk_t,
        ),
    )(layer_id, page_tables, seq_lens, new_slots, qs, lat, lat_new)
    return out[:B], lat


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "sm_scale", "rope_dr", "pages_per_chunk",
                     "rows", "run_only"),
)
def mla_decode_multirow_fp8(
    q_eff: jax.Array,        # [B, H, r + tail_pad] (q_abs | q_pe | 0)
    ckv8: jax.Array,         # [L, slots, r] float8_e4m3fn
    tail: jax.Array,         # [L, slots, tail_pad] bf16 (rope|scale hi/lo)
    layer_id: jax.Array,
    page_tables: jax.Array,
    seq_lens: jax.Array,
    ckv8_new: jax.Array = None,  # [B, r] fp8 fused-write row
    tail_new: jax.Array = None,  # [B, tail_pad] bf16
    new_slots: jax.Array = None,
    *,
    page_size: int,
    sm_scale: float,
    rope_dr: int,            # qk_rope_head_dim (scale at lanes dr, dr+1)
    pages_per_chunk: int = 0,
    rows: int = 8,
    run_only: bool = False,
) -> jax.Array:
    """FP8 path with fused per-token dequant; returns [B, H, r] bf16."""
    B, H, Dq = q_eff.shape
    r_dim = ckv8.shape[-1]
    tail_pad = tail.shape[-1]
    assert Dq == r_dim + tail_pad
    fused_write = ckv8_new is not None
    GK = 8  # pool slot-dim slices must align to the 8-sublane XLA tile
    if not fused_write:
        ckv8_new = jnp.zeros((B, r_dim), ckv8.dtype)
        tail_new = jnp.zeros((B, tail_pad), tail.dtype)
        new_slots = jnp.zeros((B,), jnp.int32)
    B_in = B
    (q_eff, page_tables, seq_lens, ppc, max_chunks, rows, B_pad) = _common(
        q_eff, page_tables, seq_lens, page_size, pages_per_chunk, rows
    )
    if B_pad != B_in:
        ckv8_new = jnp.pad(ckv8_new, ((0, B_pad - B_in), (0, 0)))
        tail_new = jnp.pad(tail_new, ((0, B_pad - B_in), (0, 0)))
        new_slots = jnp.pad(new_slots, (0, B_pad - B_in))
    new_slots = jnp.asarray(new_slots, jnp.int32)
    ckv8_new = jnp.broadcast_to(ckv8_new[:, None], (B_pad, GK, r_dim))
    tail_new = jnp.broadcast_to(tail_new[:, None], (B_pad, GK, tail_pad))
    layer_id = jnp.asarray(layer_id, jnp.int32).reshape(1)
    qs = (q_eff.astype(jnp.float32) * sm_scale).astype(jnp.bfloat16)
    chunk_t = ppc * page_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, H, Dq), lambda blk, *_: (blk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, GK, r_dim), lambda blk, *_: (blk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, GK, tail_pad), lambda blk, *_: (blk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (rows, H, r_dim), lambda blk, *_: (blk, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_t, r_dim), ckv8.dtype),
            pltpu.VMEM((2, chunk_t, tail_pad), tail.dtype),
            pltpu.VMEM((H, r_dim), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((rows, GK, r_dim), ckv8.dtype),
            pltpu.VMEM((rows, GK, tail_pad), tail.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _mla_kernel, rows=rows, page_size=page_size, pages_per_chunk=ppc,
        max_chunks=max_chunks, r_dim=r_dim, rope_dr=rope_dr, fp8=True,
        run_only=run_only, fused_write=fused_write,
    )
    out, ckv8, tail = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, H, r_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct(ckv8.shape, ckv8.dtype),
            jax.ShapeDtypeStruct(tail.shape, tail.dtype),
        ),
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * H * Dq * max_chunks * chunk_t * 2,
            bytes_accessed=(
                B_pad * max_chunks * chunk_t * (r_dim + 2 * tail_pad)
            ),
            transcendentals=B_pad * H * max_chunks * chunk_t,
        ),
    )(layer_id, page_tables, seq_lens, new_slots, qs, ckv8, tail,
      ckv8_new, tail_new)
    return out[:B], ckv8, tail
