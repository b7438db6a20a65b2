"""Multi-row pipelined Pallas paged decode attention (MHA/GQA).

Second-generation decode kernel (replaces the per-(row, head) grid of
``pallas_decode.py`` and the stock ``jax.experimental`` paged kernel, whose
~100 us/call floors dominate short-context decode — reference role:
``layers/attention/flashinfer_backend.py`` decode path).

Design points that remove the per-call floor:

- **Row blocks**: one grid cell owns ``rows`` batch rows and all kv heads,
  cutting grid cells ~16x; the DMA for work item t+1 overlaps compute for
  work item t (double-buffered across the flattened (row, chunk) sequence).
- **Stacked-layer input**: takes the whole ``[L, Hk, slots, D]`` cache plus
  the layer index as a scalar, so calling it inside the layer ``lax.scan``
  does NOT materialize a per-layer dynamic-slice copy of the pool.
- **Page-run coalescing**: pages of a chunk that are physically consecutive
  (the common case — the allocator hands out sequential pages) are fetched
  with ONE strided DMA per (head, k/v) instead of per-page DMAs; scattered
  chunks fall back to per-page DMAs. The fast path may over-read up to one
  chunk past the last valid page, so the pool keeps ``RUN_SLACK_PAGES``
  spare pages at its end (see ``runtime/model_runner.py`` pool sizing).

Contract matches ``pallas_decode.paged_decode_attention``: page 0 is
padding, ``page_tables`` padded with 0, rows with ``seq_len == 0`` output 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# spare pages kept at the END of the KV pool so the run fast-path may
# over-read up to one chunk past the last valid page
RUN_SLACK_PAGES = 16

G_PAD = 8  # query-group dim padded to one f32 sublane tile


def _mr_kernel(
    # scalar prefetch
    layer_ref,         # [2] int32: [layer, sliding_window (0 = full)]
    page_tables_ref,   # [B, P] int32 (SMEM)
    seq_lens_ref,      # [B] int32 (SMEM)
    new_slots_ref,     # [B] int32 (fused write; all-zero when unused)
    # inputs
    q_ref,             # [rows, Hk, G_PAD, D] VMEM (scaled)
    k_hbm,             # [L, Hk, slots, D] HBM
    v_hbm,             # [L, Hk, slots, D] HBM
    sinks_ref,         # [Hk, G_PAD, 128] f32 (attention-sink logits;
                       # zeros dummy when use_sinks is False)
    kn_ref,            # [rows, Hk, GK, D] VMEM (current-token K, sublane-
    vn_ref,            # duplicated x GK; dummy zeros when not fused)
    # outputs
    o_ref,             # [rows, Hk, G_PAD, D] VMEM
    k_out,             # aliased passthrough of k_hbm (keeps the pool
    v_out,             # update chain in-place across the layer scan)
    # scratch
    k_buf,             # [2, Hk, chunk_t, D] VMEM
    v_buf,             # [2, Hk, chunk_t, D] VMEM
    acc_ref,           # [Hk, G_PAD, D] VMEM f32
    m_ref,             # [Hk, G_PAD, 128] VMEM f32
    l_ref,             # [Hk, G_PAD, 128] VMEM f32
    kpair,             # [rows, Hk, GK, D] VMEM (fused-write RMW staging)
    vpair,             # [rows, Hk, GK, D] VMEM
    sem,               # DMA sems [2, 2]
    wsem,              # fused-write DMA sem
    *,
    rows: int,
    nbuf: int,
    page_size: int,
    pages_per_chunk: int,
    max_chunks: int,
    num_kv_heads: int,
    logit_cap: float,
    run_only: bool,
    fused_write: bool,
    use_sinks: bool,
):
    blk = pl.program_id(0)
    layer = layer_ref[0]
    window = layer_ref[1]
    ps = page_size
    ppc = pages_per_chunk
    chunk_t = ppc * ps
    Hk = num_kv_heads
    n_work = rows * max_chunks

    def row_of(t):
        return blk * rows + t // max_chunks

    def chunk_of(t):
        return t % max_chunks

    def big_dmas(slot, t):
        """Unconditional chunk DMA assuming pages are the consecutive run
        starting at the chunk's first page (the common allocator layout;
        wrong pages are patched by fixup_dmas). One strided DMA moves ALL
        kv heads — the transfer was DMA-LATENCY bound, not BW bound, at
        short contexts (ablate_attention_cost.py), so fewer+larger copies
        and a deeper in-flight window are the wins."""
        b = row_of(t)
        c = chunk_of(t)
        first = page_tables_ref[b, c * ppc]
        return [
            pltpu.make_async_copy(
                k_hbm.at[layer, :, pl.ds(first * ps, chunk_t), :],
                k_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, :, pl.ds(first * ps, chunk_t), :],
                v_buf.at[slot], sem.at[slot, 1],
            ),
        ]

    def fixup_dmas(slot, t):
        """Per-page patch DMAs for pages that are NOT first+i; one
        predicate guards the whole (k, v) x heads group of a page."""
        b = row_of(t)
        c = chunk_of(t)
        first = page_tables_ref[b, c * ppc]
        n_pages = pl.cdiv(seq_lens_ref[b], ps)
        out = []
        for i in range(ppc):
            page = page_tables_ref[b, c * ppc + i]
            bad = (page != first + i) & (c * ppc + i < n_pages)
            grp = [
                pltpu.make_async_copy(
                    k_hbm.at[layer, :, pl.ds(page * ps, ps), :],
                    k_buf.at[slot, :, pl.ds(i * ps, ps), :],
                    sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    v_hbm.at[layer, :, pl.ds(page * ps, ps), :],
                    v_buf.at[slot, :, pl.ds(i * ps, ps), :],
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

    def hist(b):
        # tokens read from the pool: when the kernel itself stores the
        # current token, history excludes it (it is INJECTED into the
        # softmax init instead, so pool reads never wait on the write)
        sl = seq_lens_ref[b]
        return sl - 1 if fused_write else sl

    def lo(b):
        # sliding window: only positions >= seq_len - window are attended
        # (window includes the current token); 0 disables
        sl = seq_lens_ref[b]
        return jnp.where(
            window > 0, jnp.maximum(sl - window, 0), 0
        )

    def valid(t):
        # t is clamped by callers so row_of(t) stays in range
        b = row_of(t)
        nc = pl.cdiv(hist(b), chunk_t)
        return (chunk_of(t) < nc) & (chunk_of(t) >= lo(b) // chunk_t)

    o_ref[:] = jnp.zeros_like(o_ref)

    def rmw_dmas(read):
        # Current-token KV write as a read-modify-write of the
        # tile-aligned group [base, base+GK) around the slot: Mosaic
        # forbids slicing the pool's slot dim below its 8-sublane XLA
        # tile, so a single token row cannot be DMA'd directly.  Groups
        # never span pages (GK divides page_size) and a decode row's
        # newest page is exclusively its own, so groups never collide
        # across rows; padded rows all target the reserved padding page 0
        # and merge identical values (benign same-byte races).
        GK = kpair.shape[2]
        dmas = []
        for r in range(rows):
            slot = new_slots_ref[blk * rows + r]
            base = (slot // GK) * GK
            for h in range(Hk):
                pk = k_hbm.at[layer, h, pl.ds(base, GK), :]
                pv = v_hbm.at[layer, h, pl.ds(base, GK), :]
                if read:
                    dmas.append(pltpu.make_async_copy(
                        pk, kpair.at[r, h], wsem))
                    dmas.append(pltpu.make_async_copy(
                        pv, vpair.at[r, h], wsem))
                else:
                    dmas.append(pltpu.make_async_copy(
                        kpair.at[r, h], pk, wsem))
                    dmas.append(pltpu.make_async_copy(
                        vpair.at[r, h], pv, wsem))
        return dmas

    for t0 in range(min(nbuf - 1, rows * max_chunks)):
        @pl.when(valid(t0))
        def _(t0=t0):
            start(t0 % nbuf, t0)

    if fused_write:
        # the write only needs to be visible to the NEXT kernel call
        # (this one injects the token from VMEM), so the whole RMW
        # overlaps chunk DMAs + compute; the final wait is at block end
        rd = rmw_dmas(True)
        for dma in rd:
            dma.start()
        for dma in rd:
            dma.wait()
        GK = kpair.shape[2]
        sub = jax.lax.broadcasted_iota(jnp.int32, (GK, 1), 0)
        for r in range(rows):
            slot = new_slots_ref[blk * rows + r]
            msk = sub == slot % GK
            for h in range(Hk):
                kpair[r, h] = jnp.where(msk, kn_ref[r, h], kpair[r, h])
                vpair[r, h] = jnp.where(msk, vn_ref[r, h], vpair[r, h])
        wr = rmw_dmas(False)
        for dma in wr:
            dma.start()

    def body(t, carry):
        b = row_of(t)
        c = chunk_of(t)
        nc = pl.cdiv(hist(b), chunk_t)
        slot = jax.lax.rem(t, nbuf)

        t_ahead = jnp.minimum(t + nbuf - 1, n_work - 1)

        @pl.when((t + nbuf - 1 < n_work) & valid(t_ahead))
        def _():
            start(jax.lax.rem(t_ahead, nbuf), t_ahead)

        @pl.when(valid(t))
        def _():
            wait_and_fixup(slot, t)

            @pl.when(c == lo(b) // chunk_t)
            def _():
                if not fused_write:
                    acc_ref[:] = jnp.zeros_like(acc_ref)
                    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
                    l_ref[:] = jnp.zeros_like(l_ref)
                else:
                    # softmax state starts from the INJECTED current
                    # token: m = s_new, l = 1, acc = v_new
                    rr = t // max_chunks
                    for h in range(Hk):
                        qh = q_ref[rr, h]              # [G_PAD, D]
                        kn = kn_ref[rr, h][0:1]        # [1, D]
                        vn = vn_ref[rr, h][0:1]
                        # multiply-reduce, not dot_general: Mosaic's
                        # N=1 dot lowering emits an invalid cast
                        s_new = jnp.sum(
                            qh.astype(jnp.float32) * kn.astype(jnp.float32),
                            axis=1, keepdims=True,
                        )                              # [G_PAD, 1]
                        if logit_cap > 0:
                            s_new = logit_cap * jnp.tanh(s_new / logit_cap)
                        m_ref[h] = jnp.broadcast_to(s_new, m_ref.shape[1:])
                        l_ref[h] = jnp.ones_like(l_ref[h])
                        acc_ref[h] = (
                            vn.astype(jnp.float32)
                            + jnp.zeros(acc_ref.shape[1:], jnp.float32)
                        )

            seq_len = hist(b)
            r = t // max_chunks  # row within the block
            col = (
                c * chunk_t
                + jax.lax.broadcasted_iota(
                    jnp.int32, (G_PAD, chunk_t), 1
                )
            )
            for h in range(Hk):
                k = k_buf[slot, h]                 # [chunk_t, D]
                v = v_buf[slot, h]
                qh = q_ref[r, h]                   # [G_PAD, D]
                s = jax.lax.dot_general(
                    qh, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                  # [G_PAD, chunk_t]
                if logit_cap > 0:
                    s = logit_cap * jnp.tanh(s / logit_cap)
                s = jnp.where(
                    (col < seq_len) & (col >= lo(b)), s, NEG_INF
                )
                m_prev = m_ref[h, :, :1]
                l_prev = l_ref[h, :, :1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=1, keepdims=True)
                )
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
                l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

            @pl.when(c == nc - 1)
            def _():
                for h in range(Hk):
                    l = l_ref[h, :, :1]
                    if use_sinks:
                        # sink logit joins the denominator only
                        m = m_ref[h, :, :1]
                        l = l + jnp.exp(sinks_ref[h, :, :1] - m)
                    o_ref[r, h] = (
                        acc_ref[h] / jnp.maximum(l, 1e-20)
                    ).astype(o_ref.dtype)

        return carry

    jax.lax.fori_loop(0, n_work, body, 0)

    if fused_write:
        for dma in rmw_dmas(False):
            dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "sm_scale", "logit_cap", "pages_per_chunk", "rows",
        "run_only",
    ),
)
def paged_decode_multirow(
    q: jax.Array,            # [B, Hq, D] (unscaled)
    k_cache: jax.Array,      # [L, Hk, slots, D] (stacked layers)
    v_cache: jax.Array,      # [L, Hk, slots, D]
    layer_id: jax.Array,     # scalar int32
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,     # [B] int32 (INCLUDING the current token)
    k_new: jax.Array = None,  # [B, Hk, D] fused write (current token)
    v_new: jax.Array = None,
    new_slots: jax.Array = None,  # [B] pool slots for the current token
    window: jax.Array = 0,   # sliding window (scalar, may be traced; 0 =
                             # full attention; includes the current token)
    sinks: jax.Array = None,  # [Hq] f32 attention-sink logits (gpt-oss)
    *,
    page_size: int,
    sm_scale: float,
    logit_cap: float = 0.0,
    pages_per_chunk: int = 0,
    rows: int = 8,
    run_only: bool = False,
) -> jax.Array:
    B, Hq, D = q.shape
    Hk = k_cache.shape[1]
    G = Hq // Hk
    assert G <= G_PAD, f"q-group {G} > {G_PAD}: raise G_PAD"
    P = page_tables.shape[1]
    if pages_per_chunk <= 0:
        pages_per_chunk = max(1, min(P, 512 // page_size))
    P_pad = math.ceil(P / pages_per_chunk) * pages_per_chunk
    if P_pad != P:
        page_tables = jnp.pad(page_tables, ((0, 0), (0, P_pad - P)))
    max_chunks = P_pad // pages_per_chunk
    rows = max(1, min(rows, B))
    B_pad = math.ceil(B / rows) * rows
    fused_write = k_new is not None
    # RMW group: slices of the HBM pool's slot dim must align to its XLA
    # tile (8 sublanes); 8 divides page_size so groups never span pages
    GK = 8
    if not fused_write:
        k_new = jnp.zeros((B, Hk, D), k_cache.dtype)
        v_new = jnp.zeros((B, Hk, D), v_cache.dtype)
        new_slots = jnp.zeros((B,), jnp.int32)
    else:
        k_new = k_new.astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)
    if B_pad != B:
        q = jnp.pad(q, ((0, B_pad - B), (0, 0), (0, 0)))
        page_tables = jnp.pad(page_tables, ((0, B_pad - B), (0, 0)))
        seq_lens = jnp.pad(seq_lens, (0, B_pad - B))
        k_new = jnp.pad(k_new, ((0, B_pad - B), (0, 0), (0, 0)))
        v_new = jnp.pad(v_new, ((0, B_pad - B), (0, 0), (0, 0)))
        # padded rows write into slot 0 (the scratch/padding page)
        new_slots = jnp.pad(new_slots, (0, B_pad - B))
    new_slots = jnp.asarray(new_slots, jnp.int32)
    # sublane-duplicate the staging rows so the kernel's [GK, D] vector
    # reads are tile-aligned (see the RMW comment in _mr_kernel)
    k_new = jnp.broadcast_to(k_new[:, :, None], (B_pad, Hk, GK, D))
    v_new = jnp.broadcast_to(v_new[:, :, None], (B_pad, Hk, GK, D))

    layer_id = jnp.stack([
        jnp.asarray(layer_id, jnp.int32).reshape(()),
        jnp.asarray(window, jnp.int32).reshape(()),
    ])
    use_sinks = sinks is not None
    if use_sinks:
        sk = sinks.astype(jnp.float32).reshape(Hk, G)
        if G != G_PAD:
            sk = jnp.pad(sk, ((0, 0), (0, G_PAD - G)))
        sinks_in = jnp.broadcast_to(sk[:, :, None], (Hk, G_PAD, 128))
    else:
        sinks_in = jnp.zeros((Hk, G_PAD, 128), jnp.float32)
    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    qs = qs.reshape(B_pad, Hk, G, D)
    if G != G_PAD:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, G_PAD - G), (0, 0)))

    chunk_t = pages_per_chunk * page_size
    # DMA pipeline depth: deep in-flight window hides per-copy latency
    # (the dominant cost at short contexts); clamp by VMEM budget
    buf_bytes = Hk * chunk_t * D * k_cache.dtype.itemsize * 2
    import os as _os

    nbuf = int(_os.environ.get("SFT_DECODE_NBUF", "8"))
    while nbuf > 2 and nbuf * buf_bytes > 8 * 1024 * 1024:
        nbuf //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B_pad // rows,),
        in_specs=[
            pl.BlockSpec(
                (rows, Hk, G_PAD, D), lambda blk, *_: (blk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (Hk, G_PAD, 128), lambda blk, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rows, Hk, GK, D), lambda blk, *_: (blk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rows, Hk, GK, D), lambda blk, *_: (blk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (rows, Hk, G_PAD, D), lambda blk, *_: (blk, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, Hk, chunk_t, D), k_cache.dtype),
            pltpu.VMEM((nbuf, Hk, chunk_t, D), v_cache.dtype),
            pltpu.VMEM((Hk, G_PAD, D), jnp.float32),
            pltpu.VMEM((Hk, G_PAD, 128), jnp.float32),
            pltpu.VMEM((Hk, G_PAD, 128), jnp.float32),
            pltpu.VMEM((rows, Hk, GK, D), k_cache.dtype),
            pltpu.VMEM((rows, Hk, GK, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _mr_kernel,
        rows=rows,
        nbuf=nbuf,
        page_size=page_size,
        pages_per_chunk=pages_per_chunk,
        max_chunks=max_chunks,
        num_kv_heads=Hk,
        logit_cap=logit_cap,
        run_only=run_only,
        fused_write=fused_write,
        use_sinks=use_sinks,
    )
    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, Hk, G_PAD, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # cache operands alias through: the pool stays a single in-place
        # buffer across the layer scan instead of being copied around the
        # (read-only) pallas operand each layer
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # row blocks are independent (fused-write RMW groups never
            # cross rows): let megacore split the grid across cores
            dimension_semantics=(
                ("parallel",)
                if _os.environ.get("SFT_DECODE_PARALLEL_GRID", "1") == "1"
                else ("arbitrary",)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * Hq * D * P_pad * page_size * 2,
            bytes_accessed=(
                B_pad * Hk * P_pad * page_size * D * 2
                * k_cache.dtype.itemsize
            ),
            transcendentals=B_pad * Hq * P_pad * page_size,
        ),
    )(layer_id, page_tables, seq_lens, new_slots, qs, k_cache, v_cache,
      sinks_in, k_new, v_new)
    return out[:B, :, :G, :].reshape(B, Hq, D), k_cache, v_cache
