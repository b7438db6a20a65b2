"""Pallas kernel for the gated-delta-rule chunk recurrence (GDN).

TPU-native analog of the reference's Triton chunk kernels in ``fla/``
(``chunk.py`` chunk_gated_delta_rule): the sequential inter-chunk
recurrence of ``ops/linear_attn._chunked``. The chunk-local UT transform
(triangular solve) stays in XLA — batched triangular solves are already
MXU-shaped there — but the chunk *scan* moves into Pallas where the
running state [Dk, Dv] f32 lives in a VMEM scratch carried across the
sequential grid dimension, so it never round-trips to HBM between
chunks (the XLA ``lax.scan`` carry does, N times per layer per step).

Grid: (B, H, N) with N innermost/sequential ("arbitrary"); per cell the
kernel consumes one [C, Dk] q/k tile, the pre-solved [C, Dv] u tile,
[C, C] intra-chunk decay, [C] cumulative log-decay, and emits [C, Dv]
output. Requires Dk, Dv multiples of 128 (lane) and CHUNK multiple of 8
(sublane) — callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gdn_chunk_kernel(
    q_ref,        # [C, Dk] f32 (l2normed, scaled)
    k_ref,        # [C, Dk] f32 (l2normed)
    u_ref,        # [C, Dv] f32 (UT-transformed v)
    kcd_ref,      # [C, Dk] f32 (UT-transformed k_beta * exp(g))
    dec_ref,      # [C, C] f32 intra-chunk decay (tril incl diag)
    g_ref,        # [1, C] f32 cumulative log-decay within chunk
    s0_ref,       # [Dk, Dv] f32 initial state for this (b, h)
    out_ref,      # [C, Dv] f32
    sf_ref,       # [Dk, Dv] f32 final state
    state,        # VMEM scratch [Dk, Dv] f32 (carried across chunks)
    *,
    n_chunks: int,
):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _init():
        state[...] = s0_ref[...]

    q = q_ref[...]
    k = k_ref[...]
    u = u_ref[...]
    kcd = kcd_ref[...]
    dec = dec_ref[...]
    g = g_ref[0, :]                                   # [C]
    st = state[...]

    C = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    att = jnp.where(
        col <= row,
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * dec,
        0.0,
    )
    v_new = u - jax.lax.dot_general(
        kcd, st, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = (
        jax.lax.dot_general(
            q * jnp.exp(g)[:, None], st, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            att, v_new, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    g_last = g[C - 1]
    st = st * jnp.exp(g_last) + jax.lax.dot_general(
        k * jnp.exp(g_last - g)[:, None], v_new,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    state[...] = st

    @pl.when(n == n_chunks - 1)
    def _fin():
        sf_ref[...] = st


@functools.partial(jax.jit, static_argnames=("interpret",))
def gdn_chunk_scan(
    q: jax.Array,        # [B, H, N, C, Dk] f32
    k: jax.Array,        # [B, H, N, C, Dk] f32
    u: jax.Array,        # [B, H, N, C, Dv] f32
    k_cumdecay: jax.Array,  # [B, H, N, C, Dk] f32
    decay: jax.Array,    # [B, H, N, C, C] f32
    g: jax.Array,        # [B, H, N, C] f32 (cumsummed within chunk)
    state: jax.Array,    # [B, H, Dk, Dv] f32
    interpret: bool = False,
):
    """Returns (out [B, H, N, C, Dv] f32, final state [B, H, Dk, Dv])."""
    B, H, N, C, Dk = q.shape
    Dv = u.shape[-1]

    chunk_tile = lambda b, h, n: (b, h, n, 0, 0)  # noqa: E731
    g = g[:, :, :, None, :]      # [B,H,N,1,C]: sublane-legal g block
    grid = (B, H, N)
    out, sf = pl.pallas_call(
        functools.partial(_gdn_chunk_kernel, n_chunks=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, None, C, Dk), chunk_tile),
            pl.BlockSpec((None, None, None, C, Dk), chunk_tile),
            pl.BlockSpec((None, None, None, C, Dv), chunk_tile),
            pl.BlockSpec((None, None, None, C, Dk), chunk_tile),
            pl.BlockSpec((None, None, None, C, C), chunk_tile),
            pl.BlockSpec((None, None, None, 1, C),
                         lambda b, h, n: (b, h, n, 0, 0)),
            pl.BlockSpec((None, None, Dk, Dv),
                         lambda b, h, n: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, None, C, Dv), chunk_tile),
            pl.BlockSpec((None, None, Dk, Dv),
                         lambda b, h, n: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, C, Dv), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Dk, Dv), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Dk, Dv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, u, k_cumdecay, decay, g, state)
    return out, sf


def supported(C: int, Dk: int, Dv: int) -> bool:
    return C % 8 == 0 and Dk % 128 == 0 and Dv % 128 == 0
