"""Gated DeltaNet linear attention (Qwen3-Next hybrid layers).

Reference: ``srt/models/qwen3_next.py`` (fla ``chunk_gated_delta_rule`` /
``fused_recurrent_gated_delta_rule`` + ``causal_conv1d``); semantics
cross-checked against HF ``modeling_qwen3_next`` torch fallbacks, which
the tests compare against bit-for-bit at f32.

TPU design notes:
- prefill uses the CHUNKED delta rule (chunk=64): intra-chunk terms are
  dense [C, C] matmuls on the MXU; only the chunk-to-chunk state carry
  is a ``lax.scan``. The UT-transform loop of the torch fallback is the
  forward substitution of ``(I - A)^{-1}`` with A strictly lower
  triangular — computed here with one batched ``triangular_solve``.
- decode is the O(1) recurrent step.
- both paths start FROM a given per-request state and return the final
  state, so chunked prefill and the fused multi-step decode window both
  continue correctly (the HF prefill path always starts from zeros).
- ragged batches: rows are padded to S; positions >= q_len are masked
  out of the recurrence (zero k/v/beta and zero g => exp(0)=1 decay,
  no update), so the returned state is exactly the state after q_len
  real tokens.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CHUNK = 64


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps
    )


def causal_conv1d(
    x: jax.Array,          # [B, S, conv_dim] new inputs
    conv_state: jax.Array,  # [B, conv_dim, K] last K inputs (HF layout)
    weight: jax.Array,      # [conv_dim, K] depthwise taps
    q_len: jax.Array,       # [B] real new tokens per row
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv + silu, continuing from conv_state; returns
    (activated [B, S, conv_dim], new conv_state). Matches HF
    ``torch_causal_conv1d_update`` (conv over cat(state, x), last S
    outputs) with ragged state extraction at q_len."""
    B, S, C = x.shape
    K = conv_state.shape[-1]
    xt = x.swapaxes(1, 2)                          # [B, C, S]
    full = jnp.concatenate([conv_state, xt], axis=-1)  # [B, C, K+S]
    # output t (t=0..S-1) = sum_j w[j] * full[..., t+1+j]
    out = jnp.zeros((B, C, S), jnp.float32)
    for j in range(K):
        out = out + weight[None, :, j:j + 1].astype(jnp.float32) \
            * full[:, :, 1 + j : 1 + j + S].astype(jnp.float32)
    act = jax.nn.silu(out).swapaxes(1, 2).astype(x.dtype)  # [B, S, C]
    # new state = inputs at concat positions [q_len .. q_len+K-1]
    idx = q_len[:, None] + jnp.arange(K)[None, :]          # [B, K]
    new_state = jnp.take_along_axis(
        full, idx[:, None, :].repeat(C, axis=1), axis=-1
    ).astype(conv_state.dtype)
    return act, new_state


def _recurrent_step(q, k, v, g, beta, state):
    """One-token delta rule (HF torch_recurrent_gated_delta_rule body).
    q/k [B, Hv, Dk], v [B, Hv, Dv], g/beta [B, Hv], state
    [B, Hv, Dk, Dv] f32 -> (out [B, Hv, Dv], state')."""
    scale = q.shape[-1] ** -0.5
    q = l2norm(q.astype(jnp.float32)) * scale
    k = l2norm(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    state = state * jnp.exp(g)[..., None, None]
    kv_mem = jnp.einsum("bhkv,bhk->bhv", state, k)
    delta = (v - kv_mem) * beta[..., None]
    state = state + k[..., :, None] * delta[..., None, :]
    out = jnp.einsum("bhkv,bhk->bhv", state, q)
    return out, state


def gated_delta_rule_aux(
    q: jax.Array,       # [B, S, Hv, Dk]
    k: jax.Array,       # [B, S, Hv, Dk]
    v: jax.Array,       # [B, S, Hv, Dv]
    g: jax.Array,       # [B, S, Hv] log-decay
    beta: jax.Array,    # [B, S, Hv]
    state: jax.Array,   # [B, Hv, Dk, Dv] f32
    q_len: jax.Array,   # [B] valid tokens (0 = padded row)
):
    """Per-token recurrent delta rule for SHORT windows (spec verify)
    that also returns the exact per-step update aux needed to invert
    rejected steps:

        state_t = state_{t-1} * exp(g_t) + k_t (x) delta_t
        =>  state_{t-1} = (state_t - k_t (x) delta_t) * exp(-g_t)

    Returns (out [B, S, Hv, Dv], state', aux) with aux = (k_l2 [B, S,
    Hv, Dk], delta [B, S, Hv, Dv], g_eff [B, S, Hv]); masked steps
    (t >= q_len) store zeros so inversion is a no-op.
    """
    B, S, H, Dk = q.shape
    scale = Dk ** -0.5
    qf = l2norm(q.swapaxes(0, 1).astype(jnp.float32)) * scale  # [S,B,H,Dk]
    kf = l2norm(k.swapaxes(0, 1).astype(jnp.float32))
    vf = v.swapaxes(0, 1).astype(jnp.float32)
    gf = g.swapaxes(0, 1).astype(jnp.float32)
    bf = beta.swapaxes(0, 1).astype(jnp.float32)
    tmask = (jnp.arange(S)[:, None] < q_len[None, :])          # [S, B]

    def step(state, xs):
        qt, kt, vt, gt, bt, m = xs
        gt = jnp.where(m[:, None], gt, 0.0)
        st = state * jnp.exp(gt)[..., None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", st, kt)
        delta = (vt - kv_mem) * bt[..., None]
        delta = jnp.where(m[:, None, None], delta, 0.0)
        st = st + kt[..., :, None] * delta[..., None, :]
        out = jnp.einsum("bhkv,bhk->bhv", st, qt)
        return st, (out, kt, delta, gt)

    state, (outs, ks, deltas, gs) = jax.lax.scan(
        step, state.astype(jnp.float32),
        (qf, kf, vf, gf, bf, tmask),
    )
    out = outs.swapaxes(0, 1).astype(v.dtype)
    aux = (ks.swapaxes(0, 1), deltas.swapaxes(0, 1),
           gs.swapaxes(0, 1))
    return out, state, aux


def gdn_rollback(
    state: jax.Array,   # [B, Hv, Dk, Dv] f32 (post-window)
    aux,                # (k_l2, delta, g_eff) from gated_delta_rule_aux
    kept: jax.Array,    # [B] window tokens to keep
) -> jax.Array:
    """Exactly invert the state updates of steps t >= kept."""
    ks, deltas, gs = aux
    S = ks.shape[1]

    def step(st, t):
        undo = (t >= kept)[:, None]
        gt = jnp.where(undo, gs[:, t], 0.0)
        dt = jnp.where(undo[..., None], deltas[:, t], 0.0)
        st = st - ks[:, t][..., :, None] * dt[..., None, :]
        st = st * jnp.exp(-gt)[..., None, None]
        return st, None

    state, _ = jax.lax.scan(
        step, state, jnp.arange(S - 1, -1, -1, dtype=jnp.int32))
    return state


def gdn_pallas_mode() -> str:
    """'auto' (Pallas on real TPU), 'interpret' (Pallas everywhere, for
    tests), or 'off' — env SFT_GDN_PALLAS overrides."""
    import os

    mode = os.environ.get("SFT_GDN_PALLAS", "auto")
    if mode == "auto":
        return "auto" if jax.default_backend() == "tpu" else "off"
    return mode


def _chunked(q, k, v, g, beta, state):
    """Chunked delta rule. q/k [B, Hv, S, Dk] (l2normed, q scaled),
    v [B, Hv, S, Dv], g/beta [B, Hv, S] (g pre-masked, NOT cumsummed),
    state [B, Hv, Dk, Dv] f32. S must be a multiple of CHUNK."""
    B, H, S, Dk = k.shape
    Dv = v.shape[-1]
    N = S // CHUNK

    def to_chunks(x):
        return x.reshape(B, H, N, CHUNK, *x.shape[3:])

    q, k, v = map(to_chunks, (q, k, v))
    g = g.reshape(B, H, N, CHUNK)
    beta = beta.reshape(B, H, N, CHUNK)
    v_beta = v * beta[..., None]
    k_beta = k * beta[..., None]
    g = jnp.cumsum(g, axis=-1)
    # decay_mask[i, j] = exp(g_i - g_j) for j <= i
    tril = jnp.tril(jnp.ones((CHUNK, CHUNK), bool))
    decay = jnp.where(
        tril, jnp.exp(jnp.where(
            tril, g[..., :, None] - g[..., None, :], 0.0)), 0.0
    )
    a = -(k_beta @ k.swapaxes(-1, -2)) * decay
    a = jnp.where(jnp.tril(jnp.ones((CHUNK, CHUNK), bool), -1), a, 0.0)
    # UT transform: attn = (I - a)^{-1}, a strictly lower triangular
    eye = jnp.eye(CHUNK, dtype=a.dtype)
    attn = jax.lax.linalg.triangular_solve(
        eye - a, jnp.broadcast_to(eye, a.shape),
        left_side=True, lower=True, unit_diagonal=True,
    )
    u = attn @ v_beta                                  # [B,H,N,C,Dv]
    k_cumdecay = attn @ (k_beta * jnp.exp(g)[..., None])

    mode = gdn_pallas_mode()
    if mode != "off":
        from sglang_fluentllm_tpu.ops.pallas_gdn import (
            gdn_chunk_scan,
            supported,
        )

        if supported(CHUNK, Dk, Dv):
            out, state = gdn_chunk_scan(
                q, k, u, k_cumdecay, decay, g, state,
                interpret=(mode == "interpret"),
            )
            return out.reshape(B, H, S, Dv), state

    strict = jnp.tril(jnp.ones((CHUNK, CHUNK), bool))  # incl diag

    def chunk_step(state, xs):
        q_i, k_i, u_i, g_i, kcd_i, dec_i = xs
        att = jnp.where(strict, (q_i @ k_i.swapaxes(-1, -2)) * dec_i, 0.0)
        v_prime = kcd_i @ state
        v_new = u_i - v_prime
        attn_inter = (q_i * jnp.exp(g_i)[..., None]) @ state
        out_i = attn_inter + att @ v_new
        g_last = g_i[..., -1]
        state = state * jnp.exp(g_last)[..., None, None] + (
            k_i * jnp.exp(g_last[..., None] - g_i)[..., None]
        ).swapaxes(-1, -2) @ v_new
        return state, out_i

    # scan over chunks: move N to the front
    def front(x):
        return jnp.moveaxis(x, 2, 0)

    state, outs = jax.lax.scan(
        chunk_step, state,
        (front(q), front(k), front(u), front(g), front(k_cumdecay),
         front(decay)),
    )
    out = jnp.moveaxis(outs, 0, 2).reshape(B, H, S, Dv)
    return out, state


def kda_delta_rule(
    q: jax.Array,       # [B, S, H, Dk]
    k: jax.Array,       # [B, S, H, Dk]
    v: jax.Array,       # [B, S, H, Dv]
    g: jax.Array,       # [B, S, H, Dk] PER-CHANNEL log-decay (<= 0)
    beta: jax.Array,    # [B, S, H] in (0, 1)
    state: jax.Array,   # [B, H, Dk, Dv] f32
    q_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Kimi Delta Attention recurrence (reference
    ``fla/fused_recurrent.py`` kernel with IS_KDA: the state decay is a
    per-key-channel vector instead of GDN's per-head scalar). Sequential
    ``lax.scan`` over time — exact for both decode (S=1) and prefill
    continuation from a carried state."""
    B, S, H, Dk = q.shape
    scale = Dk ** -0.5
    qf = l2norm(q.swapaxes(1, 2).astype(jnp.float32)) * scale
    kf = l2norm(k.swapaxes(1, 2).astype(jnp.float32))
    vf = v.swapaxes(1, 2).astype(jnp.float32)
    gf = g.swapaxes(1, 2).astype(jnp.float32)
    bf = beta.swapaxes(1, 2).astype(jnp.float32)
    if q_len is not None:
        valid = (jnp.arange(S)[None, :] < q_len[:, None])[:, None, :]
        kf = kf * valid[..., None]
        vf = vf * valid[..., None]
        bf = bf * valid
        gf = gf * valid[..., None]

    def front(x):
        return jnp.moveaxis(x, 2, 0)  # [S, B, H, ...]

    def step(st, xs):
        q_t, k_t, v_t, g_t, b_t = xs
        st = st * jnp.exp(g_t)[..., None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", st, k_t)
        delta = (v_t - kv_mem) * b_t[..., None]
        st = st + k_t[..., :, None] * delta[..., None, :]
        out = jnp.einsum("bhkv,bhk->bhv", st, q_t)
        return st, out

    state, outs = jax.lax.scan(
        step, state.astype(jnp.float32),
        (front(qf), front(kf), front(vf), front(gf), front(bf)),
    )
    return jnp.moveaxis(outs, 0, 2).swapaxes(1, 2).astype(v.dtype), state


def gated_delta_rule(
    q: jax.Array,       # [B, S, Hv, Dk]
    k: jax.Array,       # [B, S, Hv, Dk]
    v: jax.Array,       # [B, S, Hv, Dv]
    g: jax.Array,       # [B, S, Hv] log-decay (<= 0)
    beta: jax.Array,    # [B, S, Hv] in (0, 1)
    state: jax.Array,   # [B, Hv, Dk, Dv] f32
    q_len: Optional[jax.Array] = None,  # [B] (None => all S valid)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out [B, S, Hv, Dv] like v.dtype, final state f32)."""
    B, S, H, Dk = q.shape
    if S == 1:
        out, state = _recurrent_step(
            q[:, 0].astype(jnp.float32), k[:, 0], v[:, 0],
            g[:, 0].astype(jnp.float32), beta[:, 0].astype(jnp.float32),
            state,
        )
        return out[:, None].astype(v.dtype), state
    # [B, H, S, ...] layout, f32, mask padded positions out of the
    # recurrence
    qt = q.swapaxes(1, 2).astype(jnp.float32)
    kt = k.swapaxes(1, 2).astype(jnp.float32)
    vt = v.swapaxes(1, 2).astype(jnp.float32)
    gt = g.swapaxes(1, 2).astype(jnp.float32)
    bt = beta.swapaxes(1, 2).astype(jnp.float32)
    if q_len is not None:
        valid = (jnp.arange(S)[None, :] < q_len[:, None])[:, None, :]
        kt = kt * valid[..., None]
        vt = vt * valid[..., None]
        bt = bt * valid
        gt = gt * valid
    scale = Dk ** -0.5
    qt = l2norm(qt) * scale
    kt = l2norm(kt)
    # zero k rows survive l2norm as zero (0 * rsqrt(eps))
    pad = (-S) % CHUNK
    if pad:
        qt, kt, vt = (
            jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
            for x in (qt, kt, vt)
        )
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, pad)))
    out, state = _chunked(qt, kt, vt, gt, bt, state.astype(jnp.float32))
    out = out[:, :, :S].swapaxes(1, 2)
    return out.astype(v.dtype), state
