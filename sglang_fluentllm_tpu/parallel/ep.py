"""Expert parallelism over the mesh.

Analog of the reference's MoE EP stack (``layers/moe/dispatcher/deep_ep.py``
DeepEP all-to-all + EPS executor). TPU design (SURVEY §7 phase 4 / B.9):

With tensor-parallel serving the token activations are replicated across the
'tp' axis, so EP needs NO all-to-all at all: each rank runs only its local
expert shard over all tokens and the contributions psum over ICI — the
collective XLA already emits for the surrounding TP layers. This is the
fixed-capacity, static-shape structure the reference's low-latency DeepEP
mode approximates on GPUs (SURVEY B.9 notes it maps exactly to XLA's
preference). Token-sharded dispatch (ragged all-to-all) arrives with
DP-attention.

megablox gmm (the grouped-GEMM kernel) cannot be auto-partitioned by GSPMD,
so the MoE block runs under shard_map with expert-sharded weights.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.ops.moe.layer import moe_forward
from sglang_fluentllm_tpu.ops.moe.topk import select_experts


def moe_forward_ep(
    x: jax.Array,              # [T, H] (replicated across tp)
    router_logits: jax.Array,  # [T, E_total] (replicated)
    w_gate_up: jax.Array,      # [P_phys, H, 2I] sharded on dim 0 over 'tp'
    w_down: jax.Array,         # [P_phys, I, H] sharded on dim 0
    config: ModelConfig,
    mesh: Mesh,
    correction_bias: Optional[jax.Array] = None,
    use_gmm: bool = True,
    axis: str = "tp",
    tables=None,               # EpLocationTables (runtime l2p/n_rep) or None
) -> jax.Array:
    E = config.num_experts
    n = mesh.shape[axis]
    P_phys = w_gate_up.shape[0]
    P_local = P_phys // n
    assert P_phys % n == 0, (
        f"physical experts {P_phys} not divisible by ep size {n}"
    )
    if tables is None:
        assert P_phys == E, "physical placement requires routing tables"
        l2p = jnp.arange(E, dtype=jnp.int32)[:, None]
        n_rep = jnp.ones((E,), jnp.int32)
    else:
        l2p, n_rep = tables.l2p, tables.n_rep
    max_rep = l2p.shape[1]

    def local_fn(x, logits, w1_loc, w2_loc, bias, l2p, n_rep):
        rank = jax.lax.axis_index(axis)
        cb = bias[0] if bias.shape[-1] == logits.shape[-1] else None
        topk_w, topk_ids = select_experts(logits, config, cb)
        lo = rank * P_local
        # zero experts (ids >= E) are identity contributions counted once
        # (on rank 0) to avoid double counting under psum
        is_zero = topk_ids >= E
        zero_w = jnp.sum(jnp.where(is_zero, topk_w, 0.0), axis=-1)
        zero_contrib = jnp.where(
            rank == 0, 1.0, 0.0
        ) * zero_w[:, None] * x.astype(jnp.float32)

        # logical -> physical (round-robin over replicas per source token;
        # same rule as the all-to-all dispatcher so both paths agree)
        tok = jnp.broadcast_to(
            jnp.arange(x.shape[0], dtype=jnp.int32)[:, None],
            topk_ids.shape,
        )
        safe_ids = jnp.where(is_zero, 0, topk_ids)
        rep = tok % jnp.maximum(n_rep[safe_ids], 1)
        phys = l2p[safe_ids, jnp.clip(rep, 0, max_rep - 1)]

        local = (phys >= lo) & (phys < lo + P_local) & ~is_zero
        w = jnp.where(local, topk_w, 0.0)
        ids = jnp.where(local, phys - lo, 0)

        out = _moe_compute(x, w, ids, w1_loc[0], w2_loc[0], P_local,
                           use_gmm)
        out = out + zero_contrib
        return jax.lax.psum(out.astype(jnp.float32), axis)

    # leading shard axis gives shard_map per-rank expert blocks
    w1 = w_gate_up.reshape(n, P_local, *w_gate_up.shape[1:])
    w2 = w_down.reshape(n, P_local, *w_down.shape[1:])
    bias = (
        correction_bias[None, :]
        if correction_bias is not None
        else jnp.zeros((1, 1), jnp.float32)
    )
    out = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(None), P(None), P(None)),
        out_specs=P(),
        check_vma=False,
    )(x, router_logits, w1, w2, bias, l2p, n_rep)
    return out.astype(x.dtype)


def _moe_compute(x, topk_w, topk_ids, w1, w2, E, use_gmm):
    """Sorted grouped expert compute over local experts (weights already
    masked to zero for non-local assignments)."""
    T, H = x.shape
    K = topk_ids.shape[1]
    flat_ids = topk_ids.reshape(-1)
    sort_idx = jnp.argsort(flat_ids)
    sorted_token = sort_idx // K
    xs = x[sorted_token]
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)
    if use_gmm:
        from sglang_fluentllm_tpu.ops.moe.layer import _gmm

        h = _gmm(xs, w1, group_sizes)
        gate, up = jnp.split(h, 2, axis=-1)
        act = (jax.nn.silu(gate) * up).astype(x.dtype)
        out_sorted = _gmm(act, w2, group_sizes)
    else:
        w1g = w1[flat_ids[sort_idx]]
        h = jnp.einsum("th,thi->ti", xs.astype(jnp.float32),
                       w1g.astype(jnp.float32))
        gate, up = jnp.split(h, 2, axis=-1)
        act = jax.nn.silu(gate) * up
        w2g = w2[flat_ids[sort_idx]]
        out_sorted = jnp.einsum("ti,tih->th", act, w2g.astype(jnp.float32))
    flat_w = jnp.take_along_axis(
        topk_w.reshape(-1)[None, :], sort_idx[None, :], axis=1
    )[0]
    out = jnp.zeros((T, H), jnp.float32)
    return out.at[sorted_token].add(out_sorted * flat_w[:, None])
