"""MoE expert computation.

Analog of the reference's ``layers/moe/layer.py`` + executors + Triton
grouped GEMM (``layers/moe/gemms/triton_common.py``). TPU design:

- tokens are sorted by expert id (one argsort) and run through megablox
  ``gmm`` — Pallas grouped matmul, the DeepGEMM/grouped-GEMM analog — so
  each expert processes a contiguous row block on the MXU;
- zero experts (LongCat ScMoE identity/drop experts, ``layer.py:61-72``)
  contribute x or 0 without routing;
- EP: the same sorted layout feeds a shard_map all-to-all dispatcher
  (parallel/ep.py) — the DeepEP analog with fixed-capacity static shapes
  (SURVEY B.9 notes the reference's low-latency mode is already
  static-shape, which is exactly what XLA wants).

Expert weights layout: ``w_gate_up: [E, H, 2*I]`` (gate|up concatenated
per-expert), ``w_down: [E, I, H]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.config.model_config import ModelConfig
from sglang_fluentllm_tpu.ops.moe.topk import select_experts


def _gmm(lhs, rhs, group_sizes, interpret=False):
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    m, k = lhs.shape
    tiling = (min(m, 128), min(k, 128), 128)
    return gmm(
        lhs, rhs, group_sizes,
        preferred_element_type=jnp.float32,
        tiling=tiling,
        interpret=interpret,
    )


def moe_act(gate, up, activation: str, alpha: float, limit: float):
    """Expert activation. ``silu``: standard silu(gate)*up. ``swiglu_oai``
    (gpt-oss, reference ``layers/activation.py:214``): clamp gate above at
    ``limit`` and up to ±``limit``, gate*sigmoid(alpha*gate)*(up+1)."""
    if activation == "swiglu_oai":
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
        return gate * jax.nn.sigmoid(alpha * gate) * (up + 1.0)
    if activation == "gelu":
        return jax.nn.gelu(gate) * up
    return jax.nn.silu(gate) * up


def moe_forward(
    x: jax.Array,             # [T, H]
    router_logits: jax.Array, # [T, E_total] (incl. zero experts)
    w_gate_up: jax.Array,     # [E, H, 2I]
    w_down: jax.Array,        # [E, I, H]
    config: ModelConfig,
    correction_bias: Optional[jax.Array] = None,
    use_gmm: bool = True,
    b_gate_up: Optional[jax.Array] = None,  # [E, 2I] expert bias
    b_down: Optional[jax.Array] = None,     # [E, H]
    activation: str = "silu",
    act_alpha: float = 1.702,
    act_limit: float = 7.0,
) -> jax.Array:
    """Dense (TP / single-chip) MoE: every expert lives on this shard."""
    T, H = x.shape
    E = w_gate_up.shape[0]
    K = config.num_experts_per_tok
    topk_w, topk_ids = select_experts(router_logits, config, correction_bias)

    # zero experts: id >= E is identity ("copy") with its router weight
    if config.num_zero_experts > 0:
        is_zero = topk_ids >= E
        zero_contrib = jnp.sum(
            jnp.where(is_zero, topk_w, 0.0), axis=-1, keepdims=True
        ) * x.astype(jnp.float32)
        # mask zero experts out of the routed computation
        topk_w = jnp.where(is_zero, 0.0, topk_w)
        topk_ids = jnp.where(is_zero, 0, topk_ids)
    else:
        zero_contrib = 0.0

    # sort token-expert pairs by expert id -> contiguous per-expert blocks
    flat_ids = topk_ids.reshape(-1)                    # [T*K]
    sort_idx = jnp.argsort(flat_ids)                   # [T*K]
    sorted_token = sort_idx // K                       # source token
    xs = x[sorted_token]                               # [T*K, H]
    group_sizes = jnp.bincount(flat_ids, length=E).astype(jnp.int32)

    sorted_ids = flat_ids[sort_idx]                    # expert of each row
    if use_gmm:
        h = _gmm(xs, w_gate_up, group_sizes)           # [T*K, 2I] f32
        if b_gate_up is not None:
            h = h + b_gate_up[sorted_ids].astype(jnp.float32)
        gate, up = jnp.split(h, 2, axis=-1)
        act = moe_act(gate, up, activation, act_alpha,
                      act_limit).astype(x.dtype)
        out_sorted = _gmm(act, w_down, group_sizes)    # [T*K, H] f32
    else:
        # jnp fallback (CPU tests): segment-wise via one-hot is O(E*T) —
        # instead gather per-row expert weights (fine at tiny test sizes)
        w1 = w_gate_up[sorted_ids]                     # [T*K, H, 2I]
        h = jnp.einsum("th,thi->ti", xs.astype(jnp.float32),
                       w1.astype(jnp.float32))
        if b_gate_up is not None:
            h = h + b_gate_up[sorted_ids].astype(jnp.float32)
        gate, up = jnp.split(h, 2, axis=-1)
        act = moe_act(gate, up, activation, act_alpha, act_limit)
        w2 = w_down[sorted_ids]                        # [T*K, I, H]
        out_sorted = jnp.einsum("ti,tih->th", act, w2.astype(jnp.float32))
    if b_down is not None:
        out_sorted = out_sorted + b_down[sorted_ids].astype(jnp.float32)

    # unsort and weight-combine
    flat_w = jnp.take_along_axis(
        topk_w.reshape(-1)[None, :], sort_idx[None, :], axis=1
    )[0]
    weighted = out_sorted * flat_w[:, None]
    out = jnp.zeros((T, H), jnp.float32)
    out = out.at[sorted_token].add(weighted)
    return (out + zero_contrib).astype(x.dtype)


def model_moe_forward(model, x2d, router_logits, w_gate_up, w_down,
                      config, correction_bias=None,
                      ep_l2p=None, ep_n_rep=None):
    """One MoE parallel-path selector shared by every MoE model:

    - ``--moe-parallel-strategy ep`` (ep_mesh set) -> token-sharded
      all-to-all dispatch by DEFAULT (``parallel/ep_dispatch.py``), with
      the replicated-token psum path only for tiny latency-bound batches
      under an identity placement (``moe_forward_ep_auto``; reference
      deep_ep.py normal/low-latency selection);
    - otherwise the dense (TP-sharded) grouped-GEMM path.

    Reads the runner-installed attributes: ep_mesh, ep_axis, ep_tables,
    ep_capacity_factor, ep_dispatch_min_tokens, ep_dispatch_stats.
    """
    if getattr(model, "ep_mesh", None) is not None:
        import dataclasses as _dc

        from sglang_fluentllm_tpu.parallel.ep_dispatch import (
            moe_forward_ep_auto,
        )

        tables = getattr(model, "ep_tables", None)
        if tables is not None and ep_l2p is not None:
            # per-layer RUNTIME tables (sliced from the params pytree by
            # the layer scan): a rebalance swaps the arrays in params —
            # no retrace (VERDICT r2 #8)
            tables = _dc.replace(
                tables, l2p=ep_l2p, n_rep=ep_n_rep,
                num_physical=int(w_gate_up.shape[0]),
            )
        return moe_forward_ep_auto(
            x2d, router_logits, w_gate_up, w_down, config,
            mesh=model.ep_mesh,
            tables=tables,
            correction_bias=correction_bias,
            capacity_factor=getattr(model, "ep_capacity_factor", 2.0),
            axis=getattr(model, "ep_axis", "tp"),
            use_gmm=getattr(model, "use_gmm", True),
            min_tokens=getattr(model, "ep_dispatch_min_tokens", 16),
            stats=getattr(model, "ep_dispatch_stats", None),
        )
    return moe_forward(
        x2d, router_logits, w_gate_up, w_down, config,
        correction_bias=correction_bias,
        use_gmm=getattr(model, "use_gmm", True),
    )
