"""MoE router top-k selection.

Analog of the reference's ``layers/moe/topk.py`` (872 LoC): softmax/sigmoid
scoring, plain greedy top-k, DeepSeek group-limited greedy, V3's noaux_tc
(sigmoid + per-expert correction bias), top-k probability renormalization and
routed scaling. Pure jnp — runs inside the jitted model step.

LongCat ScMoE zero-experts (``layers/moe/layer.py:61-72``): ids >=
num_real_experts are identity/drop experts — handled by the MoE layer, which
masks their contribution instead of routing them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.config.model_config import ModelConfig


def grouped_topk_mask(
    scores: jax.Array,  # [T, E]
    n_group: int,
    topk_group: int,
    group_score_topk: int = 2,
) -> jax.Array:
    """DeepSeek group-limited routing: keep only experts inside the
    topk_group highest-scoring groups. Group score = sum of top-2 expert
    scores within the group (V3 semantics)."""
    T, E = scores.shape
    gs = scores.reshape(T, n_group, E // n_group)
    top2 = jax.lax.top_k(gs, min(group_score_topk, gs.shape[-1]))[0]
    group_scores = jnp.sum(top2, axis=-1)               # [T, G]
    _, top_groups = jax.lax.top_k(group_scores, topk_group)
    group_mask = jnp.zeros((T, n_group), bool)
    group_mask = group_mask.at[
        jnp.arange(T)[:, None], top_groups
    ].set(True)
    return jnp.repeat(group_mask, E // n_group, axis=1)  # [T, E]


def select_experts(
    router_logits: jax.Array,    # [T, E] (E includes zero experts if any)
    config: ModelConfig,
    correction_bias: Optional[jax.Array] = None,  # [E] (noaux_tc)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (topk_weights [T, K] f32, topk_ids [T, K] i32)."""
    K = config.num_experts_per_tok
    logits = router_logits.astype(jnp.float32)
    if config.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    select_scores = scores
    if config.topk_method == "noaux_tc" and correction_bias is not None:
        # V3: selection uses bias-corrected scores, weights use raw scores
        select_scores = scores + correction_bias[None, :]
    if (
        config.topk_method in ("group_limited_greedy", "noaux_tc")
        and config.n_group > 1
    ):
        mask = grouped_topk_mask(
            select_scores, config.n_group, config.topk_group
        )
        select_scores = jnp.where(mask, select_scores, -jnp.inf)

    _, topk_ids = jax.lax.top_k(select_scores, K)
    topk_weights = jnp.take_along_axis(scores, topk_ids, axis=1)

    if config.norm_topk_prob:
        denom = jnp.sum(topk_weights, axis=-1, keepdims=True) + 1e-20
        topk_weights = topk_weights / denom
    topk_weights = topk_weights * config.routed_scaling_factor
    return topk_weights, topk_ids.astype(jnp.int32)
