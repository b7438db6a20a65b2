"""Token sampling inside the jitted step.

Analog of the reference's ``layers/sampler.py`` (``Sampler:27``) +
``sampling/sampling_batch_info.py`` (``SamplingBatchInfo:22``): per-request
temperature / top-k / top-p / min-p live in padded device tensors; greedy
requests short-circuit via a mask. Penalties (frequency/presence/repetition)
are applied as additive/multiplicative logit adjustments computed by the
scheduler-side penalizer orchestrator.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingMetadata:
    """Padded per-request sampling tensors ([B] each)."""

    temperature: jax.Array    # [B] f32 (>0; greedy rows use 1.0)
    top_p: jax.Array          # [B] f32 in (0, 1]
    top_k: jax.Array          # [B] i32 (<=0 means disabled)
    min_p: jax.Array          # [B] f32
    is_greedy: jax.Array      # [B] bool
    # cumulative penalties, shape [B, V] or dummy [B, 1] when unused
    linear_penalty: Optional[jax.Array] = None
    # --- penalties (penaltylib analog); None when no request needs them ---
    frequency_penalty: Optional[jax.Array] = None   # [B] f32
    presence_penalty: Optional[jax.Array] = None    # [B] f32
    repetition_penalty: Optional[jax.Array] = None  # [B] f32 (1.0 = off)
    penalized_ids: Optional[jax.Array] = None       # [B, L] i32 (-1 = pad)
    # min-new-tokens: eos ids masked while remaining > 0
    eos_mask_ids: Optional[jax.Array] = None        # [B, E] i32 (-1 = pad)
    min_new_remaining: Optional[jax.Array] = None   # [B] i32
    # constrained decoding: packed allowed-token bitmask [B, ceil(V/32)]
    # (int32 words; row of all ones = unconstrained)
    vocab_mask_words: Optional[jax.Array] = None
    # thinking budget (reference apply_thinking_budgets,
    # sampling_batch_info.py:234): absolute seq_len at which to force
    # the think-end token (-1 = off) + the per-row think-end id
    think_stop: Optional[jax.Array] = None   # [B] i32
    think_end: Optional[jax.Array] = None    # [B] i32
    # host-only (never packed/transferred): [(row, processor, params)]
    # applied through pure_callback when present
    custom_procs: Optional[list] = None
    # static fast path: host knows at batch-build time that every request
    # is greedy -> jit specializes to a pure argmax (no sort, no gumbel)
    all_greedy: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # top-k logprobs requested for this batch (0 = off; bucketed by the
    # scheduler to bound trace count) — reference convert_logprob_style
    # (tokenizer_manager.py:905) consumes these
    top_logprobs_num: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # compute per-position input-token logprobs during extend
    return_input_logprob: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # any request wants sampled-token logprobs: skips the full-vocab
    # log_softmax per step when false (saves ~0.3 ms/step at 152k vocab)
    want_logprobs: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @staticmethod
    def from_lists(temps, top_ps, top_ks, min_ps, pad_to: int):
        """Builds NUMPY-backed metadata; device conversion happens in the
        packed transfer (runtime/packing.py) or implicitly under jit."""
        import numpy as np

        n = len(temps)
        pad = pad_to - n

        def arr(xs, fill, dtype):
            return np.asarray(list(xs) + [fill] * pad, dtype=dtype)

        greedy = [t <= 1e-5 or k == 1 for t, k in zip(temps, top_ks)]
        return SamplingMetadata(
            temperature=arr(
                [max(t, 1e-5) for t in temps], 1.0, "float32"
            ),
            top_p=arr(top_ps, 1.0, "float32"),
            top_k=arr(top_ks, -1, "int32"),
            min_p=arr(min_ps, 0.0, "float32"),
            is_greedy=arr(greedy, True, "bool"),
            all_greedy=all(greedy),
        )


def apply_top_k_top_p_min_p(
    logits: jax.Array, meta: SamplingMetadata
) -> jax.Array:
    """Mask logits outside the top-k / nucleus / min-p sets. [B, V] -> [B, V]."""
    B, V = logits.shape
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)

    # top-k: threshold = k-th largest logit
    k = jnp.where(meta.top_k > 0, meta.top_k, V)
    k = jnp.clip(k, 1, V)
    kth = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    mask = logits < kth

    # top-p: smallest set whose cumprob >= top_p. Keep tokens whose
    # prefix-exclusive cumulative probability < top_p.
    cum = jnp.cumsum(probs_sorted, axis=-1)
    cum_exclusive = cum - probs_sorted
    keep_sorted = cum_exclusive < meta.top_p[:, None]
    # threshold logit: smallest kept logit
    kept_count = jnp.sum(keep_sorted, axis=-1)
    pth = jnp.take_along_axis(
        sorted_logits, jnp.maximum(kept_count - 1, 0)[:, None], axis=-1
    )
    mask |= logits < pth

    # min-p: drop tokens with prob < min_p * max_prob
    max_logit = sorted_logits[:, :1]
    probs = jnp.exp(
        (logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True))
    )
    max_prob = jnp.take_along_axis(
        probs, jnp.argmax(logits, axis=-1)[:, None], axis=-1
    )
    mask |= probs < (meta.min_p[:, None] * max_prob)

    return jnp.where(mask, NEG_INF, logits)


def penalty_counts_from_ids(meta: SamplingMetadata, B: int,
                            V: int) -> Optional[jax.Array]:
    """[B, V] f32 occurrence counts scattered from the penalized-id
    window; the fused-window decode carries this buffer across steps so
    penalties stay EXACT within a window (VERDICT r2 #7)."""
    if meta.penalized_ids is None:
        return None
    ids = meta.penalized_ids
    valid = ids >= 0
    safe = jnp.where(valid, ids, 0)
    counts = jnp.zeros((B, V), jnp.float32)
    return counts.at[
        jnp.arange(B)[:, None], safe
    ].add(valid.astype(jnp.float32))


def apply_penalties_from_counts(
    logits: jax.Array,
    meta: SamplingMetadata,
    counts: Optional[jax.Array],
    min_new_remaining: Optional[jax.Array],
) -> jax.Array:
    """Frequency/presence/repetition penalties + min-new-tokens EOS mask
    from a live [B, V] count buffer (reference sampling/penaltylib
    orchestrator semantics)."""
    B, V = logits.shape
    if counts is not None:
        if meta.frequency_penalty is not None:
            logits = logits - meta.frequency_penalty[:, None] * counts
        if meta.presence_penalty is not None:
            logits = logits - meta.presence_penalty[:, None] * (counts > 0)
        if meta.repetition_penalty is not None:
            rep = meta.repetition_penalty[:, None]
            seen = counts > 0
            penalized = jnp.where(
                logits > 0, logits / rep, logits * rep
            )
            logits = jnp.where(seen, penalized, logits)
    if meta.eos_mask_ids is not None and min_new_remaining is not None:
        # while min_new_tokens not reached, forbid stop/eos tokens
        active = (min_new_remaining > 0)[:, None]            # [B, 1]
        eos = meta.eos_mask_ids                               # [B, E]
        evalid = (eos >= 0) & active
        esafe = jnp.where(eos >= 0, eos, 0)
        mask = jnp.zeros((B, V), bool)
        mask = mask.at[jnp.arange(B)[:, None], esafe].max(evalid)
        logits = jnp.where(mask, NEG_INF, logits)
    return logits


def apply_penalties(logits: jax.Array, meta: SamplingMetadata) -> jax.Array:
    B, V = logits.shape
    counts = penalty_counts_from_ids(meta, B, V)
    return apply_penalties_from_counts(
        logits, meta, counts, meta.min_new_remaining
    )


def unpack_mask_words(words: jax.Array, V: int) -> jax.Array:
    """[B, W] packed uint32 bitmask -> [B, V] bool allowed."""
    B = words.shape[0]
    bits = (
        words.view(jnp.uint32)[:, :, None]
        >> jnp.arange(32, dtype=jnp.uint32)
    ) & jnp.uint32(1)
    return bits.reshape(B, -1)[:, :V].astype(bool)


def sample(
    logits: jax.Array,          # [B, V] f32
    meta: SamplingMetadata,
    key: jax.Array,
    penalty_state=None,         # (counts [B,V] f32, min_rem [B] i32): live
    #                             fused-window state overriding meta's
    allowed_mask: jax.Array = None,  # [B, V] bool: live grammar mask
) -> jax.Array:
    """Returns sampled token ids [B] i32."""
    logits = logits.astype(jnp.float32)
    if meta.linear_penalty is not None and meta.linear_penalty.shape[-1] == logits.shape[-1]:
        logits = logits + meta.linear_penalty
    if penalty_state is not None:
        logits = apply_penalties_from_counts(
            logits, meta, penalty_state[0], penalty_state[1]
        )
    else:
        logits = apply_penalties(logits, meta)
    if allowed_mask is not None:
        logits = jnp.where(allowed_mask, logits, NEG_INF)
    elif meta.vocab_mask_words is not None:
        # unpack the grammar bitmask (xgrammar apply_token_bitmask analog)
        allowed = unpack_mask_words(
            meta.vocab_mask_words, logits.shape[1]
        )
        logits = jnp.where(allowed, logits, NEG_INF)
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if meta.all_greedy:
        return greedy_ids

    scaled = logits / meta.temperature[:, None]
    masked = apply_top_k_top_p_min_p(scaled, meta)
    # Gumbel-max sampling (no per-row categorical loop)
    gumbel = -jnp.log(
        -jnp.log(
            jax.random.uniform(
                key, masked.shape, minval=1e-10, maxval=1.0
            )
        )
    )
    sampled = jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(meta.is_greedy, greedy_ids, sampled)


def compute_logprobs(logits: jax.Array, token_ids: jax.Array) -> jax.Array:
    """Log P(token) per row; logits [B, V], token_ids [B] -> [B]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, token_ids[:, None], axis=-1)[:, 0]


def compute_top_logprobs(logits: jax.Array, k: int):
    """Top-k logprobs of the raw distribution; [B, V] -> ([B,k] f32,
    [B,k] i32). Reference: logprob assembly in
    scheduler_post_process_mixin / convert_logprob_style."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(logp, k)
    return vals, ids.astype(jnp.int32)
