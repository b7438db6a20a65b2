"""Packed host->device batch transfer.

The axon-tunneled TPU pays ~2 ms per host->device transfer regardless of
size, so shipping a decode batch as ~11 small arrays costs more than the
forward itself. All int32 batch fields are packed into ONE flat vector (and
the f32 sampling fields into another); the jitted step unpacks them with
static offsets. Two transfers per step, total.

(The reference has no analog — CUDA H2D copies are cheap — this is a
TPU/axon-specific host-pipeline optimization.)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch, ForwardMode


class BatchMeta(NamedTuple):
    """Static (hashable) shape/config info for one packed batch."""

    B: int
    S: int
    P: int
    mode: ForwardMode
    page_size: int
    all_greedy: bool
    has_mask: bool = False
    pen_len: int = 0      # penalized-token window (0 = no penalties)
    n_eos: int = 0        # eos-mask width for min_new_tokens
    n_mask_words: int = 0  # grammar bitmask words (0 = unconstrained)
    topk: int = 0         # top-k logprobs per sampled token (0 = off)
    inp_lp: bool = False  # per-position input-token logprobs (extend)
    runs: bool = False    # all page lists are consecutive runs
    has_state: bool = False  # hybrid-linear state_idx present
    want_lp: bool = False    # some request wants sampled-token logprobs
    hist_w: int = 0          # over-embedding history tail width (0 = none)
    has_think: bool = False  # thinking-budget arrays present
    has_custom: bool = False  # custom logit processors (pure_callback)


def pack_batch(
    fb: ForwardBatch, sm: SamplingMetadata
) -> Tuple[np.ndarray, np.ndarray, BatchMeta]:
    """fb/sm hold NUMPY arrays here (host-side build)."""
    B, S = fb.input_ids.shape
    P = fb.page_tables.shape[1]
    int_parts = [
        np.asarray(fb.input_ids, np.int32).ravel(),
        np.asarray(fb.positions, np.int32).ravel(),
        np.asarray(fb.out_cache_loc, np.int32).ravel(),
        np.asarray(fb.page_tables, np.int32).ravel(),
        np.asarray(fb.seq_lens, np.int32),
        np.asarray(fb.q_lens, np.int32),
        np.asarray(sm.top_k, np.int32),
        np.asarray(sm.is_greedy, np.int32),
    ]
    if fb.state_idx is not None:
        int_parts.append(np.asarray(fb.state_idx, np.int32))
    hist_w = 0
    if fb.hist_tail is not None:
        hist_w = fb.hist_tail.shape[1]
        int_parts.append(np.asarray(fb.hist_tail, np.int32).ravel())
    if sm.think_stop is not None:
        int_parts.append(np.asarray(sm.think_stop, np.int32))
        int_parts.append(np.asarray(sm.think_end, np.int32))
    float_parts = [
        np.asarray(sm.temperature, np.float32),
        np.asarray(sm.top_p, np.float32),
        np.asarray(sm.min_p, np.float32),
    ]
    pen_len = n_eos = n_mask_words = 0
    if sm.vocab_mask_words is not None:
        n_mask_words = sm.vocab_mask_words.shape[1]
        int_parts.append(
            np.asarray(sm.vocab_mask_words).view(np.int32).ravel()
        )
    if sm.penalized_ids is not None:
        pen_len = sm.penalized_ids.shape[1]
        n_eos = sm.eos_mask_ids.shape[1]
        int_parts += [
            np.asarray(sm.penalized_ids, np.int32).ravel(),
            np.asarray(sm.eos_mask_ids, np.int32).ravel(),
            np.asarray(sm.min_new_remaining, np.int32),
        ]
        float_parts += [
            np.asarray(sm.frequency_penalty, np.float32),
            np.asarray(sm.presence_penalty, np.float32),
            np.asarray(sm.repetition_penalty, np.float32),
        ]
    ints = np.concatenate(int_parts)
    floats = np.concatenate(float_parts)
    meta = BatchMeta(
        B=B, S=S, P=P, mode=fb.mode, page_size=fb.page_size,
        all_greedy=bool(sm.all_greedy),
        has_mask=fb.custom_mask is not None,
        pen_len=pen_len, n_eos=n_eos, n_mask_words=n_mask_words,
        topk=int(sm.top_logprobs_num),
        inp_lp=bool(sm.return_input_logprob),
        runs=bool(fb.pages_are_runs),
        has_state=fb.state_idx is not None,
        want_lp=bool(sm.want_logprobs),
        hist_w=hist_w,
        has_think=sm.think_stop is not None,
        has_custom=sm.custom_procs is not None,
    )
    return ints, floats, meta


def unpack_batch(
    ints: jnp.ndarray,
    floats: jnp.ndarray,
    meta: BatchMeta,
    custom_mask=None,
) -> Tuple[ForwardBatch, SamplingMetadata]:
    """Runs inside jit; all offsets are static."""
    B, S, P = meta.B, meta.S, meta.P
    o = 0

    def take(n):
        nonlocal o
        v = ints[o : o + n]
        o += n
        return v

    input_ids = take(B * S).reshape(B, S)
    positions = take(B * S).reshape(B, S)
    out_loc = take(B * S).reshape(B, S)
    pages = take(B * P).reshape(B, P)
    seq_lens = take(B)
    q_lens = take(B)
    top_k = take(B)
    is_greedy = take(B).astype(bool)
    state_idx = take(B) if meta.has_state else None
    hist_tail = (take(B * meta.hist_w).reshape(B, meta.hist_w)
                 if meta.hist_w else None)
    think_stop = think_end = None
    if meta.has_think:
        think_stop = take(B)
        think_end = take(B)
    penalized_ids = eos_mask_ids = min_new_remaining = None
    freq = pres = rep = None
    vocab_mask_words = None
    if meta.n_mask_words:
        vocab_mask_words = take(B * meta.n_mask_words).reshape(
            B, meta.n_mask_words
        )
    if meta.pen_len:
        penalized_ids = take(B * meta.pen_len).reshape(B, meta.pen_len)
        eos_mask_ids = take(B * meta.n_eos).reshape(B, meta.n_eos)
        min_new_remaining = take(B)
        freq = floats[3 * B : 4 * B]
        pres = floats[4 * B : 5 * B]
        rep = floats[5 * B : 6 * B]
    fb = ForwardBatch(
        input_ids=input_ids,
        positions=positions,
        out_cache_loc=out_loc,
        page_tables=pages,
        seq_lens=seq_lens,
        q_lens=q_lens,
        custom_mask=custom_mask,
        state_idx=state_idx,
        hist_tail=hist_tail,
        mode=meta.mode,
        page_size=meta.page_size,
        pages_are_runs=meta.runs,
    )
    sm = SamplingMetadata(
        temperature=floats[0:B],
        top_p=floats[B : 2 * B],
        min_p=floats[2 * B : 3 * B],
        top_k=top_k,
        is_greedy=is_greedy,
        all_greedy=meta.all_greedy,
        frequency_penalty=freq,
        presence_penalty=pres,
        repetition_penalty=rep,
        penalized_ids=penalized_ids,
        eos_mask_ids=eos_mask_ids,
        min_new_remaining=min_new_remaining,
        vocab_mask_words=vocab_mask_words,
        think_stop=think_stop,
        think_end=think_end,
        top_logprobs_num=meta.topk,
        return_input_logprob=meta.inp_lp,
        want_logprobs=meta.want_lp,
    )
    return fb, sm
