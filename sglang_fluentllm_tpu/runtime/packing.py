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


def pack_batch(
    fb: ForwardBatch, sm: SamplingMetadata
) -> Tuple[np.ndarray, np.ndarray, BatchMeta]:
    """fb/sm hold NUMPY arrays here (host-side build)."""
    B, S = fb.input_ids.shape
    P = fb.page_tables.shape[1]
    ints = np.concatenate([
        np.asarray(fb.input_ids, np.int32).ravel(),
        np.asarray(fb.positions, np.int32).ravel(),
        np.asarray(fb.out_cache_loc, np.int32).ravel(),
        np.asarray(fb.page_tables, np.int32).ravel(),
        np.asarray(fb.seq_lens, np.int32),
        np.asarray(fb.q_lens, np.int32),
        np.asarray(sm.top_k, np.int32),
        np.asarray(sm.is_greedy, np.int32),
    ])
    floats = np.concatenate([
        np.asarray(sm.temperature, np.float32),
        np.asarray(sm.top_p, np.float32),
        np.asarray(sm.min_p, np.float32),
    ])
    meta = BatchMeta(
        B=B, S=S, P=P, mode=fb.mode, page_size=fb.page_size,
        all_greedy=bool(sm.all_greedy),
        has_mask=fb.custom_mask is not None,
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
    fb = ForwardBatch(
        input_ids=input_ids,
        positions=positions,
        out_cache_loc=out_loc,
        page_tables=pages,
        seq_lens=seq_lens,
        q_lens=q_lens,
        custom_mask=custom_mask,
        mode=meta.mode,
        page_size=meta.page_size,
    )
    sm = SamplingMetadata(
        temperature=floats[0:B],
        top_p=floats[B : 2 * B],
        min_p=floats[2 * B : 3 * B],
        top_k=top_k,
        is_greedy=is_greedy,
        all_greedy=meta.all_greedy,
    )
    return fb, sm
