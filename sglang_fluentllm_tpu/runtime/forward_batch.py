"""ForwardBatch — the single struct every kernel reads.

Analog of the reference's ``model_executor/forward_batch_info.py``
(``ForwardMode:61``, ``ForwardBatch:160``), re-designed for XLA: all tensors
are padded to static bucket shapes; real lengths travel as device arrays and
masks, never as Python control flow.

Layout choice (TPU-first): extend batches are dense ``[B, S_pad]`` (requests
x padded new-token count) rather than the reference's flat ragged layout —
dense tiles map onto the MXU and keep shapes static. Decode is ``[B, 1]``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax


class ForwardMode(enum.IntEnum):
    EXTEND = 1
    DECODE = 2
    IDLE = 3
    TARGET_VERIFY = 4
    DRAFT_EXTEND = 5

    def is_extend(self):
        return self in (
            ForwardMode.EXTEND,
            ForwardMode.TARGET_VERIFY,
            ForwardMode.DRAFT_EXTEND,
        )

    def is_decode(self):
        return self == ForwardMode.DECODE


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForwardBatch:
    # --- device tensors (padded to bucket shapes) ---
    input_ids: jax.Array      # [B, S] i32
    positions: jax.Array      # [B, S] i32 (global position of each new token)
    out_cache_loc: jax.Array  # [B, S] i32 token slots for the new KV
    page_tables: jax.Array    # [B, P] i32 page ids (padding page = 0)
    seq_lens: jax.Array       # [B] i32 total tokens incl. new ones
    q_lens: jax.Array         # [B] i32 new tokens this step (0 = padded row)
    # optional custom attention mask for speculative verify:
    # [B, S, S] bool over the new-token block (None outside TARGET_VERIFY)
    custom_mask: Optional[jax.Array] = None
    # hybrid-linear models (mamba/GDN pools): per-row recurrent-state row
    # index (req_pool_idx; -1 on padded rows -> trash row). None for pure
    # paged-attention models.
    state_idx: Optional[jax.Array] = None  # [B] i32
    # over-embedding models: last RING_W tokens before each row's chunk
    # (0 below position 0; -1 = host doesn't know, read the device ring —
    # mixed decode-as-extend rows under the overlap scheduler)
    hist_tail: Optional[jax.Array] = None  # [B, RING_W] i32

    # --- static metadata (hashable; changes trigger recompile) ---
    mode: ForwardMode = dataclasses.field(
        default=ForwardMode.EXTEND, metadata=dict(static=True)
    )
    page_size: int = dataclasses.field(default=16, metadata=dict(static=True))
    # host-proved: every request's page list is a single consecutive run
    # (lets the Pallas kernels compile without per-page DMA fallbacks)
    pages_are_runs: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def batch_size(self) -> int:
        return self.input_ids.shape[0]

    @property
    def seq_width(self) -> int:
        return self.input_ids.shape[1]
