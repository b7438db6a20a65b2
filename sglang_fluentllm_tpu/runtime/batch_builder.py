"""Host-side batch construction: ragged request state -> padded ForwardBatch.

Fields stay NUMPY here: the runner packs them into a single transfer
(runtime/packing.py) before dispatch.

This is the narrowing stage of the reference's
ScheduleBatch -> ModelWorkerBatch -> ForwardBatch pipeline (SURVEY A.3),
with the TPU twist that every tensor is padded to a bucket shape so the jit
cache stays small (the role CUDA-graph padding plays in the reference,
``cuda_graph_runner.py:460-525``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch, ForwardMode
from sglang_fluentllm_tpu.ops.over_embedding import RING_W
from sglang_fluentllm_tpu.utils import next_power_of_2, pick_bucket


@dataclasses.dataclass
class ExtendItem:
    """Per-request host data for one extend (prefill/chunk) forward."""

    input_ids: np.ndarray   # [extend_len] new token ids
    prefix_len: int         # tokens already cached
    slots: np.ndarray       # [extend_len] kv slots for the new tokens
    pages: np.ndarray       # pages covering prefix+extend
    state_idx: int = -1     # hybrid-linear state row (req_pool_idx)
    # over-embedding: the RING_W tokens before prefix_len (0-padded below
    # position 0; all -1 = unknown host-side, model reads its device ring)
    hist_tail: np.ndarray = None


@dataclasses.dataclass
class DecodeItem:
    input_id: int           # last sampled token (or negative future slot)
    seq_len: int            # total length including this token
    slots: np.ndarray       # [k] kv slots for steps 0..k-1
    pages: np.ndarray
    state_idx: int = -1     # hybrid-linear state row (req_pool_idx)


class BatchBuilder:
    def __init__(self, page_size: int, decode_bs_buckets: Sequence[int],
                 prefill_token_buckets: Sequence[int],
                 min_pages_bucket: int = 8,
                 dp_groups: int = 1, page_stride: int = 0):
        self.page_size = page_size
        self.decode_bs_buckets = list(decode_bs_buckets)
        self.prefill_token_buckets = list(prefill_token_buckets)
        self.min_pages_bucket = min_pages_bucket
        # DP-attention: group-major row layout; page/slot ids arrive GLOBAL
        # from the GroupedKVAllocator and are converted to group-local here
        # (the device-side pool is per-group)
        self.dp_groups = dp_groups
        self.page_stride = page_stride

    def _grouped(self, items, groups, build, pad_item):
        """Group-major layout: rows_per_group identical across groups so
        shard_map over 'dp' sees aligned row blocks. Returns
        (ForwardBatch, row_index_per_item)."""
        G = self.dp_groups
        per: List[List] = [[] for _ in range(G)]
        order: List[List[int]] = [[] for _ in range(G)]
        for i, (it, g) in enumerate(zip(items, groups)):
            per[g].append(self._localize(it, g))
            order[g].append(i)
        n = max(len(p) for p in per)
        rpg = pick_bucket([1, 2, 4, 8, 16, 32, 64, 128, 256], n)
        rows = [0] * len(items)
        flat: List = []
        for g in range(G):
            for j, i in enumerate(order[g]):
                rows[i] = g * rpg + j
            flat.extend(per[g])
            flat.extend(pad_item() for _ in range(rpg - len(per[g])))
        batch = build(flat, rpg)
        return batch, rows

    def _localize(self, it, g: int):
        """Global page/slot ids -> group-local (page 0 stays the pad page)."""
        if g == 0 or self.page_stride == 0:
            return it
        pb = np.int32(g * self.page_stride)
        return dataclasses.replace(
            it,
            slots=np.asarray(it.slots, np.int32) - pb * self.page_size,
            pages=np.asarray(it.pages, np.int32) - pb,
        )

    def _pages_bucket(self, max_pages: int) -> int:
        # finer-than-pow2 buckets below 64 pages: dense-window attention
        # re-reads the WHOLE padded bucket EVERY in-window step, so each
        # pad page costs B * page_size * kv_cell bytes PER STEP (~0.13
        # ms/step per two pages at the bench geometry — round-5 step-byte
        # accounting closed the engine-vs-harness gap on exactly this).
        # Multiples of 2 up to 32 pages cap the waste at one page-pair
        # per row; of 4 up to 64; pow2 beyond (a few extra jit shapes,
        # compiled once).
        if max_pages <= 32:
            return max(self.min_pages_bucket, -(-max_pages // 2) * 2)
        if max_pages <= 64:
            return max(self.min_pages_bucket, -(-max_pages // 4) * 4)
        return next_power_of_2(max_pages)

    def build_extend_grouped(self, items: List[ExtendItem],
                             groups: Sequence[int]):
        """DP-attention extend: (batch, row_index_per_item)."""
        return self._grouped(
            items, groups,
            lambda flat, rpg: self.build_extend(flat, _force_bp=len(flat)),
            lambda: ExtendItem(
                input_ids=np.zeros((0,), np.int32), prefix_len=0,
                slots=np.zeros((0,), np.int32),
                pages=np.zeros((0,), np.int32),
            ),
        )

    def build_decode_grouped(self, items: List[DecodeItem],
                             groups: Sequence[int]):
        """DP-attention decode: (batch, row_index_per_item)."""
        k = len(items[0].slots)
        return self._grouped(
            items, groups,
            lambda flat, rpg: self.build_decode(flat, _force_bp=len(flat)),
            lambda: DecodeItem(
                input_id=0, seq_len=0,
                slots=np.zeros((k,), np.int32),
                pages=np.zeros((0,), np.int32),
            ),
        )

    def build_extend(self, items: List[ExtendItem],
                     mode: ForwardMode = ForwardMode.EXTEND,
                     custom_mask: Optional[np.ndarray] = None,
                     _force_bp: Optional[int] = None) -> ForwardBatch:
        B = len(items)
        Bp = _force_bp or pick_bucket([1, 2, 4, 8, 16, 32], B)
        S = pick_bucket(
            self.prefill_token_buckets, max(len(it.input_ids) for it in items)
        )
        P = self._pages_bucket(max(len(it.pages) for it in items))

        input_ids = np.zeros((Bp, S), dtype=np.int32)
        positions = np.zeros((Bp, S), dtype=np.int32)
        out_loc = np.zeros((Bp, S), dtype=np.int32)
        pages = np.zeros((Bp, P), dtype=np.int32)
        seq_lens = np.zeros((Bp,), dtype=np.int32)
        q_lens = np.zeros((Bp,), dtype=np.int32)
        state_idx = np.full((Bp,), -1, dtype=np.int32)
        hist_tail = np.zeros((Bp, RING_W), dtype=np.int32)
        runs = True
        for i, it in enumerate(items):
            e = len(it.input_ids)
            if it.hist_tail is not None and len(it.hist_tail):
                hist_tail[i, -len(it.hist_tail):] = it.hist_tail
            input_ids[i, :e] = it.input_ids
            positions[i, :e] = np.arange(it.prefix_len, it.prefix_len + e)
            out_loc[i, :e] = it.slots
            pages[i, : len(it.pages)] = it.pages
            seq_lens[i] = it.prefix_len + e
            q_lens[i] = e
            state_idx[i] = it.state_idx
            if runs and len(it.pages) > 1:
                runs = bool((np.diff(it.pages) == 1).all())
        cm = None
        if custom_mask is not None:
            cm = np.zeros((Bp, S, S), dtype=bool)
            cm[: custom_mask.shape[0], : custom_mask.shape[1],
               : custom_mask.shape[2]] = custom_mask
        return ForwardBatch(
            input_ids=input_ids,
            positions=positions,
            out_cache_loc=out_loc,
            page_tables=pages,
            seq_lens=seq_lens,
            q_lens=q_lens,
            custom_mask=cm,
            state_idx=state_idx,
            hist_tail=hist_tail,
            mode=mode,
            page_size=self.page_size,
            pages_are_runs=runs,
        )

    def build_decode(self, items: List[DecodeItem],
                     mode: ForwardMode = ForwardMode.DECODE,
                     _force_bp: Optional[int] = None) -> ForwardBatch:
        """[B, k]-shaped decode batch: column j holds step j's kv slot
        (k > 1 = fused multi-step decode, one device dispatch)."""
        B = len(items)
        k = len(items[0].slots)
        Bp = _force_bp or pick_bucket(self.decode_bs_buckets, B)
        P = self._pages_bucket(max(len(it.pages) for it in items))

        input_ids = np.zeros((Bp, k), dtype=np.int32)
        positions = np.zeros((Bp, k), dtype=np.int32)
        out_loc = np.zeros((Bp, k), dtype=np.int32)
        pages = np.zeros((Bp, P), dtype=np.int32)
        seq_lens = np.zeros((Bp,), dtype=np.int32)
        q_lens = np.zeros((Bp,), dtype=np.int32)
        state_idx = np.full((Bp,), -1, dtype=np.int32)
        runs = True
        for i, it in enumerate(items):
            input_ids[i, 0] = it.input_id
            # max(...): idle dp-attention pad rows carry seq_len 0 and must
            # keep position 0 like bucket-pad rows
            positions[i, 0] = max(it.seq_len - 1, 0)
            out_loc[i, :] = it.slots
            pages[i, : len(it.pages)] = it.pages
            seq_lens[i] = it.seq_len
            q_lens[i] = 1 if it.seq_len > 0 else 0
            state_idx[i] = it.state_idx
            if runs and len(it.pages) > 1:
                runs = bool((np.diff(it.pages) == 1).all())
        return ForwardBatch(
            input_ids=input_ids,
            positions=positions,
            out_cache_loc=out_loc,
            page_tables=pages,
            seq_lens=seq_lens,
            q_lens=q_lens,
            state_idx=state_idx,
            mode=mode,
            page_size=self.page_size,
            pages_are_runs=runs,
        )
