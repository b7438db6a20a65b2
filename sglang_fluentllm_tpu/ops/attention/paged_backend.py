"""Paged attention backend: Pallas decode kernel + jnp extend path.

The production MHA/GQA backend (role of the reference's flashinfer backend,
``attn_initializer.py:378`` registry): decode steps run the Pallas
flash-decode kernel over the page table; extend steps use the dense-gather
reference path (prefill is MXU-bound, where XLA's fused attention is already
strong — a ragged Pallas prefill kernel can slot in here later).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.mem.kv_cache import MHAKVCache, mha_write
from sglang_fluentllm_tpu.ops.attention.pallas_decode import (
    paged_decode_attention,
)
from sglang_fluentllm_tpu.ops.attention.ref_backend import RefAttentionBackend
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


class PagedAttentionBackend(RefAttentionBackend):
    name = "paged"

    def __call__(
        self,
        kv_cache: MHAKVCache,
        layer_id: int,
        q: jax.Array,       # [B, S, Hq, D]
        k_new: jax.Array,   # [B, S, Hk, D]
        v_new: jax.Array,   # [B, S, Hk, D]
        batch: ForwardBatch,
        sm_scale: float,
        logit_cap: float = 0.0,
    ) -> Tuple[jax.Array, MHAKVCache]:
        if not batch.mode.is_decode():
            if batch.custom_mask is not None:
                # spec-verify tree masks stay on the reference path
                return super().__call__(
                    kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                    logit_cap,
                )
            return self._extend(
                kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                logit_cap,
            )
        B, S, Hk, D = k_new.shape
        assert S == 1
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B, Hk, D), v_new.reshape(B, Hk, D),
        )
        Dp = kv_cache.k.shape[-1]
        q2 = q[:, 0]
        if Dp != D:
            q2 = jnp.pad(q2, ((0, 0), (0, 0), (0, Dp - D)))

        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            paged_decode_multirow,
        )

        # stacked-cache call: no per-layer dynamic-slice copy of the pool;
        # the pool threads THROUGH the kernel (aliased) to stay in place
        out, k2, v2 = paged_decode_multirow(
            q2, kv_cache.k, kv_cache.v, layer_id,
            batch.page_tables, batch.seq_lens,
            page_size=batch.page_size, sm_scale=sm_scale,
            logit_cap=logit_cap, run_only=batch.pages_are_runs,
        )
        kv_cache = MHAKVCache(k=k2, v=v2)
        return out[:, None, :, :D], kv_cache

    def _extend(self, kv_cache, layer_id, q, k_new, v_new, batch,
                sm_scale, logit_cap):
        """Ragged Pallas prefill over the page table (no dense gather)."""
        from sglang_fluentllm_tpu.ops.attention.pallas_prefill import (
            paged_prefill_attention,
        )

        B, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B * S, Hk, D), v_new.reshape(B * S, Hk, D),
        )
        Dp = kv_cache.k.shape[-1]
        q2 = q
        if Dp != D:
            q2 = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        out, k2, v2 = paged_prefill_attention(
            q2, kv_cache.k, kv_cache.v, layer_id,
            batch.page_tables, batch.seq_lens, batch.q_lens,
            page_size=batch.page_size, sm_scale=sm_scale,
            logit_cap=logit_cap, run_only=batch.pages_are_runs,
        )
        kv_cache = MHAKVCache(k=k2, v=v2)
        return out[..., :D], kv_cache
