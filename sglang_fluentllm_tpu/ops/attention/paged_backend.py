"""Paged attention backend: Pallas decode kernels + extend paths.

The production MHA/GQA backend (role of the reference's flashinfer backend,
``attn_initializer.py:378`` registry).

Kernel selection (hard-won XLA lesson, see pallas_decode_multirow.py):
interleaving a host-side KV scatter (``mha_write``) with a pallas call that
consumes the FULL stacked pool forces XLA's copy-insertion to duplicate the
pool every layer (~100 ms/step at 0.5B scale). The fused-write multirow
kernel therefore performs the KV write ITSELF (in-kernel DMA) so the whole
layer scan is a pure aliased-pallas chain — measured copy-free. The stock
``jax.experimental`` paged kernel remains available as
``--attention-backend paged_stock`` (it needs the scatter + a per-layer
dynamic-slice copy of one layer).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.mem.kv_cache import MHAKVCache, mha_write
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
        window=None,
        sinks=None,
    ) -> Tuple[jax.Array, MHAKVCache]:
        from sglang_fluentllm_tpu.mem.kv_cache import WindowKV

        if isinstance(kv_cache, WindowKV):
            return self._dense_window(
                kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                logit_cap, window, sinks,
            )
        if not batch.mode.is_decode():
            return self._extend(
                kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                logit_cap, window, sinks,
            )
        B, S, Hk, D = k_new.shape
        assert S == 1
        Dp = kv_cache.k.shape[-1]
        q2 = q[:, 0]
        if Dp != D:
            pad3 = ((0, 0), (0, 0), (0, Dp - D))
            q2 = jnp.pad(q2, pad3)
            k_new = jnp.pad(k_new[:, 0], pad3)[:, None]
            v_new = jnp.pad(v_new[:, 0], pad3)[:, None]

        from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
            paged_decode_multirow,
        )

        # fused-write kernel: writes k_new/v_new to their slots in-kernel
        # and attends with the current token from VMEM — the pool flows
        # through as a pure aliased operand chain (no copies in the scan)
        out, k2, v2 = paged_decode_multirow(
            q2, kv_cache.k, kv_cache.v, layer_id,
            batch.page_tables, batch.seq_lens,
            k_new=k_new[:, 0], v_new=v_new[:, 0],
            new_slots=batch.out_cache_loc[:, 0],
            window=window if window is not None else 0, sinks=sinks,
            page_size=batch.page_size, sm_scale=sm_scale,
            logit_cap=logit_cap, run_only=batch.pages_are_runs,
        )
        kv_cache = MHAKVCache(k=k2, v=v2)
        return out[:, None, :, :D], kv_cache

    def _extend(self, kv_cache, layer_id, q, k_new, v_new, batch,
                sm_scale, logit_cap, window=None, sinks=None):
        """Extend path: scatter the new KV into the pool, then run the
        ragged Pallas flash prefill directly over the paged pool — no dense
        per-layer gather and no O(S*T) score materialization (reference
        ``flash_attention_backend.py`` extend role). Spec-decode tree masks
        (``custom_mask``) fall back to the dense reference path."""
        B, S, Hk, D = k_new.shape
        Hq = q.shape[2]
        if batch.custom_mask is not None or Hq % Hk:
            return RefAttentionBackend.__call__(
                self, kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                logit_cap, window=window, sinks=sinks,
            )
        Dp = kv_cache.k.shape[-1]
        q2 = q
        if Dp != D:
            q2 = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))

        from sglang_fluentllm_tpu.ops.attention.pallas_prefill import (
            paged_prefill_attention,
        )

        # fused write: the kernel itself stores the new tokens' KV from a
        # page-aligned staging — a host-side scatter before an aliased
        # pallas call would make XLA copy the whole pool every layer
        out, k2, v2 = paged_prefill_attention(
            q2, kv_cache.k, kv_cache.v, layer_id,
            batch.page_tables, batch.seq_lens, batch.q_lens,
            k_new=k_new, v_new=v_new,
            window=window if window is not None else 0, sinks=sinks,
            page_size=batch.page_size, sm_scale=sm_scale,
            logit_cap=logit_cap, run_only=batch.pages_are_runs,
        )
        return out[..., :D], MHAKVCache(k=k2, v=v2)


class StockPagedAttentionBackend(RefAttentionBackend):
    """Decode through the stock jax.experimental paged kernel (per-layer
    dynamic-slice copy + host-side scatter write); kept for comparison
    (--attention-backend paged_stock)."""

    name = "paged_stock"

    def __call__(self, kv_cache, layer_id, q, k_new, v_new, batch,
                 sm_scale, logit_cap=0.0, window=None, sinks=None):
        if not batch.mode.is_decode() or window is not None \
                or sinks is not None:
            return RefAttentionBackend.__call__(
                self, kv_cache, layer_id, q, k_new, v_new, batch,
                sm_scale, logit_cap, window=window, sinks=sinks,
            )
        B, S, Hk, D = k_new.shape
        assert S == 1
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B, Hk, D), v_new.reshape(B, Hk, D),
        )
        Dp = kv_cache.k.shape[-1]
        q2 = (q[:, 0] * sm_scale).astype(q.dtype)
        if Dp != D:
            q2 = jnp.pad(q2, ((0, 0), (0, 0), (0, Dp - D)))

        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention,
        )

        ps = batch.page_size
        k_pages = kv_cache.k[layer_id].reshape(Hk, -1, ps, Dp)
        v_pages = kv_cache.v[layer_id].reshape(Hk, -1, ps, Dp)
        ppcb = 8
        P = batch.page_tables.shape[1]
        P_pad = -(-P // ppcb) * ppcb
        pt = batch.page_tables
        if P_pad != P:
            pt = jnp.pad(pt, ((0, 0), (0, P_pad - P)))
        lengths = jnp.maximum(batch.seq_lens, 1)
        out = paged_attention(
            q2, k_pages, v_pages, lengths, pt,
            pages_per_compute_block=min(ppcb, P_pad),
            attn_logits_soft_cap=logit_cap if logit_cap > 0 else None,
        )
        return out[:, None, :, :D], kv_cache
