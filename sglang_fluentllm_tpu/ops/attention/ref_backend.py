"""Reference (pure-jnp) paged attention backend.

Analog of the reference's ``layers/attention/torch_native_backend.py`` /
``torch_native_mla_backend.py``: a numerically trustworthy implementation that
runs anywhere jnp runs (CPU tests, TPU fallback) and serves as the baseline
the Pallas kernels are validated against (mirroring how the reference
validates flashinfer/flashmla against torch natives).

All functions are pure and shape-static: the paged KV cache is gathered by
page table into dense ``[B, T, ...]`` tensors and masked by sequence lengths.
The Pallas backends implement the same contracts without materializing the
gathers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.mem.kv_cache import (
    MHAKVCache,
    MLAKVCache,
    MLAKVCacheFP8,
    mha_write,
    mla_write,
    mla_write_fp8,
)
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch

NEG_INF = -1e30


def _slot_ids(page_tables: jax.Array, page_size: int) -> jax.Array:
    B, P = page_tables.shape
    return (
        page_tables[:, :, None] * page_size
        + jnp.arange(page_size, dtype=page_tables.dtype)[None, None, :]
    ).reshape(B, P * page_size)


def page_gather(
    cache_layer: jax.Array,  # [slots, ...] (MLA latent layout)
    page_tables: jax.Array,  # [B, P]
    page_size: int,
) -> jax.Array:
    """Gather pages into dense [B, P*page_size, ...]."""
    return cache_layer[_slot_ids(page_tables, page_size)]


def page_gather_mha(
    cache_layer: jax.Array,  # [H_kv, slots, D]
    page_tables: jax.Array,  # [B, P]
    page_size: int,
) -> jax.Array:
    """Gather pages into dense [B, T, H_kv, D]."""
    slots = _slot_ids(page_tables, page_size)        # [B, T]
    g = cache_layer[:, slots]                        # [H, B, T, D]
    return jnp.transpose(g, (1, 2, 0, 3))


def _causal_mask(
    seq_lens: jax.Array,  # [B]
    q_lens: jax.Array,    # [B]
    S: int,
    T: int,
    custom_mask: Optional[jax.Array] = None,
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, S, T] bool: new token s (global pos seq_len - q_len + s) may
    attend kv position t iff t <= pos(s) and t < seq_len and s < q_len.
    ``window`` (scalar, 0/None = full) restricts to the last ``window``
    positions including self (HF sliding_window semantics)."""
    s_idx = jnp.arange(S, dtype=jnp.int32)[None, :, None]       # [1,S,1]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, None, :]       # [1,1,T]
    prefix = (seq_lens - q_lens)[:, None, None]                  # [B,1,1]
    mask = (t_idx <= prefix + s_idx) & (t_idx < seq_lens[:, None, None])
    mask &= s_idx < q_lens[:, None, None]
    if window is not None:
        w = jnp.asarray(window, jnp.int32)
        w = jnp.where(w > 0, w, jnp.int32(2**30))
        mask &= t_idx > prefix + s_idx - w
    if custom_mask is not None:
        # custom mask over the new-token block (spec-decode tree mask):
        # kv position prefix + j corresponds to draft token j.
        j = t_idx - prefix  # [B,1,T] index into the draft block
        in_block = (j >= 0) & (j < q_lens[:, None, None])
        Sm = custom_mask.shape[-1]
        jj = jnp.clip(j, 0, Sm - 1)
        cm = jnp.take_along_axis(
            custom_mask, jnp.broadcast_to(jj, custom_mask.shape[:2] + (T,)),
            axis=2,
        )
        mask &= jnp.where(in_block, cm, True)
    return mask


def mha_attend(
    q: jax.Array,        # [B, S, Hq, D]
    k: jax.Array,        # [B, T, Hk, D]
    v: jax.Array,        # [B, T, Hk, Dv]
    seq_lens: jax.Array,
    q_lens: jax.Array,
    sm_scale: float,
    custom_mask: Optional[jax.Array] = None,
    logit_cap: float = 0.0,
    window: Optional[jax.Array] = None,
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    B, S, Hq, D = q.shape
    Hk = k.shape[2]
    G = Hq // Hk
    # stream K/V in their STORAGE dtype (bf16 on TPU): upcasting first
    # would materialize a 2x-sized f32 copy of the whole history in HBM
    # per layer per step; the MXU accumulates in f32 regardless via
    # preferred_element_type (f32 pools on CPU are unchanged)
    qf = q.astype(k.dtype).reshape(B, S, Hk, G, D)
    scores = jnp.einsum(
        "bskgd,btkd->bkgst", qf, k,
        preferred_element_type=jnp.float32,
    ) * sm_scale
    if logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    mask = _causal_mask(
        seq_lens, q_lens, S, k.shape[1], custom_mask, window
    )
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    if sinks is not None:
        # attention sinks (gpt-oss): a learned per-head logit joins the
        # softmax denominator but contributes no value (reference
        # srt/layers/attention/ sink handling)
        sk = sinks.astype(jnp.float32).reshape(Hk, G)
        sk = sk[None, :, :, None, None]                  # [1,Hk,G,1,1]
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sk)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sk - m)
        probs = e / denom
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,btkd->bskgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, Hq, v.shape[-1]).astype(q.dtype)


class RefAttentionBackend:
    """MHA/GQA paged attention via gather + dense einsum."""

    name = "ref"

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
        window: Optional[jax.Array] = None,
        sinks: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, MHAKVCache]:
        from sglang_fluentllm_tpu.mem.kv_cache import WindowKV

        if isinstance(kv_cache, WindowKV):
            return self._dense_window(
                kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                logit_cap, window, sinks,
            )
        B, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B * S, Hk, D), v_new.reshape(B * S, Hk, D),
        )
        k = page_gather_mha(kv_cache.k[layer_id], batch.page_tables,
                            batch.page_size)[..., :D]
        v = page_gather_mha(kv_cache.v[layer_id], batch.page_tables,
                            batch.page_size)[..., :D]
        out = mha_attend(
            q, k, v, batch.seq_lens, batch.q_lens, sm_scale,
            batch.custom_mask, logit_cap, window=window, sinks=sinks,
        )
        return out, kv_cache

    def _dense_window(self, kv_cache, layer_id, q, k_new, v_new, batch,
                      sm_scale, logit_cap, window=None, sinks=None):
        """Fused-window decode over the DENSE gathered history (WindowKV):
        pure XLA, zero Mosaic launches in the hot loop — the axon runtime
        charges ~130 us fixed per pallas call, which dominates short-
        context decode (see kv_cache.WindowKV). New KV appends to both
        the dense buffer and the paged pool."""
        from sglang_fluentllm_tpu.mem.kv_cache import (
            WindowKV,
            mha_write,
        )
        from sglang_fluentllm_tpu.ops.attention.ref_backend import (
            mha_attend,
        )

        B, S, Hk, D = k_new.shape
        assert S == 1 and batch.mode.is_decode()
        # pool writes are DEFERRED to window_close (one bulk scatter per
        # fused window); appends touch only the dense buffer
        pool = kv_cache.pool
        pos = jnp.minimum(
            batch.seq_lens - 1, kv_cache.hk.shape[2] - 1
        )
        Dp = kv_cache.hk.shape[-1]
        if Dp != D:
            pad = ((0, 0), (0, 0), (0, 0), (0, Dp - D))
            k_new = jnp.pad(k_new, pad)
            v_new = jnp.pad(v_new, pad)
        bidx = jnp.arange(B, dtype=jnp.int32)
        hk = kv_cache.hk.at[layer_id, bidx, pos].set(k_new[:, 0])
        hv = kv_cache.hv.at[layer_id, bidx, pos].set(v_new[:, 0])
        out = mha_attend(
            q, hk[layer_id][..., :D], hv[layer_id][..., :D],
            batch.seq_lens, batch.q_lens, sm_scale,
            None, logit_cap, window=window, sinks=sinks,
        )
        return out, WindowKV(pool=pool, hk=hk, hv=hv)


class RefMLABackend:
    """MLA paged attention over compressed KV (reference
    ``deepseek_v2.py:622-1087`` forward_normal / forward_absorb semantics).

    Extend uses the "normal" path (decompress gathered latent KV through the
    kv_b projection); decode uses the "absorbed" path (query absorbed into
    latent space, scores/context computed on the 512-d latents directly).
    FP8 caches are dequantized per token on gather (SnapMLA layout).
    """

    name = "ref_mla"

    def __call__(
        self,
        kv_cache,
        layer_id: int,
        q_nope: jax.Array,   # [B, S, H, dn]
        q_pe: jax.Array,     # [B, S, H, dr] (rope applied)
        ckv_new: jax.Array,  # [B, S, r]
        kpe_new: jax.Array,  # [B, S, dr] (rope applied)
        batch: ForwardBatch,
        w_kc: jax.Array,     # [H, r, dn] (kv_b up-proj, K half)
        w_vc: jax.Array,     # [H, r, dv] (kv_b up-proj, V half)
        sm_scale: float,
    ) -> Tuple[jax.Array, object]:
        from sglang_fluentllm_tpu.mem.kv_cache import MLAWindowKV

        if isinstance(kv_cache, MLAWindowKV):
            return self._dense_window_mla(
                kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                batch, w_kc, w_vc, sm_scale,
            )
        B, S, H, dn = q_nope.shape
        kv_cache, ckv, kpe = self._write_gather(
            kv_cache, layer_id, ckv_new, kpe_new, batch
        )

        # absorbed path wins when the query block is short (decode/verify);
        # normal path amortizes the latent decompression over long prefills
        if batch.mode.is_decode() or S <= 4:
            out = self._absorbed(
                q_nope, q_pe, ckv, kpe, batch, w_kc, w_vc, sm_scale
            )
        else:
            out = self._normal(
                q_nope, q_pe, ckv, kpe, batch, w_kc, w_vc, sm_scale
            )
        return out, kv_cache

    def _dense_window_mla(self, kv_cache, layer_id, q_nope, q_pe,
                          ckv_new, kpe_new, batch, w_kc, w_vc, sm_scale):
        """Fused-window MLA decode against the dense dequantized latent
        history (MLAWindowKV): zero Mosaic launches in the hot loop and —
        for FP8 pools — per-token dequant amortized over the window."""
        from sglang_fluentllm_tpu.mem.kv_cache import (
            MLAKVCacheFP8,
            MLAWindowKV,
            mla_pack_rows,
            padded_head_dim,
        )

        B, S, H, dn = q_nope.shape
        assert S == 1 and batch.mode.is_decode()
        r = ckv_new.shape[-1]
        dr = kpe_new.shape[-1]
        r_pad = padded_head_dim(r)
        # pool writes are DEFERRED to mla_window_close (one bulk scatter
        # per fused window instead of L x k in-window scatters); appends
        # touch only the dense buffer
        pool = kv_cache.pool
        if isinstance(pool, MLAKVCacheFP8):
            # append the dequant-of-quantized row (in-window reads see
            # exactly what post-window paged reads will) with the raw
            # tail — rope plus the scale hi/lo lanes the deferred close
            # needs for its lossless requantization
            from sglang_fluentllm_tpu.mem.kv_cache import (
                fp8_tail_unpack,
                mla_pack_fp8_rows,
            )

            q8, tail = mla_pack_fp8_rows(
                ckv_new.reshape(B, r), kpe_new.reshape(B, dr),
                pool.tail.shape[-1],
            )
            _, scale = fp8_tail_unpack(tail, dr)
            deq = (q8.astype(jnp.float32) * scale).astype(
                kv_cache.hlat.dtype
            )
            parts = [deq]
            if r_pad > r:
                parts.append(jnp.zeros((B, r_pad - r),
                                       kv_cache.hlat.dtype))
            parts.append(tail.astype(kv_cache.hlat.dtype))
            row = jnp.concatenate(parts, axis=-1)
        else:
            row = mla_pack_rows(
                ckv_new.reshape(B, r), kpe_new.reshape(B, dr),
                kv_cache.hlat.shape[-1], kv_cache.hlat.dtype,
            )
        pos = jnp.minimum(
            batch.seq_lens - 1, kv_cache.hlat.shape[2] - 1
        )
        bidx = jnp.arange(B, dtype=jnp.int32)
        hlat = kv_cache.hlat.at[layer_id, bidx, pos].set(row)
        lat = hlat[layer_id]
        # slices stay in storage dtype — _absorbed streams them directly
        # (an astype here would materialize an f32 copy of the window
        # history per layer per step)
        out = self._absorbed(
            q_nope, q_pe,
            lat[..., :r],
            lat[..., r_pad:r_pad + dr],
            batch, w_kc, w_vc, sm_scale,
        )
        return out, MLAWindowKV(pool=pool, hlat=hlat)

    def _write_gather(self, kv_cache, layer_id, ckv_new, kpe_new, batch):
        """Write the new latents into the pool and gather the full dense
        latent sequence [B, T, r] / rope keys [B, T, dr] (f32, dequantized
        for FP8 pools)."""
        B, S, r = ckv_new.shape
        dr = kpe_new.shape[-1]
        loc = batch.out_cache_loc.reshape(-1)
        if isinstance(kv_cache, MLAKVCacheFP8):
            kv_cache = mla_write_fp8(
                kv_cache, layer_id, loc,
                ckv_new.reshape(B * S, r),
                kpe_new.reshape(B * S, -1),
            )
            from sglang_fluentllm_tpu.mem.kv_cache import fp8_tail_unpack

            ckv = page_gather(kv_cache.ckv[layer_id], batch.page_tables,
                              batch.page_size)      # [B, T, r] fp8
            tail = page_gather(kv_cache.tail[layer_id], batch.page_tables,
                               batch.page_size)     # [B, T, tail_pad]
            kpe, scale = fp8_tail_unpack(tail, dr)  # [B,T,dr], [B,T,1]
            # dequant to bf16 (matches mla_window_gather): streaming the
            # history at 2 bytes/el instead of 4 halves the HBM term
            ckv = (ckv.astype(jnp.float32) * scale).astype(tail.dtype)
            kpe = kpe.astype(tail.dtype)
        else:
            kv_cache = mla_write(
                kv_cache, layer_id, loc,
                ckv_new.reshape(B * S, r),
                kpe_new.reshape(B * S, -1),
            )
            from sglang_fluentllm_tpu.mem.kv_cache import padded_head_dim

            r_pad = padded_head_dim(r)
            lat = page_gather(kv_cache.lat[layer_id], batch.page_tables,
                              batch.page_size)      # [B, T, r_pad+rope_pad]
            ckv = lat[..., :r]
            kpe = lat[..., r_pad : r_pad + dr]
        return kv_cache, ckv, kpe

    def _absorbed(self, q_nope, q_pe, ckv, kpe, batch, w_kc, w_vc, sm_scale):
        # ckv/kpe arrive in STORAGE dtype and stay there: upcasting the
        # dense latent history would materialize a 2x f32 copy in HBM per
        # layer per step (the dominant decode stream); the MXU still
        # accumulates in f32 via preferred_element_type
        qf = q_nope.astype(jnp.float32)
        q_abs = jnp.einsum("bshd,hrd->bshr", qf, w_kc.astype(jnp.float32))
        scores = jnp.einsum(
            "bshr,btr->bhst", q_abs.astype(ckv.dtype), ckv,
            preferred_element_type=jnp.float32,
        )
        scores += jnp.einsum(
            "bshd,btd->bhst", q_pe.astype(kpe.dtype), kpe,
            preferred_element_type=jnp.float32,
        )
        scores *= sm_scale
        S, T = q_nope.shape[1], ckv.shape[1]
        mask = _causal_mask(batch.seq_lens, batch.q_lens, S, T,
                            batch.custom_mask)
        scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhst,btr->bshr", probs.astype(ckv.dtype), ckv,
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum("bshr,hrd->bshd", ctx, w_vc.astype(jnp.float32))
        return out.astype(q_nope.dtype)

    def _normal(self, q_nope, q_pe, ckv, kpe, batch, w_kc, w_vc, sm_scale):
        # decompress latents to per-head K/V then run dense attention
        k_nope = jnp.einsum(
            "btr,hrd->bthd", ckv, w_kc.astype(ckv.dtype),
            preferred_element_type=jnp.float32,
        )
        v = jnp.einsum(
            "btr,hrd->bthd", ckv, w_vc.astype(ckv.dtype),
            preferred_element_type=jnp.float32,
        )
        H = q_nope.shape[2]
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(
                kpe[:, :, None, :], kpe.shape[:2] + (H, kpe.shape[-1])
            )],
            axis=-1,
        )
        q = jnp.concatenate([q_nope, q_pe], axis=-1)
        return mha_attend(
            q, k.astype(q.dtype), v.astype(q.dtype),
            batch.seq_lens, batch.q_lens, sm_scale, batch.custom_mask,
        )
