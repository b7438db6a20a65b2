"""MLA paged decode via the multi-row Pallas MLA kernels.

The flashmla-analog production path (reference ``flashmla_backend.py``):
absorbed MLA decode is exactly MQA over the compressed latents —

    q_eff  = [q_nope @ W_kc  |  q_pe]            # [B, Hq, r + dr]
    scores = q_eff . lat                          # lat = [ckv | k_pe]
    ctx    = softmax(scores) . ckv                # latent context
    out    = ctx @ W_vc

Decode dispatch:
- bf16 combined-latent cache -> ``mla_decode_multirow``;
- FP8 per-token cache (SnapMLA, reference ``flashmla_backend.py:127``
  ``flash_mla_ckv_fp8_per_token``) -> ``mla_decode_multirow_fp8`` with the
  per-token dequant fused into the kernel's K/V load.

Extend (S > 4, no spec tree mask) runs the "normal" MLA path with the
quadratic-score-free ragged flash kernel: per-layer latent decompression +
``dense_flash_prefill`` (see ``_extend_flash``); tiny extends and
spec-verify keep the reference absorbed path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.mem.kv_cache import (
    MLAKVCache,
    MLAKVCacheFP8,
    mla_write,
    mla_write_fp8,
    padded_head_dim,
)
from sglang_fluentllm_tpu.ops.attention.ref_backend import RefMLABackend


class MLAPagedBackend(RefMLABackend):
    name = "mla_paged"

    def __call__(self, kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                 batch, w_kc, w_vc, sm_scale) -> Tuple[jax.Array, object]:
        from sglang_fluentllm_tpu.mem.kv_cache import MLAWindowKV

        if isinstance(kv_cache, MLAWindowKV):
            return self._dense_window_mla(
                kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                batch, w_kc, w_vc, sm_scale,
            )
        if not batch.mode.is_decode():
            S = q_nope.shape[1]
            if batch.custom_mask is not None or S <= 4:
                # spec-verify tree masks / tiny extends: reference paths
                # (absorbed for short query blocks)
                return super().__call__(
                    kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                    batch, w_kc, w_vc, sm_scale,
                )
            return self._extend_flash(
                kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                batch, w_kc, w_vc, sm_scale,
            )
        B, S, H, dn = q_nope.shape
        assert S == 1
        r = ckv_new.shape[-1]
        dr = kpe_new.shape[-1]
        loc = batch.out_cache_loc.reshape(-1)

        # absorbed query in the latent basis
        q_abs = jnp.einsum(
            "bhd,hrd->bhr", q_nope[:, 0].astype(jnp.float32),
            w_kc.astype(jnp.float32),
        )

        new_slots = batch.out_cache_loc[:, 0]
        if isinstance(kv_cache, MLAKVCacheFP8):
            from sglang_fluentllm_tpu.mem.kv_cache import mla_pack_fp8_rows
            from sglang_fluentllm_tpu.ops.attention.pallas_mla_decode import (
                mla_decode_multirow_fp8,
            )

            tail_pad = kv_cache.tail.shape[-1]
            ckv8_new, tail_new = mla_pack_fp8_rows(
                ckv_new.reshape(B, r), kpe_new.reshape(B, dr), tail_pad
            )
            q = jnp.zeros((B, H, r + tail_pad), jnp.float32)
            q = q.at[..., :r].set(q_abs)
            q = q.at[..., r : r + dr].set(q_pe[:, 0].astype(jnp.float32))
            # fused write: the kernel itself stores the current token's
            # quantized row (keeps the pool an aliased in-place chain)
            ctx, ckv2, tail2 = mla_decode_multirow_fp8(
                q, kv_cache.ckv, kv_cache.tail, layer_id,
                batch.page_tables, batch.seq_lens,
                ckv8_new=ckv8_new, tail_new=tail_new, new_slots=new_slots,
                page_size=batch.page_size, sm_scale=sm_scale, rope_dr=dr,
                run_only=batch.pages_are_runs,
            )
            kv_cache = MLAKVCacheFP8(ckv=ckv2, tail=tail2)
        else:
            assert isinstance(kv_cache, MLAKVCache)
            from sglang_fluentllm_tpu.mem.kv_cache import mla_pack_rows
            from sglang_fluentllm_tpu.ops.attention.pallas_mla_decode import (
                mla_decode_multirow,
            )

            r_pad = padded_head_dim(r)
            Dl = kv_cache.lat.shape[-1]
            lat_new = mla_pack_rows(
                ckv_new.reshape(B, r), kpe_new.reshape(B, dr), Dl,
                kv_cache.lat.dtype,
            )
            q = jnp.zeros((B, H, Dl), jnp.float32)
            q = q.at[..., :r].set(q_abs)
            q = q.at[..., r_pad : r_pad + dr].set(
                q_pe[:, 0].astype(jnp.float32)
            )
            ctx, lat2 = mla_decode_multirow(
                q, kv_cache.lat, layer_id,
                batch.page_tables, batch.seq_lens,
                lat_new=lat_new, new_slots=new_slots,
                page_size=batch.page_size, sm_scale=sm_scale, r_dim=r_pad,
                run_only=batch.pages_are_runs,
            )
            ctx = ctx[..., :r]
            kv_cache = MLAKVCache(lat=lat2)

        ctx = ctx.astype(jnp.float32)[..., :r]
        out = jnp.einsum("bhr,hrd->bhd", ctx, w_vc.astype(jnp.float32))
        return out[:, None].astype(q_nope.dtype), kv_cache

    def _extend_flash(self, kv_cache, layer_id, q_nope, q_pe, ckv_new,
                      kpe_new, batch, w_kc, w_vc, sm_scale):
        """MLA extend via per-layer latent decompression + ragged flash.

        The "normal" MLA path (reference ``deepseek_v2.py`` forward_normal,
        FA3 extend) done TPU-first: gather the latent sequence dense (cheap
        — latents are ~1/H of the per-head KV), decompress ONCE per layer
        through the kv_b projections (two MXU matmuls), then flash-attend
        the dense KV with the online-softmax Pallas kernel — no O(S*T)
        score materialization, and KV chunks stream with merged softmax
        (reference ``chunker.py:53`` chunked-prefill role)."""
        B, S, H, dn = q_nope.shape
        dr = kpe_new.shape[-1]
        kv_cache, ckv, kpe = self._write_gather(
            kv_cache, layer_id, ckv_new, kpe_new, batch
        )
        dtype = q_nope.dtype
        # decompress head-minor so the pool transpose fuses into the GEMM
        k_nope = jnp.einsum(
            "btr,hrd->bthd", ckv, w_kc.astype(jnp.float32)
        ).astype(dtype)                                  # [B, T, H, dn]
        v = jnp.einsum(
            "btr,hrd->bthd", ckv, w_vc.astype(jnp.float32)
        ).astype(dtype)                                  # [B, T, H, dv]
        T = k_nope.shape[1]
        k = jnp.concatenate(
            [
                k_nope,
                jnp.broadcast_to(
                    kpe.astype(dtype)[:, :, None, :], (B, T, H, dr)
                ),
            ],
            axis=-1,
        )                                                # [B, T, H, dn+dr]
        q = jnp.concatenate([q_nope, q_pe.astype(dtype)], axis=-1)
        # lane-pad the K head dim (dn+dr is rarely a lane multiple)
        Dk = dn + dr
        Dk_pad = padded_head_dim(Dk)
        if Dk_pad != Dk:
            q = jnp.pad(q, [(0, 0), (0, 0), (0, 0), (0, Dk_pad - Dk)])
            k = jnp.pad(k, [(0, 0), (0, 0), (0, 0), (0, Dk_pad - Dk)])

        from sglang_fluentllm_tpu.ops.attention.pallas_prefill import (
            dense_flash_prefill,
        )

        out = dense_flash_prefill(
            q, k, v, batch.seq_lens, batch.q_lens, sm_scale=sm_scale
        )
        return out.astype(q_nope.dtype), kv_cache
