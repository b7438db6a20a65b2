"""MLA paged decode via the pipelined paged-attention kernel.

The flashmla-analog production path (reference ``flashmla_backend.py``):
absorbed MLA decode is exactly MQA over the compressed latents —

    q_eff  = [q_nope @ W_kc  |  q_pe]            # [B, Hq, r + dr]
    scores = q_eff . lat                          # lat = [ckv | k_pe]
    ctx    = softmax(scores) . lat[:, :r]         # latent context
    out    = ctx @ W_vc

so the combined lane-padded latent cache ([L, slots, r_pad + rope_pad],
mem/kv_cache.py) feeds the same pipelined paged kernel used for MHA with
num_kv_heads=1, head_dim = r_pad + rope_pad, and V = K (the value product
over the rope tail is sliced away, leaving probs @ ckv).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.mem.kv_cache import padded_head_dim
from sglang_fluentllm_tpu.ops.attention.ref_backend import RefMLABackend


class MLAPagedBackend(RefMLABackend):
    name = "mla_paged"

    def __call__(self, kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                 batch, w_kc, w_vc, sm_scale) -> Tuple[jax.Array, object]:
        from sglang_fluentllm_tpu.mem.kv_cache import MLAKVCache, mla_write

        if not batch.mode.is_decode() or not isinstance(
            kv_cache, MLAKVCache
        ):
            # prefill / fp8 fall back to the reference paths
            return super().__call__(
                kv_cache, layer_id, q_nope, q_pe, ckv_new, kpe_new,
                batch, w_kc, w_vc, sm_scale,
            )
        B, S, H, dn = q_nope.shape
        assert S == 1
        r = ckv_new.shape[-1]
        dr = kpe_new.shape[-1]
        r_pad = padded_head_dim(r)
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mla_write(
            kv_cache, layer_id, loc,
            ckv_new.reshape(B, r), kpe_new.reshape(B, dr),
        )

        # absorbed query in the padded latent basis
        q_abs = jnp.einsum(
            "bhd,hrd->bhr", q_nope[:, 0].astype(jnp.float32),
            w_kc.astype(jnp.float32),
        )
        D = kv_cache.lat.shape[-1]
        q = jnp.zeros((B, H, D), jnp.float32)
        q = q.at[..., :r].set(q_abs)
        q = q.at[..., r_pad : r_pad + dr].set(
            q_pe[:, 0].astype(jnp.float32)
        )
        q = (q * sm_scale).astype(kv_cache.lat.dtype)

        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention,
        )

        ps = batch.page_size
        pages = kv_cache.lat[layer_id].reshape(1, -1, ps, D)
        ppcb = 8
        P = batch.page_tables.shape[1]
        P_pad = -(-P // ppcb) * ppcb
        pt = batch.page_tables
        if P_pad != P:
            pt = jnp.pad(pt, ((0, 0), (0, P_pad - P)))
        lengths = jnp.maximum(batch.seq_lens, 1)
        ctx = paged_attention(
            q, pages, pages, lengths, pt,
            pages_per_compute_block=min(ppcb, P_pad),
        )                                     # [B, H, D]; V == K
        ctx = ctx[..., :r].astype(jnp.float32)  # probs @ ckv
        out = jnp.einsum("bhr,hrd->bhd", ctx, w_vc.astype(jnp.float32))
        return out[:, None].astype(q_nope.dtype), kv_cache
