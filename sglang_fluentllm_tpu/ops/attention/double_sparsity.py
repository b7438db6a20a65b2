"""Double-sparsity attention (post-training sparse decode).

Analog of the reference's
``layers/attention/triton_ops/double_sparsity_attention.py`` (1.1k lines
of Triton) + ``double_sparsity_backend.py``: the Double Sparsity method
(arxiv 2408.07092) combines

- **channel sparsity**: per-head "heavy channels" (offline-calibrated
  indices) approximate attention scores from a narrow slice of Q/K;
- **token sparsity**: the top ``heavy_token_num`` tokens under the
  approximate scores receive EXACT attention; the rest are dropped.

TPU translation: the score approximation and top-k selection are dense
XLA ops over the gathered label slice (the reference's fwd_sparse Triton
kernel role); selected tokens gather into a compact [B, H_kv, k_top, D]
block for one dense attend. Decode only, and only past
``sparse_decode_threshold`` — short sequences and prefill run the normal
paged path (reference double_sparsity_backend.py forward_decode gating).

Calibration: channel indices load from ``--ds-channel-config`` (the
reference's offline JSON, keyed by layer/head); without a config the
first ``heavy_channel_num`` channels are used — mechanically valid but
uncalibrated (quality needs the offline pass, same as the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.mem.kv_cache import MHAKVCache
from sglang_fluentllm_tpu.ops.attention.ref_backend import (
    NEG_INF,
    page_gather_mha,
)
from sglang_fluentllm_tpu.runtime.forward_batch import ForwardBatch


def ds_decode_attend(
    q: jax.Array,            # [B, Hq, D]
    k: jax.Array,            # [B, T, Hk, D] (gathered)
    v: jax.Array,            # [B, T, Hk, D]
    seq_lens: jax.Array,     # [B]
    heavy_idx: jax.Array,    # [Hk, C] per-kv-head heavy channel ids
    k_top: int,
    sm_scale: float,
) -> jax.Array:
    """Sparse decode: approximate scores on heavy channels -> top-k token
    selection -> exact attention over the selected tokens."""
    B, T, Hk, D = k.shape
    Hq = q.shape[1]
    G = Hq // Hk
    qf = q.astype(jnp.float32).reshape(B, Hk, G, D)
    kf = k.astype(jnp.float32)

    # label slice: [B, T, Hk, C]
    k_label = jnp.take_along_axis(
        kf, heavy_idx[None, None, :, :], axis=3
    )
    q_label = jnp.take_along_axis(
        qf, heavy_idx[None, :, None, :], axis=3
    )                                                  # [B, Hk, G, C]
    approx = jnp.einsum("bkgc,btkc->bkgt", q_label, k_label)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, None, None, :]
    approx = jnp.where(
        t_idx < seq_lens[:, None, None, None], approx, NEG_INF
    )
    # per-(head, group) token selection; the newest token is biased to
    # rank first so it is ALWAYS kept without displacing a real selection
    approx = jnp.where(
        t_idx == (seq_lens - 1)[:, None, None, None], 1e30, approx
    )
    kk = min(k_top, T)
    _, sel = jax.lax.top_k(approx, kk)                 # [B, Hk, G, kk]

    # exact attention over the selected tokens
    k_sel = jnp.take_along_axis(
        kf.transpose(0, 2, 1, 3)[:, :, None],          # [B, Hk, 1, T, D]
        sel[..., None], axis=3,
    )                                                  # [B, Hk, G, kk, D]
    v_sel = jnp.take_along_axis(
        v.astype(jnp.float32).transpose(0, 2, 1, 3)[:, :, None],
        sel[..., None], axis=3,
    )
    s = jnp.einsum("bkgd,bkgtd->bkgt", qf, k_sel) * sm_scale
    s = jnp.where(
        jnp.take_along_axis(
            jnp.broadcast_to(t_idx, (B, Hk, G, T)), sel, axis=3
        ) < seq_lens[:, None, None, None],
        s, NEG_INF,
    )
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgt,bkgtd->bkgd", p, v_sel)
    return out.reshape(B, Hq, D).astype(q.dtype)


class DoubleSparsityBackend:
    """Wraps the regular MHA backend: sparse decode past the threshold,
    normal path otherwise (reference double_sparsity_backend.py)."""

    name = "double_sparsity"

    def __init__(self, inner, heavy_idx, heavy_token_num: int = 256,
                 sparse_threshold: int = 1024):
        self.inner = inner
        self.heavy_idx = jnp.asarray(heavy_idx, jnp.int32)  # [Hk, C]
        self.heavy_token_num = heavy_token_num
        self.sparse_threshold = sparse_threshold

    @staticmethod
    def from_config(inner, config, channel_config: Optional[dict],
                    heavy_channel_num: int, heavy_token_num: int,
                    sparse_threshold: int) -> "DoubleSparsityBackend":
        Hk = config.num_key_value_heads
        D = config.head_dim
        if channel_config:
            import numpy as np

            idx = np.zeros((Hk, heavy_channel_num), np.int32)
            # reference layout: {"<layer>.<head>": [channels...]} or
            # {"k": [[...]]}; accept per-head lists keyed by head id
            for h in range(Hk):
                chans = (
                    channel_config.get(str(h))
                    or channel_config.get(h)
                    or list(range(heavy_channel_num))
                )
                idx[h] = np.asarray(chans[:heavy_channel_num], np.int32)
        else:
            import numpy as np

            idx = np.tile(
                np.arange(min(heavy_channel_num, D), dtype=np.int32),
                (Hk, 1),
            )
        return DoubleSparsityBackend(
            inner, idx, heavy_token_num, sparse_threshold
        )

    def __call__(self, kv_cache: MHAKVCache, layer_id, q, k_new, v_new,
                 batch: ForwardBatch, sm_scale, logit_cap: float = 0.0,
                 window=None, sinks=None) -> Tuple[jax.Array, object]:
        T_table = batch.page_tables.shape[1] * batch.page_size
        if (
            not batch.mode.is_decode()
            or window is not None or sinks is not None
            or logit_cap > 0
            or T_table <= self.sparse_threshold
        ):
            return self.inner(
                kv_cache, layer_id, q, k_new, v_new, batch, sm_scale,
                logit_cap, window=window, sinks=sinks,
            )
        from sglang_fluentllm_tpu.mem.kv_cache import mha_write

        B, S, Hk, D = k_new.shape
        loc = batch.out_cache_loc.reshape(-1)
        kv_cache = mha_write(
            kv_cache, layer_id, loc,
            k_new.reshape(B * S, Hk, D), v_new.reshape(B * S, Hk, D),
        )
        k = page_gather_mha(
            kv_cache.k[layer_id], batch.page_tables, batch.page_size
        )[..., :D]
        v = page_gather_mha(
            kv_cache.v[layer_id], batch.page_tables, batch.page_size
        )[..., :D]
        out = ds_decode_attend(
            q[:, 0], k, v, batch.seq_lens, self.heavy_idx,
            self.heavy_token_num, sm_scale,
        )
        return out[:, None], kv_cache
