"""Device-side KV cache pools (JAX arrays).

TPU-native analog of the reference's ``mem_cache/memory_pool.py``
(``MHATokenToKVPool:223``, ``MLATokenToKVPool:591``). Instead of raw device
tensors mutated by CUDA kernels, pools are immutable-by-convention JAX pytrees
threaded through jit-compiled step functions with buffer donation, so XLA
performs the writes in place.

Layouts (chosen for TPU DMA friendliness — a page is a contiguous
``[page_size, dims]`` block per kv head, so the Pallas kernels stream pages
with single DMAs):
- MHA: ``k/v: [num_layers, num_kv_heads, num_slots, head_dim]``
- MLA (bf16): ``ckv: [L, slots, kv_lora_rank]``, ``krope: [L, slots, rope_dim]``
- MLA (FP8 per-token): the reference's triple layout contract
  (``memory_pool.py:635-649``): fp8 ckv + f32 per-token scale + bf16 rope.

``num_slots = (num_pages + 1) * page_size``; page 0 / slot 0 are padding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_fluentllm_tpu.config.model_config import ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MHAKVCache:
    k: jax.Array  # [L, H_kv, slots, D]
    v: jax.Array  # [L, H_kv, slots, D]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLAKVCache:
    """Combined latent layout: one [L, slots, r_pad + rope_pad] array so
    absorbed-MLA decode runs as MQA over a single contiguous page stream
    (lat = ckv | 0-pad | rope | 0-pad, each half lane-aligned)."""

    lat: jax.Array    # [L, slots, r_pad + rope_pad]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLAKVCacheFP8:
    """SnapMLA-style FP8 per-token KV (reference triple layout contract,
    ``memory_pool.py:635-649``: fp8 ckv + f32 scale + bf16 rope), packed
    for TPU DMA lane rules (trailing dims must be 128-multiples, so a
    ``[slots, 1]`` f32 scale array cannot be streamed):

    - ``ckv``: fp8 compressed latents, unchanged;
    - ``tail``: one lane-aligned bf16 row per token holding
      ``[rope(0:dr) | scale_hi(dr) | scale_lo(dr+1) | 0-pad]`` where
      ``scale_hi + scale_lo`` reconstructs the f32 per-token dequant scale
      to ~16 mantissa bits (two-bf16 split, lossless in practice).
    """

    ckv: jax.Array   # [L, slots, kv_lora_rank] float8_e4m3fn
    tail: jax.Array  # [L, slots, tail_pad] bfloat16 (rope | scale hi/lo)


def fp8_tail_dim(qk_rope_head_dim: int) -> int:
    return padded_head_dim(qk_rope_head_dim + 2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLAKVCacheDSA:
    """DeepSeek-V3.2 sparse attention pool (reference DSATokenToKVPool,
    ``memory_pool.py``): the combined-latent MLA cache plus one
    lane-padded index-key row per token for the lightning indexer."""

    lat: jax.Array   # [L, slots, r_pad + rope_pad]
    idx: jax.Array   # [L, slots, d_idx_pad] index keys


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridKVCache:
    """Hybrid-linear models (Qwen3-Next GDN; reference
    ``memory_pool.py:1333`` HybridLinearKVPool + MambaPool): a paged MHA
    pool covering ONLY the full-attention layers, plus per-REQUEST (not
    per-token) recurrent state rows indexed by ``batch.state_idx``.
    Row ``max_reqs`` (the last) is the trash row for padded batch rows."""

    mha: MHAKVCache
    conv: jax.Array  # [L_lin, R+1, conv_dim, K] conv tail (HF state len)
    rec: jax.Array   # [L_lin, R+1, Hv, Dk, Dv] f32 delta-rule state
    # spec-verify only: per-layer exact-inverse update records so the
    # worker can roll rejected window tokens back out of conv/rec
    # (reference MambaPool speculative state slots role). None outside
    # TARGET_VERIFY traces.
    aux: object = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OEPKVCache:
    """Over-embedding wrapper (LongCat OEP; reference oe_token_table in
    ``oe_utils.py`` + ``schedule_batch.py:101``): the model's paged pool
    plus a per-REQUEST token-history ring so decode can hash n-grams
    whose recent tokens only exist on-device under the overlap
    scheduler. Row ``max_reqs`` is the trash row for padded rows."""

    inner: "KVCache"
    ring: jax.Array  # [R+1, RING_W] i32 last tokens per request


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NSAKVCache:
    """NSA (native sparse attention) pool: the paged full-KV pool PLUS
    per-REQUEST compressed-KV rows (reference role: the NSA backend's
    cached compress_kv buffers, ``native_sparse_attention/compress_kv.py``).

    Compressed block ``b`` of a request summarizes tokens
    ``[b*stride, b*stride + kernel)``; rows are indexed by
    ``batch.state_idx`` (req_pool_idx) like the hybrid-linear state
    pools, row ``max_reqs`` is the trash row. Maintained by the NSA
    backend: refreshed in full on EXTEND/TARGET_VERIFY (where the dense
    history is gathered anyway), appended incrementally on DECODE. The
    sparse decode path reads ONLY these rows + the selected/window
    tokens — the full history is never materialized."""

    pool: MHAKVCache
    ck: jax.Array   # [L, R+1, NBcap, Hk, D] compressed keys
    cv: jax.Array   # [L, R+1, NBcap, Hk, D] compressed values

    # the paged pool's arrays, so pool-shape probes (model_runner's
    # dense-window sizing, hicache page views) see through the wrapper
    @property
    def k(self):
        return self.pool.k

    @property
    def v(self):
        return self.pool.v


KVCache = (MHAKVCache | MLAKVCache | MLAKVCacheFP8 | MLAKVCacheDSA
           | HybridKVCache | OEPKVCache | NSAKVCache)

LANE = 128


def padded_head_dim(d: int) -> int:
    """TPU lane alignment: Mosaic DMA/slicing requires the trailing dim to
    be a multiple of 128, so sub-128 head dims are stored padded."""
    return ((d + LANE - 1) // LANE) * LANE


def _hybrid_wrap(config: ModelConfig, inner, dtype, max_reqs):
    """Wrap a paged pool with the per-request linear-state rows
    (GDN: fused qkv conv; KDA: three per-projection convs — both reduce
    to one [conv_dim, K] tail since hk=hv, dk=dv there)."""
    assert max_reqs is not None, "hybrid pool needs max_reqs"
    hf = config.hf_config
    L_lin = len(config.linear_layer_ids)
    hk = hf.get("linear_num_key_heads", 1)
    hv = hf.get("linear_num_value_heads", hk)
    dk = hf.get("linear_key_head_dim", config.head_dim)
    dv = hf.get("linear_value_head_dim", dk)
    K = hf.get("linear_conv_kernel_dim", 4)
    conv_dim = 2 * hk * dk + hv * dv
    return HybridKVCache(
        mha=inner,
        conv=jnp.zeros((L_lin, max_reqs + 1, conv_dim, K), dtype=dtype),
        rec=jnp.zeros((L_lin, max_reqs + 1, hv, dk, dv),
                      dtype=jnp.float32),
    )


def create_kv_cache(
    config: ModelConfig,
    num_slots: int,
    dtype=jnp.bfloat16,
    kv_cache_dtype: str = "auto",
    num_kv_heads_override: Optional[int] = None,
    max_reqs: Optional[int] = None,
) -> KVCache:
    if config.use_over_embedding:
        hf = dict(config.hf_config)
        hf.pop("oe_vocab_size_ratio", None)
        hf.pop("ngram_vocab_size_ratio", None)
        bare = dataclasses.replace(config, hf_config=hf)
        inner = create_kv_cache(
            bare, num_slots, dtype, kv_cache_dtype,
            num_kv_heads_override, max_reqs,
        )
        return _oep_wrap(config, inner, max_reqs)
    L = config.num_kv_layers or config.num_hidden_layers
    if config.is_mla:
        if kv_cache_dtype in ("fp8_e4m3", "fp8"):
            return MLAKVCacheFP8(
                ckv=jnp.zeros((L, num_slots, config.kv_lora_rank),
                              dtype=jnp.float8_e4m3fn),
                tail=jnp.zeros(
                    (L, num_slots, fp8_tail_dim(config.qk_rope_head_dim)),
                    dtype=jnp.bfloat16,
                ),
            )
        r_pad = padded_head_dim(config.kv_lora_rank)
        rope_pad = padded_head_dim(config.qk_rope_head_dim)
        lat = jnp.zeros((L, num_slots, r_pad + rope_pad), dtype=dtype)
        if config.is_dsa:
            d_idx = config.hf_config.get("index_head_dim", 128)
            return MLAKVCacheDSA(
                lat=lat,
                idx=jnp.zeros(
                    (L, num_slots, padded_head_dim(d_idx)), dtype=dtype
                ),
            )
        mla = MLAKVCache(lat=lat)
        if config.is_hybrid_linear:
            return _hybrid_wrap(config, mla, dtype, max_reqs)
        return mla
    h_kv = num_kv_heads_override or config.num_key_value_heads
    shape = (L, h_kv, num_slots, padded_head_dim(config.head_dim))
    mha = MHAKVCache(k=jnp.zeros(shape, dtype=dtype),
                     v=jnp.zeros(shape, dtype=dtype))
    if config.is_hybrid_linear:
        return _hybrid_wrap(config, mha, dtype, max_reqs)
    if config.is_nsa:
        return _nsa_wrap(config, mha, dtype, num_slots, max_reqs)
    return mha


def _nsa_wrap(config: ModelConfig, inner: MHAKVCache, dtype,
              num_slots: int, max_reqs):
    """Attach the per-request compressed-KV rows (see NSAKVCache). The
    block capacity is bounded by the longest context one request can
    actually hold: min(model context, pool size)."""
    assert max_reqs is not None, "NSA pool needs max_reqs"
    hf = config.hf_config
    kernel = hf.get("kernel_size", 32)
    stride = hf.get("stride", 16)
    ctx_cap = min(
        config.context_length or config.max_position_embeddings,
        num_slots,
    )
    nb_cap = max((ctx_cap - kernel) // stride + 1, 1)
    L, Hk = inner.k.shape[0], inner.k.shape[1]
    D = config.head_dim
    return NSAKVCache(
        pool=inner,
        ck=jnp.zeros((L, max_reqs + 1, nb_cap, Hk, D), dtype=dtype),
        cv=jnp.zeros((L, max_reqs + 1, nb_cap, Hk, D), dtype=dtype),
    )


def _oep_wrap(config: ModelConfig, inner, max_reqs):
    from sglang_fluentllm_tpu.ops.over_embedding import RING_W
    assert max_reqs is not None, "OEP pool needs max_reqs"
    return OEPKVCache(
        inner=inner,
        ring=jnp.zeros((max_reqs + 1, RING_W), dtype=jnp.int32),
    )


# ----------------------------------------------------------------------
# Functional writes (used inside jitted model forward; XLA scatters in place
# thanks to donation).
# ----------------------------------------------------------------------

def mha_write(cache: MHAKVCache, layer_id: int, loc: jax.Array,
              k: jax.Array, v: jax.Array) -> MHAKVCache:
    """loc: [T] int32 slots; k/v: [T, H_kv, D].

    Note: with the advanced index ``loc`` separated by a slice, numpy
    semantics put the T dim first, so the value is passed as [T, H, D].
    """
    Dp = cache.k.shape[-1]
    if k.shape[-1] != Dp:
        pad = [(0, 0)] * (k.ndim - 1) + [(0, Dp - k.shape[-1])]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    return MHAKVCache(
        k=cache.k.at[layer_id, :, loc].set(k.astype(cache.k.dtype)),
        v=cache.v.at[layer_id, :, loc].set(v.astype(cache.v.dtype)),
    )


def mla_pack_rows(ckv: jax.Array, krope: jax.Array, total: int,
                  dtype) -> jax.Array:
    """ckv [T, r] + krope [T, rope] -> combined lane-padded rows
    [T, total] (lat = ckv | 0-pad | rope | 0-pad)."""
    T, r = ckv.shape
    rope = krope.shape[-1]
    r_pad = padded_head_dim(r)
    row = jnp.zeros((T, total), dtype)
    row = row.at[:, :r].set(ckv.astype(dtype))
    row = row.at[:, r_pad : r_pad + rope].set(krope.astype(dtype))
    return row


def mla_write(cache: MLAKVCache, layer_id: int, loc: jax.Array,
              ckv: jax.Array, krope: jax.Array) -> MLAKVCache:
    """ckv [T, r], krope [T, rope] -> combined lane-padded row."""
    row = mla_pack_rows(
        ckv, krope, cache.lat.shape[-1], cache.lat.dtype
    )
    return MLAKVCache(lat=cache.lat.at[layer_id, loc].set(row))


FP8_MAX = 448.0  # float8_e4m3fn max


def mla_pack_fp8_rows(ckv: jax.Array, krope: jax.Array, tail_pad: int):
    """Per-token fp8 quantization + packed bf16 tail rows
    (SnapMLA-style, reference flashmla fp8 per-token KV —
    ``flashmla_backend.py:127``). Returns (ckv8 [T, r], tail [T, tail_pad])."""
    T = ckv.shape[0]
    dr = krope.shape[-1]
    amax = jnp.max(jnp.abs(ckv.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / FP8_MAX, 1e-8)          # [T, 1] f32
    q = (ckv.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    hi = scale.astype(jnp.bfloat16)
    lo = (scale - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tail = jnp.zeros((T, tail_pad), jnp.bfloat16)
    tail = tail.at[:, :dr].set(krope.astype(jnp.bfloat16))
    tail = tail.at[:, dr].set(hi[:, 0])
    tail = tail.at[:, dr + 1].set(lo[:, 0])
    return q, tail


def mla_write_fp8(cache: MLAKVCacheFP8, layer_id: int, loc: jax.Array,
                  ckv: jax.Array, krope: jax.Array) -> MLAKVCacheFP8:
    """Per-token quantize-on-write (scatter form)."""
    q, tail = mla_pack_fp8_rows(ckv, krope, cache.tail.shape[-1])
    return MLAKVCacheFP8(
        ckv=cache.ckv.at[layer_id, loc].set(q),
        tail=cache.tail.at[layer_id, loc].set(tail),
    )


def fp8_tail_unpack(tail: jax.Array, dr: int):
    """tail [..., tail_pad] -> (krope [..., dr] bf16, scale [..., 1] f32)."""
    krope = tail[..., :dr]
    scale = (
        tail[..., dr].astype(jnp.float32)
        + tail[..., dr + 1].astype(jnp.float32)
    )
    return krope, scale[..., None]


# ----------------------------------------------------------------------
# Sizing helpers (analog of AttnInitializer.profile_max_num_token math,
# reference attn_initializer.py:439-477).
# ----------------------------------------------------------------------

def kv_cell_bytes_per_token(
    config: ModelConfig,
    dtype_bytes: int = 2,
    kv_cache_dtype: str = "auto",
    attn_tp_size: int = 1,
) -> int:
    L = config.num_kv_layers or config.num_hidden_layers
    if config.is_mla:
        if kv_cache_dtype in ("fp8_e4m3", "fp8"):
            return L * (config.kv_lora_rank * 1
                        + fp8_tail_dim(config.qk_rope_head_dim) * 2)
        return L * (
            padded_head_dim(config.kv_lora_rank)
            + padded_head_dim(config.qk_rope_head_dim)
        ) * dtype_bytes
    h_kv = max(1, config.num_key_value_heads // attn_tp_size)
    return L * 2 * h_kv * padded_head_dim(config.head_dim) * dtype_bytes


def kv_copy_rows(kv_cache, src: jax.Array, dst: jax.Array):
    """Copy KV rows slot->slot across ALL layers (src/dst flat [N] int32).

    Tree speculation support: verify writes tree-node KV at window-INDEX
    slots; once the deepest matching path is known, its rows move to the
    POSITION-determined slots future windows read (reference
    eagle_utils.py assign_req_to_token_pool keeps a per-position
    indirection instead — our paged layout is position-direct, so the
    accepted path is materialized in place). src == dst entries are
    harmless self-copies."""
    if isinstance(kv_cache, MHAKVCache):
        return MHAKVCache(
            k=kv_cache.k.at[:, :, dst].set(kv_cache.k[:, :, src]),
            v=kv_cache.v.at[:, :, dst].set(kv_cache.v[:, :, src]),
        )
    if isinstance(kv_cache, MLAKVCache):
        return MLAKVCache(
            lat=kv_cache.lat.at[:, dst].set(kv_cache.lat[:, src])
        )
    if isinstance(kv_cache, MLAKVCacheFP8):
        return MLAKVCacheFP8(
            ckv=kv_cache.ckv.at[:, dst].set(kv_cache.ckv[:, src]),
            tail=kv_cache.tail.at[:, dst].set(kv_cache.tail[:, src]),
        )
    if isinstance(kv_cache, MLAKVCacheDSA):
        return MLAKVCacheDSA(
            lat=kv_cache.lat.at[:, dst].set(kv_cache.lat[:, src]),
            idx=kv_cache.idx.at[:, dst].set(kv_cache.idx[:, src]),
        )
    if isinstance(kv_cache, OEPKVCache):
        # the token-history ring is position-indexed per request (not
        # per-slot), so only the paged inner pool needs the row move
        return OEPKVCache(
            inner=kv_copy_rows(kv_cache.inner, src, dst),
            ring=kv_cache.ring,
        )
    if isinstance(kv_cache, NSAKVCache):
        # compressed rows are (request, block)-indexed, not slot-indexed;
        # blocks touched by moved rows are rewritten when they next
        # complete (see NSA backend maintenance), so only the pool moves
        return NSAKVCache(
            pool=kv_copy_rows(kv_cache.pool, src, dst),
            ck=kv_cache.ck, cv=kv_cache.cv,
        )
    raise NotImplementedError(
        f"kv_copy_rows: {type(kv_cache).__name__}"
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WindowKV:
    """Fused-decode-window KV view: the paged pool PLUS a dense gathered
    history buffer.

    The axon TPU runtime charges ~130 us of FIXED overhead per Mosaic
    kernel invocation (tools/ablate_attention_cost.py): a 24-layer decode
    step pays ~3 ms in launches alone — far above the KV stream's
    bandwidth cost at short contexts. Inside a fused k-step window the
    history is therefore gathered dense ONCE ([L, B, T_pad, Hk, D]) and
    every in-window step runs pure-XLA attention against it (zero Mosaic
    launches); new tokens append to BOTH the dense buffer (for later
    in-window steps) and the paged pool (for after the window). Long
    contexts keep the Pallas paged kernel, where bandwidth — which the
    kernel wins at — dominates the fixed launch cost."""

    pool: "MHAKVCache"
    hk: jax.Array   # [L, B, T_pad, Hk, D]
    hv: jax.Array   # [L, B, T_pad, Hk, D]


def window_kv_gather(pool, page_tables: jax.Array,
                     page_size: int) -> "WindowKV":
    """One gather of every layer's paged history into the dense window
    buffer (slot ids broadcast across layers). ``pool`` is an MHAKVCache
    or an NSAKVCache (whose .k/.v see through to the paged pool; the
    wrapper rides along as WindowKV.pool so in-window compressed-row
    updates reach it)."""
    B, P = page_tables.shape
    slots = (
        page_tables[:, :, None] * page_size
        + jnp.arange(page_size, dtype=page_tables.dtype)[None, None, :]
    ).reshape(B, P * page_size)
    hk = jnp.transpose(pool.k[:, :, slots], (0, 2, 3, 1, 4))
    hv = jnp.transpose(pool.v[:, :, slots], (0, 2, 3, 1, 4))
    return WindowKV(pool=pool, hk=hk, hv=hv)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLAWindowKV:
    """MLA fused-window KV view (see WindowKV): dense DEQUANTIZED latent
    history in the bf16 combined-row layout ([..., :r] = ckv,
    [..., r_pad:r_pad+dr] = rope). For FP8 pools the per-token dequant
    happens ONCE at the window gather instead of per step per layer.

    Pool writes are DEFERRED: in-window appends touch only the dense
    buffer (new fp8 rows stash their two-bf16 scale at lanes
    r_pad+dr, r_pad+dr+1 — zero-padding otherwise, unread by attention),
    and ``mla_window_close`` scatters the window's rows into the paged
    pool ONCE per window instead of L x k times."""

    pool: object          # MLAKVCache | MLAKVCacheFP8
    hlat: jax.Array       # [L, B, T_pad, r_pad + rope_pad] bf16


def window_close(win: "WindowKV", positions: jax.Array,
                 slots: jax.Array) -> "MHAKVCache":
    """Scatter the window's NEW rows from the dense buffer into the paged
    pool, once per fused window (deferred pool writes — the per-step
    in-window appends touch only hk/hv). positions/slots: [B, k]."""
    L, B = win.hk.shape[:2]
    k = positions.shape[1]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    pos = jnp.minimum(positions, win.hk.shape[2] - 1)
    rows_k = win.hk[:, bidx, pos]       # [L, B, k, Hk, Dp]
    rows_v = win.hv[:, bidx, pos]
    flat = slots.reshape(-1)
    Dp = rows_k.shape[-1]
    Hk = rows_k.shape[-2]
    rk = rows_k.reshape(L, B * k, Hk, Dp).swapaxes(1, 2)
    rv = rows_v.reshape(L, B * k, Hk, Dp).swapaxes(1, 2)
    pool = win.pool
    base = pool.pool if isinstance(pool, NSAKVCache) else pool
    written = MHAKVCache(
        k=base.k.at[:, :, flat].set(rk.astype(base.k.dtype)),
        v=base.v.at[:, :, flat].set(rv.astype(base.v.dtype)),
    )
    if isinstance(pool, NSAKVCache):
        return NSAKVCache(pool=written, ck=pool.ck, cv=pool.cv)
    return written


def mla_window_close(win: "MLAWindowKV", positions: jax.Array,
                     slots: jax.Array, r: int, dr: int):
    """MLA variant of window_close. For FP8 pools the quantized row is
    recovered EXACTLY from the dense buffer: the append stored
    dequant(q8)*s in the ckv lanes and the two-bf16 scale split at lanes
    r_pad+dr, r_pad+dr+1, so q8 = (ckv_deq / s) is a lossless e4m3
    round-trip and the tail row is the [rope | hi | lo] lane slice."""
    L, B = win.hlat.shape[:2]
    k = positions.shape[1]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    pos = jnp.minimum(positions, win.hlat.shape[2] - 1)
    rows = win.hlat[:, bidx, pos]       # [L, B, k, W]
    flat = slots.reshape(-1)
    pool = win.pool
    if isinstance(pool, MLAKVCacheFP8):
        r_pad = padded_head_dim(r)
        tail_pad = pool.tail.shape[-1]
        scale = (
            rows[..., r_pad + dr].astype(jnp.float32)
            + rows[..., r_pad + dr + 1].astype(jnp.float32)
        )[..., None]
        q8 = (
            rows[..., :r].astype(jnp.float32)
            / jnp.maximum(scale, 1e-20)
        ).astype(jnp.float8_e4m3fn)
        tail = rows[..., r_pad:r_pad + tail_pad]
        return MLAKVCacheFP8(
            ckv=pool.ckv.at[:, flat].set(q8.reshape(L, B * k, r)),
            tail=pool.tail.at[:, flat].set(
                tail.reshape(L, B * k, tail_pad).astype(pool.tail.dtype)
            ),
        )
    W = rows.shape[-1]
    return MLAKVCache(
        lat=pool.lat.at[:, flat].set(
            rows.reshape(L, B * k, W).astype(pool.lat.dtype)
        )
    )


def mla_window_gather(pool, page_tables: jax.Array, page_size: int,
                      r: int, dr: int) -> "MLAWindowKV":
    B, P = page_tables.shape
    slots = (
        page_tables[:, :, None] * page_size
        + jnp.arange(page_size, dtype=page_tables.dtype)[None, None, :]
    ).reshape(B, P * page_size)
    if isinstance(pool, MLAKVCacheFP8):
        r_pad = padded_head_dim(r)
        ckv8 = pool.ckv[:, slots]                  # [L, B, T, r] fp8
        tail = pool.tail[:, slots]                 # [L, B, T, tail_pad]
        _, scale = fp8_tail_unpack(tail, dr)
        L, _, T = ckv8.shape[:3]
        # single-concatenate build (a zeros buffer + two scatter-sets
        # would stream the 0.5 GB-class window buffer three times). The
        # raw tail rides along whole: rope at r_pad..r_pad+dr as the
        # attention expects, and the scale hi/lo lanes stay available for
        # the deferred-write mla_window_close requantization.
        parts = [(ckv8.astype(jnp.float32) * scale).astype(jnp.bfloat16)]
        if r_pad > r:
            parts.append(jnp.zeros((L, B, T, r_pad - r), jnp.bfloat16))
        parts.append(tail)
        return MLAWindowKV(pool=pool, hlat=jnp.concatenate(parts, axis=-1))
    return MLAWindowKV(pool=pool, hlat=pool.lat[:, slots])
