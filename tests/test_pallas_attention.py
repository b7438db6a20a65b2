"""Pallas paged attention kernels vs the jnp reference backend.

Mirrors the reference's kernel-vs-torch-native test pattern
(test/srt/test_triton_attention_kernels.py). Runs the kernels in TPU
interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sglang_fluentllm_tpu.ops.attention.pallas_decode import (
    paged_decode_attention,
)
from sglang_fluentllm_tpu.ops.attention.ref_backend import (
    mha_attend,
    page_gather_mha,
)


def make_case(B, Hq, Hk, D, page_size, max_pages, seq_lens, seed=0,
              dtype=jnp.float32):
    """Caches are built at the production (lane-padded) head dim: dims
    [D, Dp) are zero (mem/kv_cache.py padded_head_dim contract)."""
    from sglang_fluentllm_tpu.mem.kv_cache import padded_head_dim

    rng = np.random.RandomState(seed)
    # +16 slack pages: the big-DMA+fixup kernels may over-read one chunk
    # past any page (RUN_SLACK_PAGES pool contract)
    num_pages = B * max_pages + 1 + 16
    slots = num_pages * page_size
    Dp = padded_head_dim(D)
    k_cache = np.zeros((Hk, slots, Dp), np.float32)
    v_cache = np.zeros((Hk, slots, Dp), np.float32)
    k_cache[..., :D] = rng.standard_normal((Hk, slots, D))
    v_cache[..., :D] = rng.standard_normal((Hk, slots, D))
    # zero the padding page so masked reads are benign
    k_cache[:, :page_size] = 0
    v_cache[:, :page_size] = 0
    # each request gets its own distinct pages (shuffled, page 0 reserved,
    # slack pages at the pool end left free)
    perm = rng.permutation(num_pages - 17) + 1
    page_tables = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        n = -(-int(seq_lens[i]) // page_size)
        page_tables[i, :n] = perm[i * max_pages : i * max_pages + n]
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    return (
        jnp.asarray(q, dtype),
        jnp.asarray(k_cache, dtype),
        jnp.asarray(v_cache, dtype),
        jnp.asarray(page_tables),
        jnp.asarray(np.asarray(seq_lens, np.int32)),
    )


def ref_decode(q, k_cache, v_cache, page_tables, seq_lens, page_size,
               sm_scale):
    D = q.shape[-1]
    k = page_gather_mha(k_cache, page_tables, page_size)[..., :D]
    v = page_gather_mha(v_cache, page_tables, page_size)[..., :D]
    q_lens = (seq_lens > 0).astype(jnp.int32)
    out = mha_attend(q[:, None], k, v, seq_lens, q_lens, sm_scale)
    return out[:, 0]


def pallas_decode(q, k_cache, v_cache, page_tables, seq_lens, page_size,
                  sm_scale):
    D = q.shape[-1]
    Dp = k_cache.shape[-1]
    q2 = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D))) if Dp != D else q
    out = paged_decode_attention(
        q2, k_cache, v_cache, page_tables, seq_lens,
        page_size=page_size, sm_scale=sm_scale,
    )
    return out[..., :D]


@pytest.mark.parametrize(
    "B,Hq,Hk,D,page_size,seqs",
    [
        (2, 4, 4, 64, 16, [5, 37]),          # MHA, ragged lens
        (4, 8, 2, 64, 16, [1, 16, 33, 64]),  # GQA 4:1, page-aligned + not
        (2, 14, 2, 64, 16, [100, 3]),        # qwen-like 7:1 grouping
        (1, 4, 4, 128, 16, [257]),           # D=128, multi-chunk
        (3, 4, 2, 64, 4, [2, 9, 31]),        # tiny pages
    ],
)
def test_paged_decode_matches_ref(B, Hq, Hk, D, page_size, seqs):
    max_pages = max(-(-s // page_size) for s in seqs) + 1
    q, kc, vc, pt, sl = make_case(B, Hq, Hk, D, page_size, max_pages, seqs)
    sm_scale = 1.0 / np.sqrt(D)
    ref = ref_decode(q, kc, vc, pt, sl, page_size, sm_scale)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_decode(q, kc, vc, pt, sl, page_size, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_paged_decode_bf16():
    seqs = [40, 17]
    q, kc, vc, pt, sl = make_case(
        2, 8, 2, 64, 16, 4, seqs, dtype=jnp.bfloat16
    )
    sm_scale = 1.0 / np.sqrt(64)
    ref = ref_decode(q, kc, vc, pt, sl, 16, sm_scale)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_decode(q, kc, vc, pt, sl, 16, sm_scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_paged_decode_padded_rows():
    """Rows with seq_len 0 (batch padding) must come out all-zero/finite."""
    seqs = [32, 0, 7]
    q, kc, vc, pt, sl = make_case(3, 4, 4, 64, 16, 3, seqs)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_decode(q, kc, vc, pt, sl, 16, 0.125)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert np.abs(out[1]).max() == 0.0

    ref = np.asarray(ref_decode(q, kc, vc, pt, sl, 16, 0.125))
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[2], ref[2], rtol=2e-5, atol=2e-5)


# ----------------------------------------------------------------------
# Multi-row kernel (pallas_decode_multirow) vs reference
# ----------------------------------------------------------------------

def _stack_layers(kc, vc, L, layer_id, rng):
    """Build a stacked [L, Hk, slots, D] cache whose layer `layer_id` holds
    kc/vc and other layers hold noise (catches layer-indexing bugs)."""
    Hk, slots, Dp = kc.shape
    k_st = rng.standard_normal((L, Hk, slots, Dp)).astype(np.float32)
    v_st = rng.standard_normal((L, Hk, slots, Dp)).astype(np.float32)
    k_st[layer_id] = np.asarray(kc, np.float32)
    v_st[layer_id] = np.asarray(vc, np.float32)
    return (jnp.asarray(k_st, kc.dtype), jnp.asarray(v_st, vc.dtype))


def _multirow(q, kst, vst, layer_id, pt, sl, page_size, sm_scale, **kw):
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        paged_decode_multirow,
    )

    D = q.shape[-1]
    Dp = kst.shape[-1]
    q2 = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D))) if Dp != D else q
    out, _k, _v = paged_decode_multirow(
        q2, kst, vst, jnp.int32(layer_id), pt, sl,
        page_size=page_size, sm_scale=sm_scale, **kw,
    )
    return out[..., :D]


@pytest.mark.parametrize(
    "B,Hq,Hk,D,page_size,seqs,rows",
    [
        (2, 4, 4, 64, 16, [5, 37], 2),            # MHA, ragged lens
        (4, 8, 2, 64, 16, [1, 16, 33, 64], 2),    # GQA, page-aligned + not
        (5, 14, 2, 64, 16, [100, 3, 64, 48, 17], 4),  # qwen 7:1, B%rows!=0
        (1, 4, 4, 128, 16, [257], 8),             # D=128, multi-chunk
        (3, 4, 2, 64, 4, [2, 9, 31], 3),          # tiny pages
    ],
)
def test_multirow_matches_ref_scattered(B, Hq, Hk, D, page_size, seqs, rows):
    """Shuffled page tables exercise the per-page (non-run) DMA path."""
    max_pages = max(-(-s // page_size) for s in seqs) + 1
    q, kc, vc, pt, sl = make_case(B, Hq, Hk, D, page_size, max_pages, seqs)
    rng = np.random.RandomState(7)
    kst, vst = _stack_layers(kc, vc, 3, 1, rng)
    sm_scale = 1.0 / np.sqrt(D)
    ref = ref_decode(q, kc, vc, pt, sl, page_size, sm_scale)
    with pltpu.force_tpu_interpret_mode():
        out = _multirow(q, kst, vst, 1, pt, sl, page_size, sm_scale,
                        rows=rows)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_multirow_matches_ref_sequential_pages():
    """Consecutive page tables exercise the coalesced-run DMA path."""
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        RUN_SLACK_PAGES,
    )

    B, Hq, Hk, D, ps = 4, 8, 2, 64, 16
    seqs = [60, 64, 3, 29]
    max_pages = 4
    rng = np.random.RandomState(3)
    num_pages = B * max_pages + 1 + RUN_SLACK_PAGES
    slots = num_pages * ps
    from sglang_fluentllm_tpu.mem.kv_cache import padded_head_dim

    Dp = padded_head_dim(D)
    k_cache = np.zeros((Hk, slots, Dp), np.float32)
    v_cache = np.zeros((Hk, slots, Dp), np.float32)
    k_cache[..., :D] = rng.standard_normal((Hk, slots, D))
    v_cache[..., :D] = rng.standard_normal((Hk, slots, D))
    k_cache[:, :ps] = 0
    v_cache[:, :ps] = 0
    pt = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        n = -(-seqs[i] // ps)
        pt[i, :n] = 1 + i * max_pages + np.arange(n)  # consecutive runs
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    q, kc, vc = jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache)
    pt, sl = jnp.asarray(pt), jnp.asarray(np.asarray(seqs, np.int32))
    kst, vst = _stack_layers(kc, vc, 2, 0, rng)
    sm_scale = 1.0 / np.sqrt(D)
    ref = ref_decode(q, kc, vc, pt, sl, ps, sm_scale)
    with pltpu.force_tpu_interpret_mode():
        out = _multirow(q, kst, vst, 0, pt, sl, ps, sm_scale, rows=2)
        out_ro = _multirow(q, kst, vst, 0, pt, sl, ps, sm_scale, rows=2,
                           run_only=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_ro), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_multirow_padded_rows():
    seqs = [32, 0, 7]
    q, kc, vc, pt, sl = make_case(3, 4, 4, 64, 16, 3, seqs)
    rng = np.random.RandomState(11)
    kst, vst = _stack_layers(kc, vc, 2, 1, rng)
    with pltpu.force_tpu_interpret_mode():
        out = _multirow(q, kst, vst, 1, pt, sl, 16, 0.125, rows=2)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert np.abs(out[1]).max() == 0.0
    ref = np.asarray(ref_decode(q, kc, vc, pt, sl, 16, 0.125))
    np.testing.assert_allclose(out[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[2], ref[2], rtol=2e-5, atol=2e-5)


def test_multirow_bf16():
    seqs = [40, 17]
    q, kc, vc, pt, sl = make_case(
        2, 8, 2, 64, 16, 4, seqs, dtype=jnp.bfloat16
    )
    rng = np.random.RandomState(13)
    kst, vst = _stack_layers(kc, vc, 2, 0, rng)
    sm_scale = 1.0 / np.sqrt(64)
    ref = ref_decode(q, kc, vc, pt, sl, 16, sm_scale)
    with pltpu.force_tpu_interpret_mode():
        out = _multirow(q, kst, vst, 0, pt, sl, 16, sm_scale, rows=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


# ----------------------------------------------------------------------
# Ragged paged prefill kernel vs reference
# ----------------------------------------------------------------------

def _make_prefill_case(B, Hq, Hk, D, ps, seq_lens, q_lens, seed=0,
                       sequential=False):
    """KV cache pre-filled for all seq_lens tokens (incl. the 'new' ones,
    matching the write-before-attend contract); q covers the new tokens."""
    from sglang_fluentllm_tpu.mem.kv_cache import padded_head_dim

    rng = np.random.RandomState(seed)
    max_pages = max(-(-int(s) // ps) for s in seq_lens)
    num_pages = B * max_pages + 1 + 16
    slots = num_pages * ps
    Dp = padded_head_dim(D)
    k_cache = np.zeros((Hk, slots, Dp), np.float32)
    v_cache = np.zeros((Hk, slots, Dp), np.float32)
    k_cache[..., :D] = rng.standard_normal((Hk, slots, D))
    v_cache[..., :D] = rng.standard_normal((Hk, slots, D))
    k_cache[:, :ps] = 0
    v_cache[:, :ps] = 0
    pt = np.zeros((B, max_pages), np.int32)
    if sequential:
        for i in range(B):
            n = -(-int(seq_lens[i]) // ps)
            pt[i, :n] = 1 + i * max_pages + np.arange(n)
    else:
        perm = rng.permutation(num_pages - 17) + 1
        for i in range(B):
            n = -(-int(seq_lens[i]) // ps)
            pt[i, :n] = perm[i * max_pages : i * max_pages + n]
    S = max(q_lens)
    q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
    return (jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(pt), jnp.asarray(np.asarray(seq_lens, np.int32)),
            jnp.asarray(np.asarray(q_lens, np.int32)))


def _ref_prefill(q, kc, vc, pt, sl, ql, ps, sm):
    D = q.shape[-1]
    k = page_gather_mha(kc, pt, ps)[..., :D]
    v = page_gather_mha(vc, pt, ps)[..., :D]
    return mha_attend(q, k, v, sl, ql, sm)


@pytest.mark.parametrize(
    "B,Hq,Hk,D,ps,seqs,qls,seq_pages,bq",
    [
        (2, 4, 2, 64, 16, [40, 70], [40, 70], False, 32),   # full prefill
        (3, 8, 2, 64, 16, [50, 33, 64], [10, 33, 1], False, 32),  # prefix
        (2, 14, 2, 64, 16, [100, 3], [20, 3], True, 32),    # run DMA path
        (1, 4, 4, 128, 16, [300], [260], False, 128),       # long, D=128
        (2, 4, 4, 64, 4, [9, 31], [9, 2], False, 32),       # tiny pages
    ],
)
def test_paged_prefill_matches_ref(B, Hq, Hk, D, ps, seqs, qls,
                                   seq_pages, bq):
    from sglang_fluentllm_tpu.ops.attention.pallas_prefill import (
        paged_prefill_attention,
    )

    q, kc, vc, pt, sl, ql = _make_prefill_case(
        B, Hq, Hk, D, ps, seqs, qls, sequential=seq_pages
    )
    rng = np.random.RandomState(21)
    kst, vst = _stack_layers(kc, vc, 2, 1, rng)
    sm = 1.0 / np.sqrt(D)
    ref = _ref_prefill(q, kc, vc, pt, sl, ql, ps, sm)
    Dp = kst.shape[-1]
    q2 = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D))) \
        if Dp != D else q
    with pltpu.force_tpu_interpret_mode():
        out = paged_prefill_attention(
            q2, kst, vst, jnp.int32(1), pt, sl, ql,
            page_size=ps, sm_scale=sm, bq=bq,
        )[0][..., :D]
    # compare only valid (s < q_len) positions
    for i in range(B):
        n = int(ql[i])
        np.testing.assert_allclose(
            np.asarray(out)[i, :n], np.asarray(ref)[i, :n],
            rtol=3e-5, atol=3e-5,
        )


def test_multirow_fused_write_matches_ref():
    """Fused-write mode: the kernel itself writes the current token's KV
    into the pool (replacing the host scatter) and attends over it."""
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        paged_decode_multirow,
    )

    B, Hq, Hk, D, ps = 4, 8, 2, 128, 16
    seqs = [33, 60, 3, 17]  # INCLUDING the current token
    max_pages = 4
    rng = np.random.RandomState(5)
    num_pages = B * max_pages + 1 + 16
    slots = num_pages * ps
    kc = np.zeros((2, Hk, slots, D), np.float32)
    vc = np.zeros((2, Hk, slots, D), np.float32)
    kc[:] = rng.standard_normal(kc.shape)
    vc[:] = rng.standard_normal(vc.shape)
    pt = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        n = -(-seqs[i] // ps)
        pt[i, :n] = 1 + i * max_pages + np.arange(n)
    k_new = rng.standard_normal((B, Hk, D)).astype(np.float32)
    v_new = rng.standard_normal((B, Hk, D)).astype(np.float32)
    new_slots = np.asarray(
        [pt[i, (seqs[i] - 1) // ps] * ps + (seqs[i] - 1) % ps
         for i in range(B)], np.int32,
    )
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    sl = np.asarray(seqs, np.int32)

    # reference: cache WITH the token already written
    kc_ref = kc.copy()
    vc_ref = vc.copy()
    for i in range(B):
        kc_ref[1, :, new_slots[i]] = k_new[i]
        vc_ref[1, :, new_slots[i]] = v_new[i]
    ref = ref_decode(jnp.asarray(q), jnp.asarray(kc_ref[1]),
                     jnp.asarray(vc_ref[1]), jnp.asarray(pt),
                     jnp.asarray(sl), ps, 0.088)

    with pltpu.force_tpu_interpret_mode():
        out, k2, v2 = paged_decode_multirow(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.int32(1), jnp.asarray(pt), jnp.asarray(sl),
            k_new=jnp.asarray(k_new), v_new=jnp.asarray(v_new),
            new_slots=jnp.asarray(new_slots),
            page_size=ps, sm_scale=0.088, rows=2,
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )
    # the pool now contains the written rows
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(k2)[1, :, new_slots[i]], k_new[i], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(v2)[1, :, new_slots[i]], v_new[i], rtol=1e-6
        )


def test_paged_backend_extend_matches_ref():
    """Backend-level parity: PagedAttentionBackend extend (scatter +
    ragged Pallas prefill over the pool) == RefAttentionBackend, incl.
    radix-prefix rows, non-run page tables, and lane padding (D=64)."""
    from sglang_fluentllm_tpu.mem.kv_cache import (
        MHAKVCache, padded_head_dim,
    )
    from sglang_fluentllm_tpu.ops.attention.paged_backend import (
        PagedAttentionBackend,
    )
    from sglang_fluentllm_tpu.ops.attention.ref_backend import (
        RefAttentionBackend,
    )
    from sglang_fluentllm_tpu.runtime.forward_batch import (
        ForwardBatch, ForwardMode,
    )

    rng = np.random.RandomState(5)
    B, S, Hq, Hk, D, ps, L = 3, 48, 8, 2, 64, 16, 2
    Dp = padded_head_dim(D)
    seqs = [70, 48, 5]      # total incl. new
    qls = [40, 48, 5]       # new tokens this extend (row 0 has a prefix)
    P = max(-(-s // ps) for s in seqs)
    num_pages = B * P + 1 + 16
    # scattered (non-run) page tables
    perm = rng.permutation(np.arange(1, num_pages - 16))
    pt = np.zeros((B, P), np.int32)
    out_loc = np.zeros((B, S), np.int32)
    for i, (sl_i, ql_i) in enumerate(zip(seqs, qls)):
        npg = -(-sl_i // ps)
        pt[i, :npg] = perm[i * P : i * P + npg]
        prefix = sl_i - ql_i
        for j in range(ql_i):
            pos = prefix + j
            out_loc[i, j] = pt[i, pos // ps] * ps + pos % ps

    def make_pool():
        k = np.zeros((L, Hk, num_pages * ps, Dp), np.float32)
        v = np.zeros((L, Hk, num_pages * ps, Dp), np.float32)
        k[..., :D] = rng.standard_normal((L, Hk, num_pages * ps, D))
        v[..., :D] = rng.standard_normal((L, Hk, num_pages * ps, D))
        k[:, :, :ps] = 0
        v[:, :, :ps] = 0
        return MHAKVCache(k=jnp.asarray(k), v=jnp.asarray(v))

    q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
    k_new = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
    v_new = rng.standard_normal((B, S, Hk, D)).astype(np.float32)
    batch = ForwardBatch(
        input_ids=jnp.zeros((B, S), jnp.int32),
        positions=jnp.zeros((B, S), jnp.int32),
        out_cache_loc=jnp.asarray(out_loc),
        page_tables=jnp.asarray(pt),
        seq_lens=jnp.asarray(np.asarray(seqs, np.int32)),
        q_lens=jnp.asarray(np.asarray(qls, np.int32)),
        mode=ForwardMode.EXTEND,
        page_size=ps,
        pages_are_runs=False,
    )
    pool = make_pool()
    sm = 1.0 / np.sqrt(D)
    ref_out, ref_pool = RefAttentionBackend()(
        pool, 1, jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        batch, sm,
    )
    with pltpu.force_tpu_interpret_mode():
        out, new_pool = PagedAttentionBackend()(
            pool, 1, jnp.asarray(q), jnp.asarray(k_new),
            jnp.asarray(v_new), batch, sm,
        )
    for i, ql_i in enumerate(qls):
        np.testing.assert_allclose(
            np.asarray(out)[i, :ql_i], np.asarray(ref_out)[i, :ql_i],
            rtol=3e-5, atol=3e-5,
        )
    # pool parity on every VALID token slot (the fused write zero-fills
    # page tails beyond seq_len and skips the padding page — positions the
    # contract says are never read)
    got_k = np.asarray(new_pool.k)
    want_k = np.asarray(ref_pool.k)
    for i, sl_i in enumerate(seqs):
        for pos in range(sl_i):
            slot = pt[i, pos // ps] * ps + pos % ps
            np.testing.assert_allclose(
                got_k[:, :, slot], want_k[:, :, slot], rtol=1e-6,
                err_msg=f"row {i} pos {pos}",
            )


# ----------------------------------------------------------------------
# Sliding-window + attention-sink variants
# ----------------------------------------------------------------------

def _ref_swa_decode(q, kc, vc, pt, sl, ps, sm, window=None, sinks=None):
    D = q.shape[-1]
    k = page_gather_mha(kc, pt, ps)[..., :D]
    v = page_gather_mha(vc, pt, ps)[..., :D]
    q_lens = (sl > 0).astype(jnp.int32)
    out = mha_attend(q[:, None], k, v, sl, q_lens, sm,
                     window=window, sinks=sinks)
    return out[:, 0]


@pytest.mark.parametrize("window", [8, 48, 300])
def test_multirow_decode_sliding_window(window):
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        paged_decode_multirow,
    )

    B, Hq, Hk, D, ps = 3, 8, 2, 64, 16
    seqs = [100, 37, 5]
    q, kc, vc, pt, sl = make_case(B, Hq, Hk, D, ps, 8, seqs)
    rng = np.random.RandomState(11)
    kst, vst = _stack_layers(kc, vc, 2, 1, rng)
    Dp = kst.shape[-1]
    q2 = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
    sm = 1.0 / np.sqrt(D)
    ref = _ref_swa_decode(q, kc, vc, pt, sl, ps, sm,
                          window=jnp.int32(window))
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = paged_decode_multirow(
            q2, kst, vst, jnp.int32(1), pt, sl,
            window=jnp.int32(window),
            page_size=ps, sm_scale=sm, rows=2,
        )
    np.testing.assert_allclose(
        np.asarray(out)[..., :D], np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_multirow_decode_sinks():
    from sglang_fluentllm_tpu.ops.attention.pallas_decode_multirow import (
        paged_decode_multirow,
    )

    B, Hq, Hk, D, ps = 2, 8, 2, 64, 16
    seqs = [60, 13]
    q, kc, vc, pt, sl = make_case(B, Hq, Hk, D, ps, 5, seqs)
    rng = np.random.RandomState(12)
    kst, vst = _stack_layers(kc, vc, 2, 1, rng)
    Dp = kst.shape[-1]
    q2 = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
    sm = 1.0 / np.sqrt(D)
    sinks = jnp.asarray(rng.standard_normal(Hq).astype(np.float32))
    ref = _ref_swa_decode(q, kc, vc, pt, sl, ps, sm, sinks=sinks)
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = paged_decode_multirow(
            q2, kst, vst, jnp.int32(1), pt, sl, sinks=sinks,
            page_size=ps, sm_scale=sm, rows=2,
        )
    np.testing.assert_allclose(
        np.asarray(out)[..., :D], np.asarray(ref), rtol=3e-5, atol=3e-5
    )


@pytest.mark.parametrize("window", [8, 40])
def test_paged_prefill_sliding_window(window):
    from sglang_fluentllm_tpu.ops.attention.pallas_prefill import (
        paged_prefill_attention,
    )

    B, Hq, Hk, D, ps = 2, 8, 2, 64, 16
    seqs, qls = [90, 33], [60, 33]
    q, kc, vc, pt, sl, ql = _make_prefill_case(
        B, Hq, Hk, D, ps, seqs, qls
    )
    rng = np.random.RandomState(13)
    kst, vst = _stack_layers(kc, vc, 2, 1, rng)
    sm = 1.0 / np.sqrt(D)
    k = page_gather_mha(kc, pt, ps)[..., :D]
    v = page_gather_mha(vc, pt, ps)[..., :D]
    sinks = jnp.asarray(rng.standard_normal(Hq).astype(np.float32))
    ref = mha_attend(q, k, v, sl, ql, sm, window=jnp.int32(window),
                     sinks=sinks)
    Dp = kst.shape[-1]
    q2 = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
    with pltpu.force_tpu_interpret_mode():
        out = paged_prefill_attention(
            q2, kst, vst, jnp.int32(1), pt, sl, ql,
            window=jnp.int32(window), sinks=sinks,
            page_size=ps, sm_scale=sm, bq=32,
        )[0][..., :D]
    for i in range(B):
        n = int(ql[i])
        np.testing.assert_allclose(
            np.asarray(out)[i, :n], np.asarray(ref)[i, :n],
            rtol=3e-5, atol=3e-5,
        )
