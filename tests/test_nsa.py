"""NSA (native sparse attention) tests: compression/selection oracles vs
numpy transcriptions of the reference torch/triton kernels, plus engine
invariants (decode == prefill through the recomputed compressed state)."""

import numpy as np
import pytest

from tests.utils import tiny_engine

TINY_NSA_CFG = {
    "architectures": ["Qwen3NSAForCausalLM"],
    "model_type": "qwen3_nsa",
    "hidden_size": 64,
    "intermediate_size": 96,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 2,
    "vocab_size": 128,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "head_dim": 16,
    "tie_word_embeddings": False,
    "kernel_size": 4,
    "stride": 2,
    "select_size": 4,
    "top_n": 3,
    "slc_att_num_init_blocks": 1,
    "slc_att_num_local_blocks": 2,
    "window_size": 6,
}

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 17]
SP = {"max_new_tokens": 6, "temperature": 0.0}


class TestNsaOps:
    def test_gated_compress_oracle(self):
        from sglang_fluentllm_tpu.ops.attention.nsa import gated_compress

        rng = np.random.RandomState(0)
        B, T, H, D, K, s = 2, 11, 2, 4, 4, 2
        x = rng.standard_normal((B, T, H, D)).astype(np.float32)
        gw = rng.standard_normal((K * D, K)).astype(np.float32)
        got = np.asarray(gated_compress(x, gw, K, s))
        NB = (T - K) // s + 1
        assert got.shape == (B, NB, H, D)
        for b in range(B):
            for n in range(NB):
                for h in range(H):
                    block = x[b, n * s:n * s + K, h]        # [K, D]
                    logits = block.reshape(-1) @ gw
                    w = np.exp(logits - logits.max())
                    w = w / w.sum()
                    ref = (w[:, None] * block).sum(0)
                    np.testing.assert_allclose(
                        got[b, n, h], ref, rtol=1e-5, atol=1e-5)

    def test_full_selection_matches_dense(self):
        """With top_n >= all blocks AND window >= T, the slc and win
        branches both equal dense causal attention."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.ops.attention.nsa import (
            NSAParams,
            nsa_attend,
        )

        rng = np.random.RandomState(1)
        B, S, Hq, Hk, D = 1, 6, 2, 1, 4
        T = S
        q = rng.standard_normal((B, S, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, T, Hk, D)).astype(np.float32)
        v = rng.standard_normal((B, T, Hk, D)).astype(np.float32)
        q_pos = np.arange(S)[None, :].astype(np.int32)
        seq = np.asarray([T], np.int32)
        K = 2
        params = NSAParams(
            gate_k=np.zeros((K * D, K), np.float32),
            gate_v=np.zeros((K * D, K), np.float32),
            # huge positive gate weights -> sigmoid ~ 1 for every branch
            fusion_w=np.zeros((Hq, 3, 3 * D), np.float32),
        )
        out = np.asarray(nsa_attend(
            q, k, v, q_pos, seq, params, kernel=K, stride=1,
            select_size=2, top_n=64, n_init=1, n_local=1,
            window=T + 1, sm_scale=0.5,
        ))
        # dense causal oracle for the slc/win branches
        dense = np.zeros((B, S, Hq, D), np.float32)
        for t in range(S):
            for h in range(Hq):
                sc = (q[0, t, h] @ k[0, :t + 1, 0].T) * 0.5
                p = np.exp(sc - sc.max()); p /= p.sum()
                dense[0, t, h] = p @ v[0, :t + 1, 0]
        # zero fusion weights -> every gate = 0.5; cmp branch differs,
        # but slc == win == dense, so out = 0.5*(cmp + 2*dense)... to
        # avoid cmp, check out - 0.5*dense*2 consistency instead:
        # simpler assertion: the function is deterministic and finite
        assert np.isfinite(out).all()
        # and with gates at 0.5 the dense part contributes exactly
        # 0.5*(slc+win) = dense; verify by subtracting and checking the
        # residual equals 0.5*cmp (recompute cmp via the same util)
        from sglang_fluentllm_tpu.ops.attention.nsa import (
            _gqa_attend,
            _gqa_scores,
            gated_compress,
        )

        ck = np.asarray(gated_compress(k, params.gate_k, K, 1))
        cv = np.asarray(gated_compress(v, params.gate_v, K, 1))
        NB = ck.shape[1]
        cs = np.asarray(_gqa_scores(q, ck, 0.5))
        blk_last = np.arange(NB) * 1 + K - 1
        vis = q_pos[:, None, :, None] >= blk_last[None, None, None, :]
        cs = np.where(vis, cs, -1e30)
        cp = np.exp(cs - cs.max(-1, keepdims=True))
        cp = cp / np.maximum(cp.sum(-1, keepdims=True), 1e-30)
        cp = np.where(vis.any(-1, keepdims=True), cp, 0.0)
        cmp_o = np.asarray(_gqa_attend(cp, cv))
        np.testing.assert_allclose(
            out, 0.5 * (cmp_o + 2 * dense), rtol=2e-4, atol=2e-4)


class TestNsaEngine:
    def test_generates_deterministically(self):
        e = tiny_engine(TINY_NSA_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert len(out["output_ids"]) == 6
        out2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert out["output_ids"] == out2["output_ids"]

    def test_decode_matches_prefill(self):
        e = tiny_engine(TINY_NSA_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[4]

    def test_sparsity_engages(self):
        """Long prompt (> select blocks than top_n) still serves and is
        deterministic."""
        long_prompt = [int(x) for x in
                       np.random.RandomState(0).randint(1, 127, 48)]
        e = tiny_engine(TINY_NSA_CFG)
        o1 = e.generate(input_ids=long_prompt, sampling_params=SP)
        o2 = e.generate(input_ids=long_prompt, sampling_params=SP)
        assert o1["output_ids"] == o2["output_ids"]


TINY_MHA_NSA_CFG = {
    "architectures": ["DeepseekMhaNsaForCausalLM"],
    "model_type": "deepseek_mha_nsa",
    "hidden_size": 64,
    "intermediate_size": 96,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 2,
    "vocab_size": 128,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "head_dim": 16,
    "tie_word_embeddings": False,
    "kernel_size": 4,
    "stride": 2,
    "select_size": 4,
    "top_n": 3,
    "slc_att_num_init_blocks": 1,
    "slc_att_num_local_blocks": 2,
    "window_size": 6,
    "n_routed_experts": 4,
    "num_experts_per_tok": 2,
    "moe_intermediate_size": 32,
    "n_shared_experts": 1,
    "first_k_dense_replace": 1,
    "topk_method": "noaux_tc",
    "scoring_func": "sigmoid",
    "norm_topk_prob": True,
}


class TestDeepseekMhaNsa:
    def test_generates_and_decode_matches_prefill(self):
        e = tiny_engine(TINY_MHA_NSA_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert len(out["output_ids"]) == 6
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[4]


class TestNsaSparseDecode:
    """The paged sparse decode path (_decode_sparse over NSAKVCache:
    cached compressed rows + selected/window token gathers only) must
    match the dense three-branch path bit-for-decision (same greedy
    ids). ``decode_dense_window_bytes=0`` disables the dense-window
    regime so every decode step takes the sparse path."""

    def test_sparse_matches_dense_window_path(self):
        dense = tiny_engine(TINY_NSA_CFG)
        o_dense = dense.generate(input_ids=PROMPT, sampling_params=SP)
        sparse = tiny_engine(TINY_NSA_CFG, decode_dense_window_bytes=0)
        o_sparse = sparse.generate(input_ids=PROMPT, sampling_params=SP)
        assert o_dense["output_ids"] == o_sparse["output_ids"]

    def test_sparse_long_context(self):
        long_prompt = [int(x) for x in
                       np.random.RandomState(1).randint(1, 127, 80)]
        dense = tiny_engine(TINY_NSA_CFG)
        o_dense = dense.generate(input_ids=long_prompt, sampling_params=SP)
        sparse = tiny_engine(TINY_NSA_CFG, decode_dense_window_bytes=0)
        o_sparse = sparse.generate(input_ids=long_prompt,
                                   sampling_params=SP)
        assert o_dense["output_ids"] == o_sparse["output_ids"]

    def test_sparse_decode_matches_prefill(self):
        e = tiny_engine(TINY_NSA_CFG, decode_dense_window_bytes=0)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        toks = out["output_ids"]
        e.flush_cache()
        out2 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["output_ids"][0] == toks[4]

    def test_radix_prefix_reuse_keeps_sparse_correct(self):
        """A second request reusing a radix-cached prefix gets correct
        compressed rows (refresh-on-extend recomputes from the pool)."""
        e = tiny_engine(TINY_NSA_CFG, decode_dense_window_bytes=0)
        o1 = e.generate(input_ids=PROMPT, sampling_params=SP)
        # same prompt again: radix hit -> prefix_len > 0 on extend
        o2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert o1["output_ids"] == o2["output_ids"]
        assert o2["meta_info"].get("cached_tokens", 0) > 0

    def test_compressed_rows_populated(self):
        e = tiny_engine(TINY_NSA_CFG, decode_dense_window_bytes=0)
        e.generate(input_ids=PROMPT, sampling_params=SP)
        kv = e.runner.kv_cache
        from sglang_fluentllm_tpu.mem.kv_cache import NSAKVCache

        assert isinstance(kv, NSAKVCache)
        assert float(np.abs(np.asarray(kv.ck)).sum()) > 0


class TestNsaSelectKernel:
    """Pallas select-branch kernel vs the jnp sparse gather formulation
    (kernel-vs-jnp parity; on CPU the kernel runs in TPU interpret
    mode). Reference contract: native_sparse_attention/select_attn.py."""

    def _mk(self, B=5, Hk=2, G=2, D=64, ss=8, ps=8, Ksel=3, T_max=64,
            seed=0):
        import jax
        import jax.numpy as jnp

        rng = np.random.RandomState(seed)
        L = 2
        P = T_max // ps
        slots = (1 + B * P + 2) * ps
        k_pool = jnp.asarray(
            rng.standard_normal((L, Hk, slots, D)) * 0.3, jnp.bfloat16)
        v_pool = jnp.asarray(
            rng.standard_normal((L, Hk, slots, D)) * 0.3, jnp.bfloat16)
        pages = np.zeros((B, P), np.int32)
        for b in range(B):
            pages[b] = 1 + b * P + np.arange(P)
        # scatter pages for one row to exercise the fixup path
        if P >= 2:
            pages[0, 0], pages[0, 1] = pages[0, 1], pages[0, 0]
        T = np.asarray(
            [T_max, T_max - 3, ss + 1, 1, T_max // 2], np.int32)[:B]
        NSel = T_max // ss
        top = np.full((B, Hk, Ksel), -1, np.int32)
        for b in range(B):
            nsel_b = max(1, -(-int(T[b]) // ss))
            for h in range(Hk):
                picks = rng.permutation(nsel_b)[:Ksel]
                top[b, h, :len(picks)] = picks
        q = jnp.asarray(
            rng.standard_normal((B, Hk, G, D)) * 0.3, jnp.bfloat16)
        return (q, k_pool, v_pool, jnp.asarray(pages),
                jnp.asarray(T), jnp.asarray(top), ss, ps)

    def _jnp_ref(self, q, k_pool, v_pool, pages, T, top, ss, ps, lid):
        import jax
        import jax.numpy as jnp

        B, Hk, G, D = q.shape
        Ksel = top.shape[-1]
        NEG = -1e30
        tok = (top[..., None] * ss
               + jnp.arange(ss)[None, None, None, :])
        valid = (top[..., None] >= 0) & (tok < T[:, None, None, None])
        tokf = jnp.clip(tok, 0, pages.shape[1] * ps - 1)
        tokf = tokf.reshape(B, Hk * Ksel * ss)
        slot = (jnp.take_along_axis(pages, tokf // ps, axis=1) * ps
                + tokf % ps).reshape(B, Hk, Ksel * ss)
        lidx = jnp.full((B, Hk, Ksel * ss), lid, jnp.int32)
        hidx = jnp.broadcast_to(
            jnp.arange(Hk)[None, :, None], (B, Hk, Ksel * ss))
        ksel = k_pool[lidx, hidx, slot]
        vsel = v_pool[lidx, hidx, slot]
        s = jnp.einsum("bhgd,bhnd->bhgn", q.astype(jnp.float32),
                       ksel.astype(jnp.float32))
        s = jnp.where(valid.reshape(B, Hk, 1, -1), s, NEG)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(
            jnp.any(valid.reshape(B, Hk, -1), -1)[:, :, None, None],
            p, 0.0)
        return jnp.einsum("bhgn,bhnd->bhgd", p, vsel.astype(jnp.float32))

    @pytest.mark.parametrize("ss,ps", [(8, 8), (16, 8), (8, 16)])
    def test_kernel_matches_jnp(self, ss, ps):
        import jax
        from jax.experimental.pallas import tpu as pltpu

        from sglang_fluentllm_tpu.ops.attention.pallas_nsa_select import (
            nsa_select_decode,
        )

        args = self._mk(ss=ss, ps=ps, T_max=64)
        q, k_pool, v_pool, pages, T, top = args[:6]
        ref = np.asarray(self._jnp_ref(q, k_pool, v_pool, pages, T, top,
                                       ss, ps, lid=1))
        with pltpu.force_tpu_interpret_mode():
            out, _, _ = nsa_select_decode(
                q, k_pool, v_pool, 1, pages, T, top,
                select_size=ss, page_size=ps, run_only=False,
            )
        out = np.asarray(out.astype(jax.numpy.float32))
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)
