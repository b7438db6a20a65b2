"""Over-embedding (LongCat OEP hashed n-gram embeddings) tests.

Oracle checks for the modular-hash ops against Python big-int
arithmetic, ring bookkeeping invariants, and engine-level consistency:
decode (device ring history) must agree token-for-token with prefill
continuation (host hist_tail + slicing), including through radix-cache
prefix reuse.
"""

import numpy as np

from tests.utils import tiny_engine

TINY_OEP_CFG = {
    "architectures": ["LongcatFlashForCausalLM"],
    "model_type": "longcat_flash",
    "hidden_size": 64,
    "intermediate_size": 96,
    "moe_intermediate_size": 64,
    "num_attention_heads": 4,
    "num_hidden_layers": 2,
    "vocab_size": 128,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
    "q_lora_rank": 48,
    "kv_lora_rank": 64,
    "qk_nope_head_dim": 32,
    "qk_rope_head_dim": 16,
    "v_head_dim": 32,
    "n_routed_experts": 4,
    "moe_topk": 2,
    "zero_expert_num": 1,
    "oe_vocab_size_ratio": 0.25,   # M = 32 -> mods 33,35,37,39
    "oe_neighbor_num": 3,          # bigrams + trigrams
    "oe_split_num": 2,             # 2 splits each -> F = 4 families
    "tie_word_embeddings": False,
}

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 61, 2]
SP = {"max_new_tokens": 6, "temperature": 0.0}


class TestOepOps:
    def test_mulmod_oracle(self):
        from sglang_fluentllm_tpu.ops.over_embedding import mulmod

        rng = np.random.RandomState(0)
        # exercise moduli above 2^16 (the int32-overflow regime the
        # shift-add path exists for)
        m = np.asarray([7, 65521, 1 << 20, (1 << 30) - 1], np.int32)
        a = rng.randint(0, 1 << 30, size=(50, 4)).astype(np.int32)
        b = rng.randint(0, 1 << 30, size=(50, 4)).astype(np.int32) % m
        got = np.asarray(mulmod(a, b, m))
        ref = (a.astype(object) * b.astype(object)) % m.astype(object)
        np.testing.assert_array_equal(got, ref.astype(np.int64))

    def test_ngram_ids_oracle(self):
        from sglang_fluentllm_tpu.ops.over_embedding import (
            ngram_ids,
            oep_constants,
        )

        V, M, K, N = 131072, 13107, 3, 4   # realistic-scale moduli
        mods, weights, offsets = oep_constants(V, M, K, N)
        F = (N - 1) * K
        rng = np.random.RandomState(1)
        toks = rng.randint(0, V, size=(2, 5, N)).astype(np.int32)
        got = np.asarray(ngram_ids(toks, mods, weights, offsets, K))
        for b in range(2):
            for s in range(5):
                for i in range(F):
                    n = i // K + 2
                    m = int(mods[i])
                    h = sum(
                        int(toks[b, s, d]) * pow(V, d, m)
                        for d in range(n)
                    ) % m
                    assert got[b, s, i] == h + int(offsets[i]), (b, s, i)

    def test_constants_match_reference_recipe(self):
        """m_i = M + 2 i + 1; offsets are exclusive sums of the moduli
        (reference FusedOverEmbedding.__init__)."""
        from sglang_fluentllm_tpu.ops.over_embedding import oep_constants

        mods, weights, offsets = oep_constants(128, 32, 2, 3)
        assert list(mods) == [33, 35, 37, 39]
        assert list(offsets) == [0, 33, 68, 105]
        assert weights[2, 0] == 1 and weights[2, 1] == 128 % 37

    def test_ring_roundtrip(self):
        """Extend writes the last RING_W tokens; history reads recover
        them in reverse order, 0 below position 0."""
        import jax.numpy as jnp

        from sglang_fluentllm_tpu.ops.over_embedding import (
            RING_W,
            ring_history,
            ring_update_extend,
        )

        ring = jnp.zeros((3, RING_W), jnp.int32) - 7   # poisoned
        rows = jnp.asarray([0, 1], jnp.int32)
        S = 5
        # row 0: fresh request, positions 0..4; row 1: chunk at 10..14
        tail0 = np.zeros(RING_W, np.int32)
        tail1 = np.arange(10 - RING_W, 10, dtype=np.int32) + 100
        chunk = np.stack([
            np.arange(S, dtype=np.int32) + 1,
            np.arange(S, dtype=np.int32) + 200,
        ])
        tokens_ext = jnp.asarray(
            np.concatenate([np.stack([tail0, tail1]), chunk], axis=1))
        ring = ring_update_extend(
            ring, rows, tokens_ext,
            jnp.asarray([0, 10], jnp.int32),
            jnp.asarray([S, S], jnp.int32),
        )
        # row 0 at position 5 looking 4 back: tokens 5,4,3,2 = chunk
        # values 5..2; history below 0 is 0
        h = np.asarray(ring_history(
            ring, rows, jnp.asarray([5, 15], jnp.int32), 7))
        assert list(h[0][:5]) == [5, 4, 3, 2, 1]
        assert list(h[0][5:]) == [0, 0]
        # row 1 at position 15: chunk tokens then tail tokens
        assert list(h[1][:5]) == [204, 203, 202, 201, 200]
        assert list(h[1][5:]) == [109, 108]


class TestOepEngine:
    def test_generates_deterministically(self):
        e = tiny_engine(TINY_OEP_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert len(out["output_ids"]) == 6
        out2 = e.generate(input_ids=PROMPT, sampling_params=SP)
        assert out["output_ids"] == out2["output_ids"]

    def test_decode_matches_prefill_continuation(self):
        """Device-ring n-gram history (decode) vs host hist_tail +
        slicing (extend) must agree, including through the radix-cached
        prefix re-admission."""
        e = tiny_engine(TINY_OEP_CFG)
        out = e.generate(input_ids=PROMPT, sampling_params=SP)
        toks = out["output_ids"]
        out2 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out2["meta_info"]["cached_tokens"] > 0
        assert out2["output_ids"][0] == toks[4]
        e.flush_cache()
        out3 = e.generate(
            input_ids=PROMPT + toks[:4],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        )
        assert out3["output_ids"][0] == toks[4]

    def test_ngrams_change_the_distribution(self):
        """Same last token, different preceding context => different
        n-gram ids => different embedding. Guards against the OEP path
        silently degrading to word-embedding-only."""
        import jax

        e = tiny_engine(TINY_OEP_CFG)
        model = e.runner.model
        assert model.oep is not None
        params = e.runner.params
        sp = {"max_new_tokens": 1, "temperature": 0.0,
              "return_logprob": True, "top_logprobs_num": 3}
        a = e.generate(input_ids=[5, 9, 77], sampling_params=sp)
        b = e.generate(input_ids=[8, 3, 77], sampling_params=sp)
        la = a["meta_info"]["output_top_logprobs"][0]
        lb = b["meta_info"]["output_top_logprobs"][0]
        assert la != lb

    def test_checkpoint_table_assembly(self):
        """Per-family checkpoint tensors land at the right fused-table
        offsets under both reference name forms."""
        import numpy as np

        e = tiny_engine(TINY_OEP_CFG)
        model = e.runner.model
        o = model.oep
        rng = np.random.RandomState(3)
        named = []
        fams = []
        H = TINY_OEP_CFG["hidden_size"]
        for i in range(o["F"]):
            rows = int(o["row_sums"][i + 1] - o["row_sums"][i])
            fam = rng.standard_normal((rows, o["oe_hidden"])).astype(
                np.float32)
            fams.append(fam)
            pref = ("model.ngram_embeddings.embedders" if i % 2
                    else "model.oe_embed_tokens")
            sep = "." if i % 2 else ""
            named.append((f"{pref}{sep}{i}.weight", fam))
            named.append((
                (f"model.ngram_embeddings.post_projs.{i}.weight"
                 if i % 2 else f"model.oe_embed_proj{i}.weight"),
                rng.standard_normal((H, o["oe_hidden"])).astype(
                    np.float32),
            ))
        top = {}
        for name, w in named:
            assert model._oep_collect(name, w, top), name
        params = {}
        model._oep_finish(top, params, np.float32)
        table = np.asarray(params["oe_table"])
        for i in range(o["F"]):
            lo, hi = int(o["row_sums"][i]), int(o["row_sums"][i + 1])
            np.testing.assert_allclose(
                table[lo:hi], fams[i], rtol=1e-6)
        assert np.asarray(params["oe_proj"]).shape == (
            o["F"], o["oe_hidden"], H)


class TestOepSpecDecode:
    """OEP x speculative decoding: verify extends patch their n-gram
    tails from the position-indexed device ring, so spec windows stay
    LOSSLESS on over-embedding models (rejected-token ring writes are
    overwritten by the next window before any read)."""

    def _baseline(self, sp):
        e = tiny_engine(TINY_OEP_CFG)
        return e.generate(input_ids=PROMPT, sampling_params=sp)["output_ids"]

    def test_oep_nextn_lossless(self):
        sp = {"max_new_tokens": 13, "temperature": 0.0}
        ref = self._baseline(sp)
        e = tiny_engine(TINY_OEP_CFG, speculative_algorithm="NEXTN",
                        speculative_num_steps=3)
        out = e.generate(input_ids=PROMPT, sampling_params=sp)
        assert out["output_ids"] == ref

    def test_oep_pld_lossless_repetitive(self):
        """Repetitive prompt: PLD accepts multi-token windows, stressing
        the ring across accepted-length jumps."""
        rep = [5, 6, 7, 8] * 5
        sp = {"max_new_tokens": 12, "temperature": 0.0}
        ref = tiny_engine(TINY_OEP_CFG).generate(
            input_ids=rep, sampling_params=sp)["output_ids"]
        e = tiny_engine(TINY_OEP_CFG, speculative_algorithm="PLD",
                        speculative_num_steps=3)
        out = e.generate(input_ids=rep, sampling_params=sp)
        assert out["output_ids"] == ref

    def test_oep_spec_batch(self):
        sp = {"max_new_tokens": 9, "temperature": 0.0}
        prompts = [PROMPT, [9, 8, 7], list(range(1, 14))]
        refs = tiny_engine(TINY_OEP_CFG).generate(
            input_ids=prompts, sampling_params=sp)
        e = tiny_engine(TINY_OEP_CFG, speculative_algorithm="NEXTN",
                        speculative_num_steps=2)
        outs = e.generate(input_ids=prompts, sampling_params=sp)
        for o, r in zip(outs, refs):
            assert o["output_ids"] == r["output_ids"]
