"""End-to-end engine tests on the tiny dummy model (CPU jax).

Mirrors the role of reference test/srt/test_srt_endpoint.py basic generation
coverage, via the in-process Engine (reference engine.py Engine.generate).
"""

import numpy as np
import pytest

from tests.utils import TINY_LLAMA_CFG, TINY_QWEN2_CFG, TINY_QWEN3_CFG, tiny_engine

PROMPT = [3, 11, 42, 7, 19, 88, 5, 23, 54, 17]


@pytest.fixture(scope="module")
def engine():
    return tiny_engine()


class TestEngineBasic:
    def test_greedy_generation(self, engine):
        out = engine.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 8
        assert out["meta_info"]["completion_tokens"] == 8
        assert out["meta_info"]["prompt_tokens"] == len(PROMPT)
        assert all(0 <= t < 128 for t in out["output_ids"])

    def test_greedy_deterministic(self, engine):
        sp = {"max_new_tokens": 8, "temperature": 0.0}
        o1 = engine.generate(input_ids=PROMPT, sampling_params=sp)
        o2 = engine.generate(input_ids=PROMPT, sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]

    def test_prefix_cache_hit(self, engine):
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        engine.generate(input_ids=PROMPT, sampling_params=sp)
        out = engine.generate(input_ids=PROMPT + [99, 98], sampling_params=sp)
        assert out["meta_info"]["cached_tokens"] >= 4  # page-aligned prefix

    def test_batch_generation(self, engine):
        prompts = [PROMPT, PROMPT[:5], [1, 2, 3], list(range(20))]
        outs = engine.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0},
        )
        assert len(outs) == 4
        for o in outs:
            assert len(o["output_ids"]) == 6

    def test_batch_matches_single(self, engine):
        """Continuous batching must not change greedy results."""
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        singles = [
            engine.generate(input_ids=p, sampling_params=sp)["output_ids"]
            for p in [PROMPT, list(range(30, 45))]
        ]
        engine.flush_cache()
        batched = engine.generate(
            input_ids=[PROMPT, list(range(30, 45))], sampling_params=sp
        )
        assert [b["output_ids"] for b in batched] == singles

    def test_sampling_params_respected(self, engine):
        out = engine.generate(
            input_ids=PROMPT,
            sampling_params={
                "max_new_tokens": 5,
                "temperature": 0.8,
                "top_p": 0.9,
                "top_k": 10,
            },
        )
        assert len(out["output_ids"]) == 5

    def test_stop_token_ids(self, engine):
        sp = {"max_new_tokens": 32, "temperature": 0.0}
        base = engine.generate(input_ids=PROMPT, sampling_params=sp)
        stop_tok = base["output_ids"][2]
        out = engine.generate(
            input_ids=PROMPT,
            sampling_params={**sp, "stop_token_ids": [stop_tok]},
        )
        assert out["output_ids"][-1] == stop_tok
        assert len(out["output_ids"]) == 3
        assert out["meta_info"]["finish_reason"]["type"] == "stop"

    def test_return_logprob(self, engine):
        out = engine.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
            return_logprob=True,
        )
        lps = out["meta_info"]["output_token_logprobs"]
        assert len(lps) == 4
        assert all(lp <= 0.0 for lp, tid in lps)


class TestChunkedPrefill:
    def test_chunked_matches_unchunked(self):
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        prompt = list(np.random.RandomState(0).randint(0, 128, size=50))
        prompt = [int(x) for x in prompt]
        e1 = tiny_engine()
        ref = e1.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        e2 = tiny_engine(chunked_prefill_size=16)
        got = e2.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert got == ref


class TestSmallKVPressure:
    def test_retraction_under_pressure(self):
        """Many requests on a tiny pool: retraction + eviction must still
        produce full-length outputs (reference test_retract_decode)."""
        e = tiny_engine(max_total_tokens=256, max_running_requests=8)
        prompts = [
            [int(x) for x in np.random.RandomState(i).randint(0, 128, 12)]
            for i in range(10)
        ]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0},
        )
        assert len(outs) == 10
        for o in outs:
            assert len(o["output_ids"]) == 8
        assert e.scheduler.num_retracted >= 0  # loop completed


class TestOtherArchitectures:
    def test_qwen2(self):
        e = tiny_engine(TINY_QWEN2_CFG)
        out = e.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 4

    def test_qwen3(self):
        e = tiny_engine(TINY_QWEN3_CFG)
        out = e.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 4

    def test_radix_disabled(self):
        e = tiny_engine(disable_radix_cache=True)
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        o1 = e.generate(input_ids=PROMPT, sampling_params=sp)
        o2 = e.generate(input_ids=PROMPT, sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]
        assert o2["meta_info"]["cached_tokens"] == 0


class TestMultiStepDecode:
    def test_multi_step_matches_single(self):
        """Fused k-step decode must equal classic 1-step decode greedily."""
        sp = {"max_new_tokens": 11, "temperature": 0.0}
        prompt = [3, 11, 42, 7, 19, 88, 5]
        e1 = tiny_engine()
        ref = e1.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        e2 = tiny_engine(decode_steps_per_launch=4)
        got = e2.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
        assert got == ref

    def test_multi_step_eos_discard(self):
        """Finishing mid-window discards overshoot tokens."""
        sp = {"max_new_tokens": 32, "temperature": 0.0}
        e1 = tiny_engine()
        base = e1.generate(input_ids=[9, 8, 7], sampling_params=sp)
        stop_tok = base["output_ids"][1]
        e2 = tiny_engine(decode_steps_per_launch=4)
        out = e2.generate(
            input_ids=[9, 8, 7],
            sampling_params={**sp, "stop_token_ids": [stop_tok]},
        )
        assert out["output_ids"][-1] == stop_tok
        assert len(out["output_ids"]) == 2

    def test_multi_step_batch_pressure(self):
        e = tiny_engine(decode_steps_per_launch=4, max_total_tokens=512,
                        max_running_requests=8)
        prompts = [
            [int(x) for x in np.random.RandomState(i).randint(0, 128, 9)]
            for i in range(8)
        ]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 7, "temperature": 0.0},
        )
        assert all(len(o["output_ids"]) == 7 for o in outs)


class TestMixedChunk:
    def test_mixed_matches_unmixed(self):
        """Mixed chunk-decode batches must not change greedy results
        (reference --enable-mixed-chunk)."""
        sp = {"max_new_tokens": 10, "temperature": 0.0}
        long_p = [int(x) for x in
                  np.random.RandomState(3).randint(0, 128, 60)]
        short_p = [5, 9, 23]
        base_e = tiny_engine(chunked_prefill_size=16)
        base = base_e.generate(input_ids=[short_p, long_p],
                               sampling_params=sp)
        mix_e = tiny_engine(chunked_prefill_size=16,
                            enable_mixed_chunk=True)
        got = mix_e.generate(input_ids=[short_p, long_p],
                             sampling_params=sp)
        assert [o["output_ids"] for o in got] == [
            o["output_ids"] for o in base]

    def test_mixed_with_pressure(self):
        e = tiny_engine(chunked_prefill_size=16, enable_mixed_chunk=True,
                        max_total_tokens=512, max_running_requests=8)
        prompts = [
            [int(x) for x in
             np.random.RandomState(70 + i).randint(0, 128, 20 + 5 * i)]
            for i in range(6)
        ]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0},
        )
        assert all(len(o["output_ids"]) == 6 for o in outs)


class TestScore:
    """Engine.score numerics (reference Engine.score, engine.py:580)."""

    def test_score_matches_logprob_path(self):
        import numpy as np

        e = tiny_engine()
        q, item = [3, 11, 42], [7, 19]
        scores = e.score(query=q, items=[item], label_token_ids=[5, 9, 23])
        # cross-check against the generate logprob path: greedy 1 token
        # with top_logprobs gives the same next-token distribution
        out = e.generate(
            input_ids=q + item,
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "return_logprob": True,
                             "top_logprobs_num": 32},
        )
        tops = dict()
        for v, t in out["meta_info"]["output_top_logprobs"][0]:
            tops[int(t)] = float(v)
        for tid, p in zip([5, 9, 23], scores[0]):
            if tid in tops:
                assert abs(np.exp(tops[tid]) - p) < 1e-3

    def test_score_softmax_and_item_first(self):
        e = tiny_engine()
        s = e.score(query=[3, 11], items=[[7], [19]],
                    label_token_ids=[5, 9], apply_softmax=True)
        assert len(s) == 2
        for row in s:
            assert abs(sum(row) - 1.0) < 1e-5
        s2 = e.score(query=[3, 11], items=[[7]],
                     label_token_ids=[5, 9], item_first=True)
        s3 = e.score(query=[3, 11], items=[[7]],
                     label_token_ids=[5, 9], item_first=False)
        # item_first changes the prompt ordering -> different distribution
        assert s2 != s3

    def test_score_validation(self):
        import pytest as _pytest

        e = tiny_engine()
        with _pytest.raises(ValueError):
            e.score(query=[1], items=[[2]], label_token_ids=[10**6])
        with _pytest.raises(ValueError):
            e.score(query=[1], items=[[2]], label_token_ids=None)
        with _pytest.raises(ValueError):
            e.score(query=None, items=[[2]], label_token_ids=[1])
