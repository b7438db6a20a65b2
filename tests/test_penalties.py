"""Penalty + min-new-tokens sampling tests (penaltylib analog)."""

import numpy as np
import pytest

from tests.utils import tiny_engine

PROMPT = [3, 11, 42, 7, 19, 88, 5]


class TestPenalties:
    def test_presence_penalty_blocks_repeats(self):
        e = tiny_engine()
        sp = {"max_new_tokens": 12, "temperature": 0.0,
              "presence_penalty": 15.0}
        out = e.generate(input_ids=PROMPT, sampling_params=sp)["output_ids"]
        assert len(out) == 12
        # a huge presence penalty makes every output token unique
        assert len(set(out)) == len(out)

    def test_frequency_penalty_changes_output(self):
        e = tiny_engine()
        sp0 = {"max_new_tokens": 10, "temperature": 0.0}
        base = e.generate(input_ids=PROMPT, sampling_params=sp0)["output_ids"]
        if len(set(base)) == len(base):
            pytest.skip("dummy model produced no repeats to penalize")
        out = e.generate(
            input_ids=PROMPT,
            sampling_params={**sp0, "frequency_penalty": 8.0},
        )["output_ids"]
        assert out != base

    def test_repetition_penalty_runs(self):
        e = tiny_engine()
        out = e.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "repetition_penalty": 1.3},
        )["output_ids"]
        assert len(out) == 6

    def test_no_penalty_unaffected(self):
        """Requests without penalties produce identical results whether or
        not the penalty code path is compiled in the batch."""
        e = tiny_engine()
        sp = {"max_new_tokens": 6, "temperature": 0.0}
        base = e.generate(input_ids=PROMPT, sampling_params=sp)["output_ids"]
        outs = e.generate(
            input_ids=[PROMPT, list(range(10))],
            sampling_params=[sp, {**sp, "presence_penalty": 5.0}],
        )
        assert outs[0]["output_ids"] == base

    def test_min_new_tokens_defers_stop(self):
        e = tiny_engine()
        sp = {"max_new_tokens": 16, "temperature": 0.0}
        base = e.generate(input_ids=PROMPT, sampling_params=sp)["output_ids"]
        stop_tok = base[1]
        # without min_new: stops after 2 tokens
        out = e.generate(
            input_ids=PROMPT,
            sampling_params={**sp, "stop_token_ids": [stop_tok]},
        )["output_ids"]
        assert len(out) == 2
        # with min_new_tokens=6: the stop token is masked until 6 tokens
        out2 = e.generate(
            input_ids=PROMPT,
            sampling_params={**sp, "stop_token_ids": [stop_tok],
                             "min_new_tokens": 6},
        )["output_ids"]
        assert len(out2) >= 6
        assert stop_tok not in out2[:5]

    def test_penalties_with_multi_step(self):
        """decode_steps_per_launch must fall back to 1 when penalties are
        active and still produce correct unique-token output."""
        e = tiny_engine(decode_steps_per_launch=4)
        out = e.generate(
            input_ids=PROMPT,
            sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                             "presence_penalty": 15.0},
        )["output_ids"]
        assert len(set(out)) == len(out)
