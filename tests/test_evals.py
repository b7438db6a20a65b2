"""Accuracy-eval harness: scoring units + a dummy-weight server smoke.

Mirrors the reference's simple_eval_* + run_eval pattern (SURVEY §4 tier 2).
With dummy weights the SCORE is meaningless; the smoke test asserts the
pipeline (prompt build -> HTTP -> extraction -> scoring) runs end-to-end.
"""

import json
import os

import pytest

from sglang_fluentllm_tpu.evals.simple_eval_gsm8k import GSM8KEval
from sglang_fluentllm_tpu.evals.simple_eval_mmlu import MMLUEval

DATA = os.path.join(
    os.path.dirname(__file__), "..",
    "sglang_fluentllm_tpu", "evals", "sample_data",
)


class TestScoring:
    def test_mmlu_loads_and_scores(self):
        ev = MMLUEval(os.path.join(DATA, "mmlu_sample.csv"))
        assert len(ev.examples()) == 4
        ex = ev.examples()[0]
        assert ev.score_one(ex, "thinking...\nAnswer: B") == 1.0
        assert ev.score_one(ex, "Answer: (B)") == 1.0
        assert ev.score_one(ex, "the answer is b") == 1.0
        assert ev.score_one(ex, "Answer: C") == 0.0
        assert ev.score_one(ex, "no idea") == 0.0
        prompt = ev.build_prompt(ex)
        assert "A) 3" in prompt and "Answer: $LETTER" in prompt

    def test_gsm8k_loads_and_scores(self):
        ev = GSM8KEval(os.path.join(DATA, "gsm8k_sample.jsonl"))
        assert len(ev.examples()) == 3
        ex = ev.examples()[0]
        assert ex["target"] == "7"
        assert ev.score_one(ex, "3 + 4 = 7\nAnswer: 7") == 1.0
        assert ev.score_one(ex, "the total is 7.") == 1.0
        assert ev.score_one(ex, "Answer: 8") == 0.0
        assert ev.score_one(ex, "") == 0.0

    def test_gsm8k_few_shot(self):
        ev = GSM8KEval(os.path.join(DATA, "gsm8k_sample.jsonl"),
                       few_shot=1)
        assert len(ev.examples()) == 2
        p = ev.build_prompt(ev.examples()[0])
        assert p.count("Question:") == 2  # 1 shot + the target

    def test_local_offline_eval_run(self):
        """Eval.run with a canned sampler (no server)."""
        ev = MMLUEval(os.path.join(DATA, "mmlu_sample.csv"))
        answers = {"2 + 2": "Answer: B", "planet": "Answer: C",
                   "mixing": "Answer: A", "hexagon": "Answer: D"}

        def sampler(prompt):
            for k, v in answers.items():
                if k in prompt:
                    return v
            return ""

        res = ev.run(sampler, num_threads=2)
        assert res.n == 4 and abs(res.score - 0.75) < 1e-9


class TestEvalServerSmoke:
    def test_run_eval_against_dummy_server(self):
        from tests.server_utils import (
            kill_server,
            popen_launch_server,
            write_tiny_tokenizer,
        )
        from tests.utils import TINY_LLAMA_CFG, write_model_dir

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        proc, base_url = popen_launch_server(model_dir)
        try:
            from sglang_fluentllm_tpu.evals.run_eval import main

            res = main([
                "--base-url", base_url, "--eval-name", "mmlu",
                "--data-path", os.path.join(DATA, "mmlu_sample.csv"),
                "--num-examples", "2", "--max-tokens", "8",
                "--num-threads", "2", "--no-chat",
            ])
            assert res.n == 2 and 0.0 <= res.score <= 1.0
        finally:
            kill_server(proc)
