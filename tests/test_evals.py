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


class TestFP8CompareGate:
    def test_compare_gate_mechanics_dummy_weights(self, capsys):
        """--compare fp8,bf16 runs both in-process engines and emits the
        gate verdict (dummy weights: scores are noise, so the gate is
        opened to 1.0 — this asserts the MECHANICS, the real gate runs
        with SFT_EVAL_MODEL_PATH below)."""
        from tests.server_utils import write_tiny_tokenizer
        from tests.utils import TINY_LLAMA_CFG, write_model_dir

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
        from sglang_fluentllm_tpu.evals.run_eval import main

        scores = main([
            "--eval-name", "mmlu",
            "--data-path", os.path.join(DATA, "mmlu_sample.csv"),
            "--num-examples", "2", "--max-tokens", "8",
            "--compare", "fp8,bf16",
            "--model-path", model_dir,
            "--load-format", "dummy",
            "--gate", "1.0",
        ])
        assert set(scores) == {"fp8", "bf16"}
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pass"] is True
        assert "delta" in out and "compare" in out

    @pytest.mark.skipif(
        not os.environ.get("SFT_EVAL_MODEL_PATH"),
        reason="real-weights FP8 accuracy gate: set SFT_EVAL_MODEL_PATH "
               "to an MLA checkpoint (BASELINE.md +-0.3 gate)",
    )
    def test_fp8_accuracy_gate_real_weights(self):
        """The BASELINE.md accuracy gate, runnable the day checkpoints
        are available: GSM8K fp8-KV vs bf16-KV within 0.3 points."""
        from sglang_fluentllm_tpu.evals.run_eval import main

        main([
            "--eval-name", "gsm8k",
            "--data-path", os.environ.get(
                "SFT_EVAL_DATA_PATH",
                os.path.join(DATA, "gsm8k_sample.jsonl")),
            "--num-examples", os.environ.get("SFT_EVAL_N", "200"),
            "--compare", "fp8,bf16",
            "--model-path", os.environ["SFT_EVAL_MODEL_PATH"],
            "--gate", "0.003",
        ])  # exits 1 (test fails) when the gate is violated
