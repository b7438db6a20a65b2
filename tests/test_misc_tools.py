"""bench_one_batch / check_env / kv_events coverage."""

import json
import subprocess
import sys

import numpy as np

from tests.server_utils import REPO_ROOT
from tests.utils import TINY_LLAMA_CFG, tiny_engine, write_model_dir


class TestKVEvents:
    def test_events_emitted(self):
        e = tiny_engine(enable_kv_events=True, max_total_tokens=256)
        sp = {"max_new_tokens": 4, "temperature": 0.0}
        e.generate(input_ids=[3, 11, 42, 7, 19, 88, 5, 23],
                   sampling_params=sp)
        ev = e.scheduler.kv_events.recent()
        kinds = {x["kind"] for x in ev}
        assert "block_stored" in kinds
        # force eviction
        for i in range(12):
            p = [int(x) for x in
                 np.random.RandomState(50 + i).randint(0, 128, 40)]
            e.generate(input_ids=p, sampling_params=sp)
        kinds = {x["kind"] for x in e.scheduler.kv_events.recent(1000)}
        assert "block_removed" in kinds


class TestNaNDetection:
    def test_clean_run_unaffected(self):
        e = tiny_engine(enable_nan_detection=True)
        out = e.generate(input_ids=[1, 2, 3],
                         sampling_params={"max_new_tokens": 4,
                                          "temperature": 0.0})
        assert len(out["output_ids"]) == 4


class TestCLIs:
    def test_check_env(self):
        import os

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get(
            "PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-m", "sglang_fluentllm_tpu.check_env"],
            env=env, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0
        info = json.loads(r.stdout)
        assert info["jax"] is not None

    def test_bench_one_batch(self):
        import os

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/sft_jax_test_cache")
        env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get(
            "PYTHONPATH", "")
        r = subprocess.run([
            sys.executable, "-m", "sglang_fluentllm_tpu.bench_one_batch",
            "--model-path", model_dir, "--load-format", "dummy",
            "--dtype", "float32", "--max-total-tokens", "4096",
            "--page-size", "4", "--batch-size", "2", "--input-len", "16",
            "--output-len", "8", "--correctness",
        ], env=env, capture_output=True, text=True, timeout=400)
        assert r.returncode == 0, r.stderr[-1500:]
        lines = [json.loads(x) for x in r.stdout.splitlines()
                 if x.startswith("{")]
        assert lines[0]["correct"] is True
        assert lines[1]["decode_tokens_per_sec"] > 0


class TestApiKey:
    def test_auth_enforced(self):
        import httpx

        from tests.server_utils import (
            kill_server,
            popen_launch_server,
            write_tiny_tokenizer,
        )

        model_dir = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(model_dir, 128)
        proc, url = popen_launch_server(
            model_dir, other_args=["--api-key", "secret-key"])
        try:
            assert httpx.get(url + "/health").status_code == 200
            r = httpx.post(url + "/generate", json={
                "input_ids": [1, 2, 3],
                "sampling_params": {"max_new_tokens": 2}})
            assert r.status_code == 401
            r = httpx.post(url + "/generate", json={
                "input_ids": [1, 2, 3],
                "sampling_params": {"max_new_tokens": 2,
                                    "temperature": 0.0}},
                headers={"Authorization": "Bearer secret-key"},
                timeout=300)
            assert r.status_code == 200
            assert len(r.json()["output_ids"]) == 2
            # wrong key
            r = httpx.get(url + "/get_server_info",
                          headers={"Authorization": "Bearer nope"})
            assert r.status_code == 401
        finally:
            kill_server(proc)
