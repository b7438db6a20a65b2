"""Server test harness.

Analog of the reference's ``sglang.test.test_utils.popen_launch_server``
(SURVEY §4 — the helper its E2E tier is built on): launch a REAL server
subprocess on CPU jax with a tiny model + local word-level tokenizer, wait
for /health, tear down on exit.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from typing import List, Optional

import httpx

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def write_tiny_tokenizer(model_dir: str, vocab_size: int = 128):
    """Word-level tokenizer: token "<i>" -> id i; <eos>=vocab_size-1."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {f"<{i}>": i for i in range(vocab_size - 2)}
    vocab["<unk>"] = vocab_size - 2
    vocab["<eos>"] = vocab_size - 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok.save(os.path.join(model_dir, "tokenizer.json"))
    with open(os.path.join(model_dir, "tokenizer_config.json"), "w") as fp:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "unk_token": "<unk>",
            "eos_token": "<eos>",
            "model_max_length": 4096,
            "chat_template": (
                "{% for message in messages %}"
                "{{ message['content'] }} "
                "{% endfor %}"
            ),
        }, fp)


def popen_launch_server(
    model_dir: str,
    port: Optional[int] = None,
    other_args: Optional[List[str]] = None,
    timeout: float = 560.0,
) -> tuple:
    port = port or find_free_port()
    base_url = f"http://127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sft_jax_test_cache")
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m", "sglang_fluentllm_tpu.launch_server",
        "--model-path", model_dir,
        "--port", str(port),
        "--load-format", "dummy",
        "--dtype", "float32",
        "--max-total-tokens", "4096",
        "--page-size", "4",
        "--random-seed", "7",
    ] + (other_args or [])
    proc = subprocess.Popen(
        cmd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    deadline = time.time() + timeout
    last_exc = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode(errors="replace")
            raise RuntimeError(f"server died at startup:\n{out[-4000:]}")
        try:
            r = httpx.get(base_url + "/health", timeout=5)
            if r.status_code == 200:
                return proc, base_url
        except Exception as e:  # noqa: BLE001
            last_exc = e
        time.sleep(0.5)
    proc.kill()
    raise TimeoutError(f"server did not become healthy: {last_exc}")


def kill_server(proc: subprocess.Popen):
    proc.terminate()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=10)
