"""Multi-host bring-up test: TWO real OS processes joined via
jax.distributed over a gRPC coordinator, a (dp=2, tp=2) mesh spanning
both processes' CPU devices, and the rank-0 -> follower step-broadcast
plane replaying generation SPMD (parallel/multihost.py; reference
multi-node launch, engine.py:705-832).

Rank 0 runs the offline Engine (scheduler + broadcaster); rank 1 runs
run_follower. The generated ids must equal a single-process (tp=1)
baseline — TP/DP sharding equivalence is exact in f32.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from tests.utils import TINY_LLAMA_CFG, write_model_dir

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROMPT = [3, 11, 42, 7, 19, 88]

RANK_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, os.environ["SFT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(os.environ["SFT_RANK"])
coord = os.environ["SFT_COORD"]
model_dir = os.environ["SFT_MODEL_DIR"]

from sglang_fluentllm_tpu.config.server_args import ServerArgs
from sglang_fluentllm_tpu.parallel.multihost import (
    maybe_init_distributed, run_follower,
)

sa = ServerArgs(
    model_path=model_dir, load_format="dummy", skip_tokenizer_init=True,
    dtype="float32", max_total_tokens=1024, page_size=4, random_seed=7,
    disable_jit_warmup=True, tp_size=2, dp_size=1,
    nnodes=2, node_rank=rank, dist_init_addr=coord,
    port=int(os.environ["SFT_PORT"]),
)
maybe_init_distributed(sa)
# one CPU device per process -> the (1, 2) tp mesh SPANS both processes
assert jax.device_count() == 2, jax.device_count()
assert jax.local_device_count() == 1

if rank == 0:
    from sglang_fluentllm_tpu.engine import Engine

    eng = Engine(sa)
    out = eng.generate(
        input_ids=json.loads(os.environ["SFT_PROMPT"]),
        sampling_params={"max_new_tokens": 6, "temperature": 0.0},
    )
    print("RANK0_IDS " + json.dumps(out["output_ids"]), flush=True)
    eng.runner.broadcaster.close()
else:
    run_follower(sa)
    print("FOLLOWER_DONE", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_spmd_generation():
    model_dir = write_model_dir(TINY_LLAMA_CFG)
    coord = f"127.0.0.1:{_free_port()}"
    follower_base = _free_port()

    env_base = dict(os.environ)
    env_base.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "SFT_REPO": REPO_ROOT,
        "SFT_COORD": coord,
        "SFT_MODEL_DIR": model_dir,
        "SFT_PROMPT": json.dumps(PROMPT),
        "SFT_PORT": str(follower_base),
    })
    procs = []
    for rank in (0, 1):
        env = dict(env_base)
        env["SFT_RANK"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", RANK_SCRIPT],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO_ROOT,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    assert "FOLLOWER_DONE" in outs[1]
    ids_line = [ln for ln in outs[0].splitlines()
                if ln.startswith("RANK0_IDS ")]
    assert ids_line, outs[0]
    multi_ids = json.loads(ids_line[0][len("RANK0_IDS "):])

    # single-process baseline (same seed, tp=1): must match exactly
    from tests.utils import tiny_engine

    eng = tiny_engine(model_path_override=model_dir)
    base = eng.generate(
        input_ids=PROMPT,
        sampling_params={"max_new_tokens": 6, "temperature": 0.0},
    )
    assert multi_ids == base["output_ids"], (multi_ids, base["output_ids"])
