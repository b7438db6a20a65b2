"""Host-side decode overhead attribution (round 5, VERDICT #2).

profile_window measured 3.60 ms/step DEVICE time at the bench geometry
while bench.py sees 4.58 ms/step end-to-end: ~1 ms/step (~31 ms/window)
of host + dispatch cost that the depth-4 overlap pipeline evidently does
NOT hide. This tool runs the REAL bench engine decode flow with timing
wrappers around the scheduler's launch / resolve / dispatch stages and
prints where the host milliseconds go:

  dispatch   runner.forward_batch_generation (pack + jnp.asarray + jit
             call through the axon tunnel)
  build      _launch_next minus the dispatch inside it
  resolve    _resolve (device_get + per-token python bookkeeping)
  other      wall - device - accounted host

Usage: python tools/profile_host_breakdown.py   (real chip)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)


def main():
    engine = bench.build_engine()
    sched = engine.scheduler
    runner = engine.runner
    rng = np.random.RandomState(0)
    vocab = bench.QWEN25_05B["vocab_size"]

    def prompts(seed):
        r = np.random.RandomState(seed)
        return [
            [int(x) for x in r.randint(0, vocab, bench.PREFILL_LEN)]
            for _ in range(bench.BATCH_SIZE)
        ]

    acc = {"dispatch": 0.0, "launch": 0.0, "resolve": 0.0,
           "n_dispatch": 0, "n_resolve": 0, "step_wall": 0.0,
           "n_step": 0, "devget": 0.0, "n_devget": 0}

    # split the device_get (blocking fetch) out of resolve: wrap jax's
    # device_get while a resolve is on the stack
    import jax as _jax

    in_resolve = {"v": False}
    orig_devget = _jax.device_get

    def devget(x):
        if not in_resolve["v"]:
            return orig_devget(x)
        t0 = time.perf_counter()
        out = orig_devget(x)
        acc["devget"] += time.perf_counter() - t0
        acc["n_devget"] += 1
        return out

    _jax.device_get = devget

    orig_fwd = runner.forward_batch_generation
    orig_launch = sched._launch_next
    orig_resolve = sched._resolve
    orig_step = sched.step

    # count + time is_ready polls (the sync generate loop spins on
    # step() -> head.ids_dev.is_ready(); if each poll is a tunnel RPC
    # the spin itself serializes the transport)
    acc["isready"] = 0.0
    acc["n_isready"] = 0
    import sglang_fluentllm_tpu.sched.scheduler as _sched_mod

    class _Probe:
        pass

    orig_step_inner = sched._step_inner

    def step_inner():
        # monkeypatch is awkward on array methods; sample by wrapping
        # the pending heads' is_ready through a timing shim
        pending = sched.pending
        if pending:
            head = pending[0]
            ids = head.ids_dev
            real = type(ids).is_ready

            t0 = time.perf_counter()
            try:
                real(ids)
            finally:
                acc["isready"] += time.perf_counter() - t0
                acc["n_isready"] += 1
        return orig_step_inner()

    sched._step_inner = step_inner

    def fwd(*a, **kw):
        t0 = time.perf_counter()
        out = orig_fwd(*a, **kw)
        acc["dispatch"] += time.perf_counter() - t0
        acc["n_dispatch"] += 1
        return out

    def launch():
        t0 = time.perf_counter()
        out = orig_launch()
        acc["launch"] += time.perf_counter() - t0
        return out

    def resolve(b):
        t0 = time.perf_counter()
        in_resolve["v"] = True
        try:
            out = orig_resolve(b)
        finally:
            in_resolve["v"] = False
        acc["resolve"] += time.perf_counter() - t0
        acc["n_resolve"] += 1
        return out

    def step():
        t0 = time.perf_counter()
        out = orig_step()
        acc["step_wall"] += time.perf_counter() - t0
        acc["n_step"] += 1
        return out

    runner.forward_batch_generation = fwd
    sched._launch_next = launch
    sched._resolve = resolve
    sched.step = step

    sp = {"max_new_tokens": bench.SHORT_NEW, "temperature": 0.0,
          "ignore_eos": True}
    # warmup/compile
    engine.generate(input_ids=prompts(99), sampling_params=sp)
    engine.flush_cache()
    engine.generate(
        input_ids=prompts(98),
        sampling_params=dict(sp, max_new_tokens=bench.LONG_NEW))
    engine.flush_cache()

    for k in acc:
        acc[k] = 0.0 if isinstance(acc[k], float) else 0

    t0 = time.perf_counter()
    engine.generate(
        input_ids=prompts(1),
        sampling_params=dict(sp, max_new_tokens=bench.LONG_NEW))
    wall = time.perf_counter() - t0

    n_tokens = bench.BATCH_SIZE * bench.LONG_NEW
    build = acc["launch"] - acc["dispatch"]
    print(json.dumps({
        "metric": "host_breakdown",
        "wall_s": round(wall, 3),
        "tok_s": round(n_tokens / wall, 0),
        "dispatch_ms_total": round(acc["dispatch"] * 1e3, 1),
        "build_ms_total": round(build * 1e3, 1),
        "resolve_ms_total": round(acc["resolve"] * 1e3, 1),
        "step_wall_ms_total": round(acc["step_wall"] * 1e3, 1),
        "n_dispatch": acc["n_dispatch"],
        "n_resolve": acc["n_resolve"],
        "per_window_ms": {
            "dispatch": round(acc["dispatch"] / max(acc["n_dispatch"], 1)
                              * 1e3, 2),
            "resolve": round(acc["resolve"] / max(acc["n_resolve"], 1)
                             * 1e3, 2),
            "resolve_devget": round(
                acc["devget"] / max(acc["n_resolve"], 1) * 1e3, 2),
            "resolve_python": round(
                (acc["resolve"] - acc["devget"])
                / max(acc["n_resolve"], 1) * 1e3, 2),
        },
        "n_devget": acc["n_devget"],
        "isready_ms_total": round(acc["isready"] * 1e3, 1),
        "n_isready": acc["n_isready"],
        "outside_step_ms": round(
            (wall - acc["step_wall"]) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
