"""Fused-window device-time probe (round 4).

Times ONE thing: the production multi-step decode program
(`runner.forward_batch_generation`, k fused steps per dispatch) at the
bench geometry, dispatched back-to-back with a single device_get at the
end — device time per step with no scheduler/host in the loop. Compare
against bench.py's end-to-end decode_step_ms: the difference is host +
dispatch overhead per step.

Env:
  PW_K       window size (default 32, = bench default)
  PW_CTX     tokens already in cache per row (default 224 ~ bench avg)
  PW_VARIANT comma list: prod, nolp (prod covers the bench path)

Usage: python tools/profile_window.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.profile_decode as pd  # noqa: E402

pd.K_STEPS = int(os.environ.get("PW_K", "32"))
pd.CTX = int(os.environ.get("PW_CTX", "224"))
REPEAT = int(os.environ.get("PW_REPEAT", "8"))


def main():
    import jax

    from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata

    t0 = time.time()
    runner = pd.build_runner()
    print(f"build_runner {time.time()-t0:.1f}s  platform="
          f"{jax.devices()[0].platform}  k={pd.K_STEPS} ctx={pd.CTX}",
          flush=True)
    batch = pd.make_decode_batch(runner)
    sampling = SamplingMetadata.from_lists(
        [0.0] * pd.B, [1.0] * pd.B, [-1] * pd.B, [0.0] * pd.B,
        batch.batch_size,
    )
    sampling = dataclasses.replace(sampling, all_greedy=True)

    # compile
    t0 = time.time()
    ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
    jax.block_until_ready((ids, lp))
    print(f"compile+first {time.time()-t0:.1f}s", flush=True)

    # back-to-back dispatches, one sync at the end: successive windows
    # chain on the donated kv_cache, so device execution is serial and
    # wall/REPEAT is true device window time (+ negligible queueing).
    # PW_FETCH=1 mimics the ENGINE's loop instead: device_get the ids of
    # window n-LAG while later windows are in flight — the delta vs the
    # no-fetch mode is the per-window fetch-serialization cost the
    # scheduler pays (round-5 decode-gap attribution).
    fetch_lag = int(os.environ.get("PW_FETCH_LAG", "3"))
    do_fetch = os.environ.get("PW_FETCH", "0") == "1"
    best = float("inf")
    for trial in range(3):
        pending = []
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            ids, lp, _ = runner.forward_batch_generation(
                batch, sampling, 0)
            if do_fetch:
                try:
                    ids.copy_to_host_async()
                except Exception:
                    pass
                pending.append(ids)
                if len(pending) > fetch_lag:
                    jax.device_get(pending.pop(0))
        if do_fetch:
            for x in pending:
                jax.device_get(x)
        jax.block_until_ready((ids, lp))
        dt = (time.perf_counter() - t0) / REPEAT
        best = min(best, dt)
        print(f"trial {trial}: window {1000*dt:8.2f} ms  "
              f"per-step {1000*dt/pd.K_STEPS:6.3f} ms  "
              f"({pd.B/(dt/pd.K_STEPS):8.0f} tok/s)", flush=True)
    print(f"BEST per-step {1000*best/pd.K_STEPS:6.3f} ms "
          f"({pd.B/(best/pd.K_STEPS):8.0f} tok/s)  fetch={do_fetch}",
          flush=True)


if __name__ == "__main__":
    main()
