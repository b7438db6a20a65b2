"""Host-side dispatch cost attribution for one decode launch.

Measures wall time of the ENQUEUE path (no result sync): pack_batch,
the two host->device transfers, and the jit call through the axon
tunnel — the per-launch overhead D that the fused k-step window
amortizes. Run on the real chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.profile_decode import B, build_runner, make_decode_batch  # noqa: E402

N = 40


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sglang_fluentllm_tpu.ops.sampler import SamplingMetadata
    from sglang_fluentllm_tpu.runtime.packing import pack_batch

    runner = build_runner()
    print(f"platform={jax.devices()[0].platform}", flush=True)
    batch = make_decode_batch(runner)
    sampling = SamplingMetadata.from_lists(
        [0.0] * B, [1.0] * B, [-1] * B, [0.0] * B, batch.batch_size
    )
    sampling = dataclasses.replace(sampling, all_greedy=True)

    # warm up / compile
    ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
    jax.device_get(ids)

    # 1) pure host pack cost
    t0 = time.perf_counter()
    for _ in range(N):
        ints, floats, meta = pack_batch(batch, sampling)
        ints = np.concatenate([ints, [0, 1]]).astype(np.int32)
    t_pack = (time.perf_counter() - t0) / N
    print(f"pack_batch host:        {1000*t_pack:7.3f} ms", flush=True)

    # 2) transfers only
    t0 = time.perf_counter()
    for _ in range(N):
        a = jnp.asarray(ints)
        b = jnp.asarray(floats)
    jax.block_until_ready((a, b))
    t_xfer = (time.perf_counter() - t0) / N
    print(f"2x jnp.asarray:         {1000*t_xfer:7.3f} ms", flush=True)

    # 3) full enqueue (no sync)
    t0 = time.perf_counter()
    for _ in range(N):
        ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
    t_enq = (time.perf_counter() - t0) / N
    print(f"enqueue (no sync):      {1000*t_enq:7.3f} ms", flush=True)

    # 4) enqueue + sync every launch
    t0 = time.perf_counter()
    for _ in range(N):
        ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
        jax.device_get(ids)
    t_sync = (time.perf_counter() - t0) / N
    print(f"enqueue + device_get:   {1000*t_sync:7.3f} ms", flush=True)

    # 5) enqueue with pipeline depth 4 then sync (overlap pattern)
    t0 = time.perf_counter()
    pend = []
    for i in range(N):
        ids, lp, _ = runner.forward_batch_generation(batch, sampling, 0)
        pend.append(ids)
        if len(pend) > 4:
            jax.device_get(pend.pop(0))
    for x in pend:
        jax.device_get(x)
    t_pipe = (time.perf_counter() - t0) / N
    print(f"pipelined (depth 4):    {1000*t_pipe:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
