"""Slow-host detection at startup.

Analog of the reference's ``srt/utils/slow_rank_detector.py`` (GEMM +
elementwise micro-bench all-gathered across ranks, flagging GPUs whose
time exceeds the fleet median): on TPU pods the unit of failure is a
host/chip pair, so each PROCESS times a small jitted matmul+elementwise
program on its local device, the timings are all-gathered over the
jax.distributed control plane, and outliers are logged loudly. Pure
diagnostics — never fails startup.
"""

from __future__ import annotations

import logging
import time
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_GEMM_N = 1024
_REPS = 8
_SLOW_FACTOR = 1.5


def _local_bench() -> float:
    """Seconds for a fixed matmul+elementwise chain on this process's
    first local device (in-jit repetition: one dispatch, real work)."""
    dev = jax.local_devices()[0]
    x = jax.device_put(
        jnp.ones((_GEMM_N, _GEMM_N), jnp.bfloat16), dev)

    @jax.jit
    def chain(x):
        def body(c, _):
            c = c @ c
            c = jax.nn.gelu(c) * 0.5
            # renormalize so values stay finite across reps
            return c / jnp.maximum(
                jnp.max(jnp.abs(c)), jnp.bfloat16(1.0)), None
        out, _ = jax.lax.scan(body, x, None, length=_REPS)
        return jnp.sum(out)

    chain(x).block_until_ready()          # compile + warm
    t0 = time.monotonic()
    v = chain(x)
    _ = jax.device_get(v)                 # data dependency
    return time.monotonic() - t0


def execute() -> List[float]:
    """Run the micro-bench, gather per-process timings, warn on
    stragglers. Returns the gathered timings (index = process)."""
    t = _local_bench()
    n = jax.process_count()
    if n <= 1:
        logger.info("slow-host check: single process, %.2f ms", t * 1e3)
        return [t]
    try:
        from jax.experimental import multihost_utils

        times = np.asarray(
            multihost_utils.process_allgather(np.float32(t))
        ).reshape(-1)
    except Exception as exc:  # noqa: BLE001
        logger.warning("slow-host gather failed (%s); local %.2f ms",
                       exc, t * 1e3)
        return [t]
    med = float(np.median(times))
    for rank, ti in enumerate(times):
        if ti > med * _SLOW_FACTOR:
            logger.warning(
                "SLOW HOST: process %d took %.2f ms (median %.2f ms, "
                "%.1fx) — check its chips/links before serving",
                rank, ti * 1e3, med * 1e3, ti / max(med, 1e-9),
            )
    logger.info("slow-host check: %d processes, median %.2f ms",
                n, med * 1e3)
    return [float(x) for x in times]
