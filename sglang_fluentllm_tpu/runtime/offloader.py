"""Host-RAM weight offload.

Analog of the reference's ``srt/offloader.py`` (v1 per-module CPU
offload, v2 grouped with prefetch, selected by ``--cpu-offload-gb``):
the TPU-native mechanism is XLA memory spaces — parameters placed with
``memory_kind="pinned_host"`` live in host RAM and XLA streams them to
HBM when the jitted program consumes them, overlapping the DMA with
compute the same way the reference's v2 prefetcher overlaps its H2D
copies. No Python-level prefetch machinery is needed; picking WHAT to
offload is the policy here.

Policy (mirrors the reference's greedy module walk, ``offloader.py``):
offload the largest leaves first — embeddings, lm_head, expert banks —
until the requested byte budget is met, never touching small/hot leaves
(norms, biases, correction tables) that would serialize every layer.
"""

from __future__ import annotations

import logging
from typing import Any, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

# leaves smaller than this never offload (transfer latency would gate
# the step for negligible HBM savings)
_MIN_OFFLOAD_BYTES = 16 << 20


def _leaf_bytes(x) -> int:
    return int(np.prod(x.shape)) * x.dtype.itemsize


def offload_params(
    params: Any,
    shardings: Any,
    budget_gb: float,
) -> Tuple[Any, int, Any]:
    """Re-place the largest parameter leaves into pinned host memory
    until ~``budget_gb`` GiB of HBM is freed.

    ``shardings`` is the matching pytree of the params' current
    (device) shardings; offloaded leaves keep their sharding layout but
    move memory kind, so multi-chip layouts survive. Returns
    (new_params, bytes_offloaded, mask) where ``mask`` is a pytree of
    bools marking host-resident leaves — feed it to ``onramp_params``
    inside every jit that consumes the params.
    """
    budget = int(budget_gb * (1 << 30))
    leaves, treedef = jax.tree.flatten(params)
    mask = [False] * len(leaves)
    if budget <= 0:
        return params, 0, None
    shard_leaves = jax.tree.flatten(shardings)[0]
    order = sorted(
        range(len(leaves)), key=lambda i: _leaf_bytes(leaves[i]),
        reverse=True,
    )
    moved = 0
    out = list(leaves)
    for i in order:
        if moved >= budget:
            break
        nbytes = _leaf_bytes(leaves[i])
        if nbytes < _MIN_OFFLOAD_BYTES:
            break
        sh = shard_leaves[i] if i < len(shard_leaves) else None
        if sh is None:
            sh = leaves[i].sharding
        try:
            host_sh = sh.with_memory_kind("pinned_host")
            out[i] = jax.device_put(leaves[i], host_sh)
            mask[i] = True
            moved += nbytes
        except Exception as exc:  # noqa: BLE001
            logger.warning("offload skipped a leaf (%s)", exc)
    if moved:
        logger.info(
            "cpu offload: %.2f GiB of weights now host-resident "
            "(budget %.2f GiB)", moved / (1 << 30), budget_gb,
        )
    return (jax.tree.unflatten(treedef, out), moved,
            jax.tree.unflatten(treedef, mask) if moved else None)


def onramp_params(params: Any, mask: Any) -> Any:
    """Inside jit: transfer host-resident leaves to device memory.
    XLA's latency-hiding scheduler starts these DMAs early and overlaps
    them with compute — the v2-prefetch analog. Unused leaves' copies
    are dead-code-eliminated per program."""
    if mask is None:
        return params
    return jax.tree.map(
        lambda x, m: (jax.device_put(x, jax.memory.Space.Device)
                      if m else x),
        params, mask,
    )
