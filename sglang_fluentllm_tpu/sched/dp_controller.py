"""Data-parallel controller: request-level DP over scheduler replicas.

Analog of the reference's ``managers/data_parallel_controller.py``
(``DataParallelController:104``, ``LoadBalanceMethod:43``,
``launch_dp_schedulers:178``): with ``--dp-size N`` the engine runs N
independent (scheduler, runner) replicas, each owning a tp-sized slice of
the device set, and routes incoming requests across them.

TPU translation of the process topology: the reference spawns one scheduler
OS process per GPU rank with a router subprocess in between; here jax owns
all local chips in ONE process, so replicas are in-process objects on
disjoint sub-meshes and the router is a method call. The controller exposes
the same surface as a single Scheduler so the Engine/AsyncEngine drive it
unchanged.

Routing policies (reference ``LoadBalanceMethod``):
- ``round_robin``
- ``shortest_queue``: fewest queued+running requests (reference ``DPBudget``
  watermark routing reduces to this without memory-pressure feedback).
"""

from __future__ import annotations

import itertools
import logging
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_fluentllm_tpu.config import ServerArgs

logger = logging.getLogger(__name__)


class DataParallelController:
    def __init__(self, server_args: ServerArgs, model_config=None):
        import jax
        from jax.sharding import Mesh

        from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner
        from sglang_fluentllm_tpu.sched.scheduler import Scheduler

        self.server_args = server_args
        dp, tp = server_args.dp_size, server_args.tp_size
        devices = jax.devices()
        assert dp * tp <= len(devices), (
            f"dp={dp} x tp={tp} needs {dp * tp} devices, "
            f"have {len(devices)}"
        )
        self.runners: List[ModelRunner] = []
        self.schedulers: List[Scheduler] = []
        for g in range(dp):
            sub = np.asarray(devices[g * tp : (g + 1) * tp]).reshape(1, tp)
            mesh = Mesh(sub, ("dp", "tp"))
            runner = ModelRunner(server_args, model_config, mesh=mesh)
            self.runners.append(runner)
            self.schedulers.append(Scheduler(server_args, runner))
        self.runner = self.runners[0]  # info/compat surface
        self._rr = itertools.count()
        self.method = getattr(
            server_args, "load_balance_method", "shortest_queue"
        )
        self._rid_group: Dict[str, int] = {}
        logger.info(
            "DataParallelController: %d groups x tp=%d (%s routing)",
            dp, tp, self.method,
        )

    # ---- routing ------------------------------------------------------
    def _pick_group(self) -> int:
        if self.method == "round_robin":
            return next(self._rr) % len(self.schedulers)
        loads = [
            len(s.waiting_queue) + len(s.running_batch)
            for s in self.schedulers
        ]
        return int(np.argmin(loads))

    # ---- Scheduler-compatible surface ---------------------------------
    def add_request(self, req):
        g = self._pick_group()
        self._rid_group[req.rid] = g
        self.schedulers[g].add_request(req)

    def step(self):
        outputs = []
        for s in self.schedulers:
            outputs.extend(s.step())
        for out in outputs:
            if out.finished:
                self._rid_group.pop(out.rid, None)
        return outputs

    def has_work(self) -> bool:
        return any(s.has_work() for s in self.schedulers)

    def abort_request(self, rid: str) -> bool:
        g = self._rid_group.get(rid)
        if g is not None:
            return self.schedulers[g].abort_request(rid)
        return any(s.abort_request(rid) for s in self.schedulers)

    def finish_request(self, req, abort: bool = False):
        g = self._rid_group.get(req.rid)
        scheds = (
            [self.schedulers[g]] if g is not None else self.schedulers
        )
        for s in scheds:
            s.finish_request(req, abort=abort)

    def flush_cache(self) -> bool:
        return all(s.flush_cache() for s in self.schedulers)

    # ---- forwarded attributes (stats, caches) -------------------------
    @property
    def tree_cache(self):
        return self.schedulers[0].tree_cache

    @property
    def sessions(self):
        return self.schedulers[0].sessions

    @property
    def waiting_queue(self):
        return [r for s in self.schedulers for r in s.waiting_queue]

    @property
    def running_batch(self):
        return [r for s in self.schedulers for r in s.running_batch]

    @property
    def num_generated_tokens(self) -> int:
        return sum(s.num_generated_tokens for s in self.schedulers)

    @property
    def num_retracted(self) -> int:
        return sum(s.num_retracted for s in self.schedulers)

    @property
    def cum_cached_tokens(self) -> int:
        return sum(s.cum_cached_tokens for s in self.schedulers)

    def __getattr__(self, name: str) -> Any:
        # anything else (pause flags, hicache, kv_events...) proxies to
        # group 0 — single-group semantics for admin surfaces
        return getattr(self.schedulers[0], name)
