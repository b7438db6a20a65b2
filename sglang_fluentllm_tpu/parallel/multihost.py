"""Multi-host bring-up: jax.distributed init, DCN-aware mesh, and the
rank-0 -> follower step-broadcast plane.

Reference topology (``srt/entrypoints/engine.py:705-832``,
``srt/managers/scheduler.py:933-981``): every node launches the same
server binary with ``--nnodes/--node-rank/--dist-init-addr``; rank 0
runs the frontend + scheduler and broadcasts each batch to the other
ranks (zmq/NCCL there). The TPU-native translation:

- ``jax.distributed.initialize`` joins all processes into one JAX
  runtime; ``jax.devices()`` then spans every host and a single
  ``Mesh`` covers the full slice. Under SPMD-jit, every process must
  issue the SAME jit calls with the SAME host inputs — so the control
  plane is exactly "rank 0 decides, everyone else replays".
- The step broadcast is a length-prefixed pickle stream over TCP (DCN
  control plane, the zmq analog). Device data never moves over it —
  only the tiny packed batch descriptors; tensor traffic rides ICI/DCN
  inside XLA collectives.
- Mesh layout: ``dp`` is the outer axis (crosses hosts -> DCN), ``tp``
  inner (within a host -> ICI), per the scaling-book recipe.
"""

from __future__ import annotations

import logging
import pickle
import socket
import struct
import threading
from typing import Any, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

_initialized = False


def maybe_init_distributed(server_args) -> None:
    """Join the multi-process JAX runtime (idempotent; no-op for
    single-host)."""
    global _initialized
    if server_args.nnodes <= 1 or _initialized:
        return
    assert server_args.dist_init_addr, (
        "--dist-init-addr required when --nnodes > 1"
    )
    jax.distributed.initialize(
        coordinator_address=server_args.dist_init_addr,
        num_processes=server_args.nnodes,
        process_id=server_args.node_rank,
    )
    _initialized = True
    logger.info(
        "jax.distributed up: process %d/%d, %d local / %d global devices",
        server_args.node_rank, server_args.nnodes,
        jax.local_device_count(), jax.device_count(),
    )


def build_mesh(dp_size: int, tp_size: int) -> Mesh:
    """(dp, tp) mesh over the GLOBAL device list, hosts kept contiguous
    so tp groups stay on one host's ICI whenever tp_size divides the
    per-host device count; dp then crosses hosts over DCN."""
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    n = dp_size * tp_size
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    return Mesh(
        np.asarray(devices[:n]).reshape(dp_size, tp_size), ("dp", "tp")
    )


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        k = sock.recv_into(view[got:], n - got)
        if k == 0:
            raise ConnectionError("peer closed")
        got += k
    return bytes(buf)


class StepBroadcaster:
    """Rank-0 side: accept follower connections, publish step descriptors
    (role of the reference's zmq broadcast from the entry scheduler)."""

    def __init__(self, port: int, expect: int):
        self._lock = threading.Lock()
        self._conns: List[socket.socket] = []
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("0.0.0.0", port))
        self._srv.listen(expect)
        self.port = self._srv.getsockname()[1]
        self._expect = expect

    def wait_for_followers(self, timeout: float = 300.0) -> None:
        self._srv.settimeout(timeout)
        while len(self._conns) < self._expect:
            conn, addr = self._srv.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._conns.append(conn)
            logger.info("follower %d/%d connected from %s",
                        len(self._conns), self._expect, addr)

    def publish(self, obj: Any) -> None:
        if len(self._conns) < self._expect:
            self.wait_for_followers()
        blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        frame = struct.pack("<I", len(blob)) + blob
        with self._lock:
            for conn in self._conns:
                conn.sendall(frame)

    def close(self) -> None:
        try:
            self.publish(("stop",))
        except Exception:  # noqa: BLE001
            pass
        for c in self._conns:
            c.close()
        self._srv.close()


class StepReceiver:
    """Follower side: blocking stream of step descriptors."""

    def __init__(self, address: str, port: int, timeout: float = 300.0):
        self._sock = socket.create_connection(
            (address, port), timeout=timeout
        )
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock.settimeout(None)

    def recv(self) -> Any:
        (n,) = struct.unpack("<I", _recv_exact(self._sock, 4))
        return pickle.loads(_recv_exact(self._sock, n))

    def close(self) -> None:
        self._sock.close()


def follower_port(server_args) -> int:
    """Deterministic control-plane port derived from the serving port."""
    return server_args.port + 100


def run_follower(server_args, model_config=None,
                 receiver: Optional[StepReceiver] = None) -> None:
    """Follower main loop (ranks > 0): build the SAME runner over the
    SAME global mesh, then replay rank 0's step stream so every process
    issues identical SPMD jit calls (reference scheduler.py:933-981
    non-entry ranks consuming the broadcast)."""
    from sglang_fluentllm_tpu.runtime.model_runner import ModelRunner

    maybe_init_distributed(server_args)
    runner = ModelRunner(server_args, model_config)
    if receiver is None:
        host = server_args.dist_init_addr.rsplit(":", 1)[0]
        receiver = StepReceiver(host, follower_port(server_args))
    logger.info("follower %d ready", server_args.node_rank)
    while True:
        msg = receiver.recv()
        kind = msg[0]
        if kind == "stop":
            break
        if kind == "gen":
            _, batch, sampling, future_offset = msg
            runner.forward_batch_generation(batch, sampling, future_offset)
        elif kind == "encode":
            _, items = msg
            runner.encode_batch(items)
        elif kind == "score":
            _, items, label_ids = msg
            runner.score_batch(items, label_ids)
        elif kind == "classify":
            runner.classify_batch(msg[1])
        elif kind == "update_weights_from_disk":
            runner.update_weights_from_disk(msg[1])
        elif kind == "update_weights_from_tensor":
            _, named, flush = msg
            runner.update_weights_from_tensor(named, flush=flush)
        elif kind == "release_kv":
            runner.release_kv_cache()
        elif kind == "resume_kv":
            runner.resume_kv_cache()
        elif kind == "spec":
            _, batch, sampling, drafts, req_idx, offset = msg
            runner.spec_worker.forward_spec(
                batch, sampling, drafts=drafts, req_idx=req_idx,
                future_offset=offset,
            )
        elif kind == "spec_prefill":
            _, batch, sampling, offset, req_idx = msg
            runner.spec_worker.forward_prefill(
                batch, sampling, offset, req_idx
            )
        elif kind == "spec_draft_extend":
            _, batch, sampling = msg
            runner.spec_worker.forward_draft_extend(batch, sampling)
        elif kind == "rebalance":
            runner.rebalance_experts()
        else:
            logger.warning("unknown follower message %r", kind)
    receiver.close()
