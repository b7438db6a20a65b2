"""PD-disaggregation KV transfer layer.

Analog of the reference's ``disaggregation/base/conn.py`` (``KVArgs:11``,
``KVPoll:26``, sender/receiver/bootstrap ABCs ``:34-127``) with two
backends:

- ``fake``: instant-success loopback (reference ``disaggregation/fake/conn.py``
  — makes PD scheduler logic testable on one box, and serves warmup);
- ``http``: serialized page blobs POSTed to the decode server's
  ``/pd/receive_kv`` endpoint — the DCN/TCP stand-in for the reference's
  RDMA (Mooncake/NIXL) data plane. On a real multi-host TPU deployment the
  blob hop is replaced by jax device-to-device transfers between meshes;
  the control flow is identical.
"""

from __future__ import annotations

import enum
import io
import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class KVPoll(enum.IntEnum):
    Failed = 0
    Bootstrapping = 1
    WaitingForInput = 2
    Transferring = 3
    Success = 4


def serialize_kv(pages_blob: Tuple[np.ndarray, ...],
                 meta: Dict[str, Any]) -> bytes:
    import json

    buf = io.BytesIO()
    arrays = {f"a{i}": np.asarray(x) for i, x in enumerate(pages_blob)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(buf, **arrays)
    return buf.getvalue()


def deserialize_kv(data: bytes) -> Tuple[Tuple[np.ndarray, ...],
                                         Dict[str, Any]]:
    import json

    with np.load(io.BytesIO(data)) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        n = len([k for k in z.files if k != "__meta__"])
        blob = tuple(z[f"a{i}"] for i in range(n))
    return blob, meta


class BaseKVSender:
    def send(self, blob: bytes) -> KVPoll:
        raise NotImplementedError


class FakeKVSender(BaseKVSender):
    """Loopback: delivers directly to an in-process receiver callback."""

    def __init__(self, deliver):
        self.deliver = deliver

    def send(self, blob: bytes) -> KVPoll:
        self.deliver(blob)
        return KVPoll.Success


class HttpKVSender(BaseKVSender):
    """Pushes the KV blob to the decode server over HTTP (TCP backend).

    Internal PD requests carry the bearer token when --api-key is set
    (the reference attaches Authorization to its own internal requests,
    reference http_server.py:1082)."""

    def __init__(self, decode_url: str, timeout: float = 120.0,
                 api_key: Optional[str] = None):
        self.url = decode_url.rstrip("/") + "/pd/receive_kv"
        self.timeout = timeout
        self.api_key = api_key

    def send(self, blob: bytes) -> KVPoll:
        import httpx

        headers = {"Content-Type": "application/octet-stream"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        try:
            r = httpx.post(
                self.url, content=blob, headers=headers,
                timeout=self.timeout,
            )
            return KVPoll.Success if r.status_code == 200 else KVPoll.Failed
        except Exception as e:  # noqa: BLE001
            logger.error("KV transfer failed: %s", e)
            return KVPoll.Failed


class ChunkedKVSender:
    """Non-blocking chunk streamer with a per-room state machine
    (reference ``mooncake/conn.py`` MooncakeAsyncKVManager role: a worker
    thread drains a queue of layer/chunk tasks while prefill compute
    continues; per-transfer failures mark the room Failed instead of
    blocking the scheduler — ``conn.py:554-609`` heartbeat/failure
    semantics reduce to post-timeout detection on the TCP data plane).

    The scheduler thread enqueues DEVICE arrays (async gather results);
    the worker performs the device->host readback and the HTTP POST, so
    KV transfer overlaps the remaining prefill compute chunk for chunk.
    """

    def __init__(self, decode_url: str, room: str,
                 api_key: Optional[str] = None, timeout: float = 30.0):
        import queue
        import threading

        self.url = decode_url.rstrip("/") + "/pd/receive_kv"
        self.room = room
        self.timeout = timeout
        self.state = KVPoll.WaitingForInput
        self.headers = {"Content-Type": "application/octet-stream"}
        if api_key:
            self.headers["Authorization"] = f"Bearer {api_key}"
        self._q: "queue.Queue" = queue.Queue()
        self._done = threading.Event()
        self._chunks_sent = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- producer side (scheduler thread) ------------------------------
    def enqueue_device(self, dev_arrays, n_pages: int, meta: Dict[str, Any]):
        if self.state == KVPoll.Failed:
            return
        self.state = KVPoll.Transferring
        self._q.put(("chunk", dev_arrays, n_pages, meta))

    def finish(self, meta: Dict[str, Any]):
        """Final (possibly empty) chunk carrying first_token etc."""
        self._q.put(("last", None, 0, meta))

    def wait_done(self, timeout: float = 120.0) -> KVPoll:
        self._done.wait(timeout)
        if not self._done.is_set():
            self.state = KVPoll.Failed
        return self.state

    @property
    def chunks_sent(self) -> int:
        return self._chunks_sent

    # -- worker --------------------------------------------------------
    def _run(self):
        import httpx

        while True:
            kind, dev, n, meta = self._q.get()
            if self.state == KVPoll.Failed:
                if kind == "last":
                    break
                continue
            try:
                if dev is not None:
                    import jax

                    host = jax.device_get(dev)
                    blob = tuple(
                        np.ascontiguousarray(np.asarray(x)[:, :n])
                        for x in host
                    )
                else:
                    blob = ()
                payload = serialize_kv(blob, dict(meta, room=self.room))
                r = httpx.post(self.url, content=payload,
                               headers=self.headers, timeout=self.timeout)
                if r.status_code != 200:
                    raise RuntimeError(f"receive_kv -> {r.status_code}")
                self._chunks_sent += 1
            except Exception as e:  # noqa: BLE001
                logger.error("PD chunk transfer failed (room %s): %s",
                             self.room, e)
                self.state = KVPoll.Failed
            if kind == "last":
                if self.state != KVPoll.Failed:
                    self.state = KVPoll.Success
                break
        self._done.set()
