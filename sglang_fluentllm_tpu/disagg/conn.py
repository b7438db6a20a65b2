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
                 api_key: Optional[str] = None, timeout: float = 30.0,
                 retries: int = 3, heartbeat_interval: float = 2.0):
        import queue
        import threading

        self.url = decode_url.rstrip("/") + "/pd/receive_kv"
        self.hb_url = decode_url.rstrip("/") + "/pd/heartbeat"
        self.room = room
        self.timeout = timeout
        self.retries = max(1, retries)
        self.state = KVPoll.WaitingForInput
        self.headers = {"Content-Type": "application/octet-stream"}
        if api_key:
            self.headers["Authorization"] = f"Bearer {api_key}"
        self._q: "queue.Queue" = queue.Queue()
        self._done = threading.Event()
        self._chunks_sent = 0
        self._chunk_retries = 0
        self._bytes_sent = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        # active heartbeat (reference mooncake conn.py:554-609 failure
        # detector): keeps the decode room's last_activity fresh while the
        # prefill is still COMPUTING (no chunks flowing yet), so the
        # decode-side stall detector only fires on a truly dead peer
        self._hb = threading.Thread(
            target=self._heartbeat, args=(heartbeat_interval,), daemon=True
        )
        self._hb.start()

    # -- producer side (scheduler thread) ------------------------------
    def enqueue_device(self, dev_arrays, n_pages: int, meta: Dict[str, Any]):
        if self.state == KVPoll.Failed:
            return
        self.state = KVPoll.Transferring
        # double-buffered readback (VERDICT r4 #6): start the D2H copy
        # NOW, asynchronously, so the worker's device_get mostly finds
        # local bytes instead of blocking the device on a cold fetch
        # while the scheduler is mid-step
        try:
            for a in dev_arrays:
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
        except Exception:  # noqa: BLE001 - best-effort prefetch
            pass
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

    @property
    def chunk_retries(self) -> int:
        return self._chunk_retries

    @property
    def bytes_sent(self) -> int:
        return self._bytes_sent

    # -- heartbeat -----------------------------------------------------
    def _heartbeat(self, interval: float):
        import httpx

        while not self._done.is_set():
            try:
                httpx.post(
                    self.hb_url, json={"room": self.room},
                    headers={
                        k: v for k, v in self.headers.items()
                        if k == "Authorization"
                    },
                    timeout=min(5.0, self.timeout),
                )
            except Exception:  # noqa: BLE001
                pass  # transfer failures are detected on the data path
            self._done.wait(interval)

    # -- worker --------------------------------------------------------
    def _run(self):
        import time as _time

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
                # bounded retry with exponential backoff before the room
                # is marked Failed (reference nixl/mooncake retry-then-
                # fail semantics): transient TCP hiccups don't abort a
                # multi-GB transfer
                last_err = None
                for attempt in range(self.retries):
                    try:
                        r = httpx.post(
                            self.url, content=payload,
                            headers=self.headers, timeout=self.timeout,
                        )
                        if r.status_code == 200:
                            last_err = None
                            break
                        last_err = RuntimeError(
                            f"receive_kv -> {r.status_code}")
                    except Exception as e:  # noqa: BLE001
                        last_err = e
                    if attempt + 1 < self.retries:
                        self._chunk_retries += 1
                        _time.sleep(min(2.0, 0.1 * 2 ** attempt))
                if last_err is not None:
                    raise last_err
                self._chunks_sent += 1
                self._bytes_sent += len(payload)
            except Exception as e:  # noqa: BLE001
                logger.error("PD chunk transfer failed (room %s): %s",
                             self.room, e)
                self.state = KVPoll.Failed
            if kind == "last":
                if self.state != KVPoll.Failed:
                    self.state = KVPoll.Success
                break
        self._done.set()
