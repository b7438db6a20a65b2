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
