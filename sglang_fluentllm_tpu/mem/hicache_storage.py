"""KV storage tier backends.

Analog of the reference's ``mem_cache/hicache_storage.py`` (``HiCacheStorage:61``
ABC — batch get/set/exists over hash keys) + file backend (``HiCacheFile:181``)
+ ``storage/backend_factory.py``.
"""

from __future__ import annotations

import abc
import logging
import os
import tempfile
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class HiCacheStorage(abc.ABC):
    @abc.abstractmethod
    def get(self, key: str) -> Optional[Any]: ...

    @abc.abstractmethod
    def set(self, key: str, blob: Any) -> bool: ...

    @abc.abstractmethod
    def exists(self, key: str) -> bool: ...

    def batch_get(self, keys: List[str]) -> List[Optional[Any]]:
        return [self.get(k) for k in keys]

    def batch_set(self, keys: List[str], blobs: List[Any]) -> bool:
        return all(self.set(k, b) for k, b in zip(keys, blobs))


class HiCacheFile(HiCacheStorage):
    """Page blobs as .npz files keyed by hash (HiCacheFile analog)."""

    def __init__(self, root: Optional[str] = None):
        self.root = root or os.path.join(
            tempfile.gettempdir(), "sft_hicache"
        )
        os.makedirs(self.root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, f"{key}.npz")

    def get(self, key: str):
        """Blobs are tuples of numpy arrays (one per KV pool array)."""
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            with np.load(path) as z:
                return tuple(z[f"a{i}"] for i in range(len(z.files)))
        except Exception:  # noqa: BLE001
            return None

    def set(self, key: str, blob) -> bool:
        flat = {f"a{i}": np.asarray(leaf) for i, leaf in enumerate(blob)}
        try:
            np.savez(self._path(key), **flat)
            return True
        except Exception:  # noqa: BLE001
            return False

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))


def create_storage_backend(name: Optional[str], **kwargs) -> Optional[
    HiCacheStorage
]:
    if name in (None, "", "none"):
        return None
    if name == "file":
        return HiCacheFile(kwargs.get("root"))
    if name in ("remote", "tcp", "mooncake"):
        addr = kwargs.get("address")
        assert addr, "remote storage backend needs an address host:port"
        return HiCacheRemote(addr)
    raise ValueError(f"unknown hicache storage backend {name}")


# ----------------------------------------------------------------------
# Remote (distributed) store — the Mooncake-store analog
# (reference ``mem_cache/storage/mooncake_store/``): a shared KV-page
# service that multiple serving hosts hit over DCN. Transport is a
# length-prefixed pickle protocol over TCP; the server is a standalone
# process (``python -m sglang_fluentllm_tpu.mem.hicache_storage --port``).
# ----------------------------------------------------------------------
import pickle
import socket
import struct
import threading


def _send_msg(sock, obj):
    blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("<Q", len(blob)) + blob)


def _recv_msg(sock):
    hdr = b""
    while len(hdr) < 8:
        c = sock.recv(8 - len(hdr))
        if not c:
            raise ConnectionError("kvstore peer closed")
        hdr += c
    (n,) = struct.unpack("<Q", hdr)
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        k = sock.recv_into(view[got:], n - got)
        if k == 0:
            raise ConnectionError("kvstore peer closed")
        got += k
    return pickle.loads(bytes(buf))


class HiCacheRemote(HiCacheStorage):
    """Client for the remote KV-page store. Thread-safe (one socket,
    one in-flight request under a lock — the scheduler's storage calls
    are already serialized through the hicache worker threads)."""

    def __init__(self, address: str):
        host, port = address.rsplit(":", 1)
        self._addr = (host, int(port))
        self._lock = threading.Lock()
        self._sock = None
        self._connect()

    def _connect(self):
        self._sock = socket.create_connection(self._addr, timeout=30.0)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def _call(self, *req):
        with self._lock:
            try:
                _send_msg(self._sock, req)
                return _recv_msg(self._sock)
            except (ConnectionError, OSError):
                # one reconnect attempt (server restart tolerance)
                self._connect()
                _send_msg(self._sock, req)
                return _recv_msg(self._sock)

    def get(self, key: str):
        return self._call("get", key)

    def set(self, key: str, blob) -> bool:
        return bool(self._call(
            "set", key, tuple(np.asarray(x) for x in blob)))

    def exists(self, key: str) -> bool:
        return bool(self._call("exists", key))

    def batch_get(self, keys: List[str]):
        return list(self._call("batch_get", list(keys)))

    def batch_set(self, keys: List[str], blobs) -> bool:
        return bool(self._call(
            "batch_set", list(keys),
            [tuple(np.asarray(x) for x in b) for b in blobs]))


def serve_kvstore(host: str = "0.0.0.0", port: int = 0,
                  ready_event: Optional[threading.Event] = None,
                  max_items: int = 1 << 20):
    """Blocking KV-page store server (in-memory dict with FIFO cap).
    Returns never; bind port is published via ``serve_kvstore.port``."""
    from collections import OrderedDict

    store: "OrderedDict[str, Any]" = OrderedDict()
    lock = threading.Lock()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(64)
    serve_kvstore.port = srv.getsockname()[1]
    if ready_event is not None:
        ready_event.set()
    logger.info("kvstore serving on %s:%d", host, serve_kvstore.port)

    def handle(conn):
        try:
            while True:
                req = _recv_msg(conn)
                op = req[0]
                with lock:
                    if op == "get":
                        resp = store.get(req[1])
                    elif op == "set":
                        store[req[1]] = req[2]
                        while len(store) > max_items:
                            store.popitem(last=False)
                        resp = True
                    elif op == "exists":
                        resp = req[1] in store
                    elif op == "batch_get":
                        resp = [store.get(k) for k in req[1]]
                    elif op == "batch_set":
                        for k, b in zip(req[1], req[2]):
                            store[k] = b
                        while len(store) > max_items:
                            store.popitem(last=False)
                        resp = True
                    else:
                        resp = None
                _send_msg(conn, resp)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    while True:
        conn, _ = srv.accept()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        threading.Thread(target=handle, args=(conn,), daemon=True).start()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=18100)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    serve_kvstore(args.host, args.port)
