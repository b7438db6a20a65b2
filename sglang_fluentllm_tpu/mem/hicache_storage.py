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
    raise ValueError(f"unknown hicache storage backend {name}")
