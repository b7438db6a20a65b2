"""KV cache event publishing.

Analog of the reference's ``disaggregation/kv_events.py`` (ZMQ publisher of
radix block store/remove events for external KV-aware routers like Dynamo).
Events: BlockStored (page-aligned token block entered the tree) and
BlockRemoved (evicted).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class KVEvent:
    kind: str                       # "block_stored" | "block_removed"
    token_ids: List[int]
    page_ids: List[int]
    ts: float = dataclasses.field(default_factory=time.time)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


class KVEventPublisher:
    """ZMQ PUB socket; topic 'kv'. Falls back to an in-memory ring when no
    endpoint is configured (tests / introspection)."""

    def __init__(self, endpoint: Optional[str] = None, buffer: int = 4096):
        self.endpoint = endpoint
        self._ring: List[KVEvent] = []
        self._buffer = buffer
        self._sock = None
        if endpoint:
            import zmq

            ctx = zmq.Context.instance()
            self._sock = ctx.socket(zmq.PUB)
            self._sock.bind(endpoint)

    def publish(self, event: KVEvent):
        self._ring.append(event)
        if len(self._ring) > self._buffer:
            del self._ring[: len(self._ring) - self._buffer]
        if self._sock is not None:
            try:
                self._sock.send_multipart([
                    b"kv", json.dumps(event.to_dict()).encode()
                ])
            except Exception as e:  # noqa: BLE001
                logger.debug("kv event publish failed: %s", e)

    def block_stored(self, token_ids: List[int], page_ids: List[int]):
        self.publish(KVEvent("block_stored", list(token_ids),
                             list(page_ids)))

    def block_removed(self, token_ids: List[int], page_ids: List[int]):
        self.publish(KVEvent("block_removed", list(token_ids),
                             list(page_ids)))

    def recent(self, n: int = 100) -> List[Dict[str, Any]]:
        return [e.to_dict() for e in self._ring[-n:]]
