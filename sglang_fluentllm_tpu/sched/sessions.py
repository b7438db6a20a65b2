"""Multi-turn sessions.

Analog of the reference's ``managers/session_controller.py`` (``Session:...``
— multi-turn session tree with continuation from an arbitrary point). Each
session keeps the token history; a generate call with ``session_params``
prepends the history, and the radix prefix cache supplies the actual KV
reuse. Branching from an earlier turn is a truncation (``offset``).
"""

from __future__ import annotations

import dataclasses
import threading
import time
import uuid
from typing import Dict, List, Optional


@dataclasses.dataclass
class Session:
    session_id: str
    token_ids: List[int] = dataclasses.field(default_factory=list)
    created: float = dataclasses.field(default_factory=time.time)
    last_used: float = dataclasses.field(default_factory=time.time)


class SessionController:
    def __init__(self, capacity: int = 4096):
        self._sessions: Dict[str, Session] = {}
        self._lock = threading.Lock()
        self.capacity = capacity

    def open_session(self, session_id: Optional[str] = None) -> str:
        sid = session_id or uuid.uuid4().hex
        with self._lock:
            if len(self._sessions) >= self.capacity:
                oldest = min(
                    self._sessions.values(), key=lambda s: s.last_used
                )
                del self._sessions[oldest.session_id]
            self._sessions[sid] = Session(sid)
        return sid

    def close_session(self, session_id: str) -> bool:
        with self._lock:
            return self._sessions.pop(session_id, None) is not None

    def get(self, session_id: str) -> Optional[Session]:
        s = self._sessions.get(session_id)
        if s is not None:
            s.last_used = time.time()
        return s

    def prefix_for(
        self, session_id: str, offset: Optional[int] = None
    ) -> List[int]:
        """Token history (optionally truncated for branching)."""
        s = self.get(session_id)
        if s is None:
            raise ValueError(f"unknown session {session_id}")
        if offset is not None and 0 <= offset < len(s.token_ids):
            s.token_ids = s.token_ids[:offset]
        return list(s.token_ids)

    def append(self, session_id: str, token_ids: List[int]):
        s = self.get(session_id)
        if s is not None:
            s.token_ids.extend(token_ids)
