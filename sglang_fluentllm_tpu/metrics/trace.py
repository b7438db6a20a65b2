"""Request tracing.

Analog of the reference's ``srt/tracing/trace.py`` (per-request span tree,
named slices within scheduler stages, OTLP export). Dependency-light: spans
are recorded in-process; when an OTLP HTTP endpoint is configured the spans
are shipped as OTLP/JSON (no opentelemetry SDK needed in the image).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import threading
import time
import uuid
from collections import OrderedDict
from typing import Any, Dict, List, Optional

logger = logging.getLogger(__name__)

MAX_TRACES = 2048


@dataclasses.dataclass
class Span:
    name: str
    start_ns: int
    end_ns: int = 0
    attributes: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class RequestTrace:
    rid: str
    trace_id: str
    start_ns: int
    spans: List[Span] = dataclasses.field(default_factory=list)
    end_ns: int = 0


class RequestTracer:
    def __init__(self, otlp_endpoint: Optional[str] = None):
        self.enabled = True
        self.otlp_endpoint = otlp_endpoint
        self._traces: "OrderedDict[str, RequestTrace]" = OrderedDict()
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    def request_start(self, rid: str, **attrs):
        with self._lock:
            if len(self._traces) >= MAX_TRACES:
                self._traces.popitem(last=False)
            tr = RequestTrace(
                rid=rid, trace_id=uuid.uuid4().hex,
                start_ns=time.time_ns(),
            )
            if attrs:
                tr.spans.append(Span("request", tr.start_ns,
                                     attributes=dict(attrs)))
            self._traces[rid] = tr

    def slice(self, rid: str, name: str, start_ns: Optional[int] = None,
              end_ns: Optional[int] = None, **attrs):
        tr = self._traces.get(rid)
        if tr is None:
            return
        now = time.time_ns()
        tr.spans.append(Span(
            name, start_ns or now, end_ns or now, dict(attrs)
        ))

    def request_end(self, rid: str):
        tr = self._traces.get(rid)
        if tr is None:
            return
        tr.end_ns = time.time_ns()
        if self.otlp_endpoint:
            try:
                self._export_otlp(tr)
            except Exception as e:  # noqa: BLE001
                logger.debug("otlp export failed: %s", e)

    def get(self, rid: str) -> Optional[Dict[str, Any]]:
        tr = self._traces.get(rid)
        if tr is None:
            return None
        return {
            "rid": tr.rid,
            "trace_id": tr.trace_id,
            "duration_ms": (
                (tr.end_ns or time.time_ns()) - tr.start_ns
            ) / 1e6,
            "spans": [
                {
                    "name": s.name,
                    "start_ns": s.start_ns,
                    "duration_ms": max(0, s.end_ns - s.start_ns) / 1e6,
                    "attributes": s.attributes,
                }
                for s in tr.spans
            ],
        }

    # ------------------------------------------------------------------
    def _export_otlp(self, tr: RequestTrace):
        """Ship a trace as OTLP/HTTP JSON (resourceSpans)."""
        import httpx

        payload = {
            "resourceSpans": [{
                "resource": {"attributes": [{
                    "key": "service.name",
                    "value": {"stringValue": "sglang_fluentllm_tpu"},
                }]},
                "scopeSpans": [{
                    "scope": {"name": "sglang_fluentllm_tpu"},
                    "spans": [
                        {
                            "traceId": tr.trace_id,
                            "spanId": uuid.uuid4().hex[:16],
                            "name": s.name,
                            "startTimeUnixNano": str(s.start_ns),
                            "endTimeUnixNano": str(s.end_ns or s.start_ns),
                            "attributes": [
                                {"key": k,
                                 "value": {"stringValue": str(v)}}
                                for k, v in s.attributes.items()
                            ],
                        }
                        for s in tr.spans
                    ],
                }],
            }]
        }
        httpx.post(
            self.otlp_endpoint.rstrip("/") + "/v1/traces",
            json=payload, timeout=5,
        )
