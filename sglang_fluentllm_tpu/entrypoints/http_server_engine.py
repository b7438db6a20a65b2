"""Engine adapter that proxies to a subprocess HTTP server.

Analog of the reference's ``srt/entrypoints/http_server_engine.py``
(``HttpServerEngineAdapter``): RLHF trainers (verl-style) want the
Engine API but need the model in its own process with the full HTTP
surface. The adapter launches ``launch_server`` in a subprocess, waits
for ``/health_generate``, then forwards Engine calls as HTTP requests —
including ``update_weights_from_tensor`` with base64 raw-buffer tensors
(matching the server route's wire format).
"""

from __future__ import annotations

import base64
import multiprocessing
import time
import urllib.error
import urllib.request
import json as _json
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from sglang_fluentllm_tpu.config.server_args import ServerArgs


def _server_main(server_args: ServerArgs) -> None:
    from sglang_fluentllm_tpu.entrypoints.http_server import launch_server

    launch_server(server_args)


def launch_server_process(
    server_args: ServerArgs, timeout: float = 560.0
) -> multiprocessing.Process:
    """Spawn the server and block until it serves ``/health_generate``
    (TPU warmup compiles can take minutes — same budget as the popen
    test harness)."""
    ctx = multiprocessing.get_context("spawn")
    p = ctx.Process(target=_server_main, args=(server_args,), daemon=True)
    p.start()
    base = f"http://{server_args.host}:{server_args.port}"
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                f"{base}/health_generate", timeout=5
            ) as r:
                if r.status == 200:
                    return p
        except (urllib.error.URLError, ConnectionError, OSError):
            pass
        if not p.is_alive():
            raise RuntimeError("server process died during startup")
        time.sleep(1.0)
    p.terminate()
    raise TimeoutError("server did not become healthy in time")


class HttpServerEngineAdapter:
    """Engine-shaped facade over a remote/subprocess HTTP server."""

    def __init__(self, launch: bool = True, base_url: Optional[str] = None,
                 **kwargs):
        self.server_args = ServerArgs(**kwargs)
        self.process = None
        if base_url is not None:
            self.base_url = base_url.rstrip("/")
        else:
            self.base_url = (
                f"http://{self.server_args.host}:{self.server_args.port}"
            )
            if launch:
                self.process = launch_server_process(self.server_args)

    # -- plumbing ------------------------------------------------------
    def _request(self, endpoint: str,
                 payload: Optional[Dict[str, Any]] = None,
                 timeout: float = 600.0) -> Dict[str, Any]:
        data = _json.dumps(payload or {}).encode()
        req = urllib.request.Request(
            f"{self.base_url}/{endpoint.lstrip('/')}",
            data=data,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            body = r.read()
        return _json.loads(body) if body else {}

    # -- Engine surface ------------------------------------------------
    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Dict[str, Any]] = None,
    ):
        payload: Dict[str, Any] = {
            "sampling_params": sampling_params or {}
        }
        if prompt is not None:
            payload["text"] = prompt
        if input_ids is not None:
            payload["input_ids"] = input_ids
        return self._request("generate", payload)

    def flush_cache(self):
        return self._request("flush_cache")

    def release_memory_occupation(self):
        return self._request("release_memory_occupation")

    def resume_memory_occupation(self):
        return self._request("resume_memory_occupation")

    def update_weights_from_disk(self, model_path: str):
        return self._request(
            "update_weights_from_disk", {"model_path": model_path}
        )

    def update_weights_from_tensor(
        self,
        named_tensors: List[Tuple[str, Any]],
        flush_cache: bool = True,
    ):
        """Ship tensors as base64 raw buffers (server wire format,
        entrypoints/http_server.py update_weights_from_tensor)."""
        ser = []
        for name, t in named_tensors:
            arr = np.asarray(t)
            ser.append({
                "name": name,
                "dtype": arr.dtype.name,
                "shape": list(arr.shape),
                "data": base64.b64encode(arr.tobytes()).decode(),
            })
        return self._request(
            "update_weights_from_tensor",
            {"named_tensors": ser, "flush_cache": flush_cache},
        )

    def shutdown(self):
        if self.process is not None and self.process.is_alive():
            self.process.terminate()
            self.process.join(timeout=30)
        self.process = None
