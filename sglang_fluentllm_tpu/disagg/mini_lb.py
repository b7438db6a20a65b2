"""Mini PD load balancer.

Analog of the reference's ``disaggregation/mini_lb.py`` (``MiniLoadBalancer:47``
— standalone server pairing a prefill and a decode server, allocating a
bootstrap room and forwarding the request to both). Flow per request:

1. pick a (prefill, decode) pair (round-robin);
2. ``/pd/start`` on decode: registers the room, returns the decode-side
   cached prefix length (decode radix cache);
3. ``/pd/prefill`` on prefill with that prefix length: computes the prompt,
   transfers the non-cached KV pages + first token to decode;
4. ``/pd/result`` on decode: waits for the continuation and returns it.

Run: python -m sglang_fluentllm_tpu.disagg.mini_lb --prefill URL --decode URL
"""

from __future__ import annotations

import argparse
import itertools
import logging
import uuid
from typing import List

import httpx
from aiohttp import web

logger = logging.getLogger(__name__)


class MiniLoadBalancer:
    def __init__(self, prefill_urls: List[str], decode_urls: List[str],
                 api_key: str | None = None):
        self.prefill_urls = [u.rstrip("/") for u in prefill_urls]
        self.decode_urls = [u.rstrip("/") for u in decode_urls]
        # internal requests to the servers carry the bearer token
        # (reference attaches Authorization on internal calls,
        # reference http_server.py:1082)
        self.headers = (
            {"Authorization": f"Bearer {api_key}"} if api_key else {}
        )
        self._rr = itertools.count()
        self.app = web.Application()
        self.app.router.add_post("/generate", self.generate)
        self.app.router.add_get("/health", self.health)

    def _pick(self):
        i = next(self._rr)
        return (
            self.prefill_urls[i % len(self.prefill_urls)],
            self.decode_urls[i % len(self.decode_urls)],
        )

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="ok")

    async def generate(self, request: web.Request) -> web.Response:
        body = await request.json()
        input_ids = body.get("input_ids")
        sp = body.get("sampling_params") or {}
        if input_ids is None:
            return web.json_response(
                {"error": "input_ids required"}, status=400
            )
        prefill_url, decode_url = self._pick()
        room = uuid.uuid4().hex

        async with httpx.AsyncClient(timeout=600, headers=self.headers) as client:
            r = await client.post(f"{decode_url}/pd/start", json={
                "room": room, "input_ids": input_ids,
                "sampling_params": sp,
            })
            dpl = r.json().get("decode_prefix_len", 0)
            r = await client.post(f"{prefill_url}/pd/prefill", json={
                "room": room, "input_ids": input_ids,
                "sampling_params": sp,
                "decode_url": decode_url,
                "decode_prefix_len": dpl,
            })
            if r.status_code != 200:
                return web.json_response(
                    {"error": f"prefill failed: {r.text}"}, status=502
                )
            prefill_info = r.json()
            r = await client.post(f"{decode_url}/pd/result",
                                  json={"room": room})
            if r.status_code != 200:
                return web.json_response(
                    {"error": f"decode failed: {r.text}"}, status=502
                )
            out = r.json()
            out.setdefault("meta_info", {})["pd"] = {
                "pages_sent": prefill_info.get("pages_sent"),
                "decode_prefix_len": dpl,
                "prefill_latency": prefill_info.get("prefill_latency"),
            }
            return web.json_response(out)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--prefill", nargs="+", required=True)
    parser.add_argument("--decode", nargs="+", required=True)
    parser.add_argument("--api-key", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args(argv)
    lb = MiniLoadBalancer(args.prefill, args.decode, api_key=args.api_key)
    web.run_app(lb.app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
