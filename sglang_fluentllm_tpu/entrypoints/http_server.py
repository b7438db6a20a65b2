"""HTTP server (aiohttp).

Analog of the reference's ``srt/entrypoints/http_server.py`` (FastAPI app,
``/generate:382``, ``/health_generate:271``, ``/flush_cache:519``, OpenAI
routes, admin endpoints). aiohttp replaces FastAPI (not available in the
image); SSE streaming semantics match.
"""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Any, Dict

from aiohttp import web

from sglang_fluentllm_tpu.config import ServerArgs
from sglang_fluentllm_tpu.entrypoints.async_engine import AsyncEngine
from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    ErrorResponse,
    ModelCard,
    ModelList,
)
from sglang_fluentllm_tpu.entrypoints.openai.serving import OpenAIServing

logger = logging.getLogger(__name__)


def _error(msg: str, status: int = 400) -> web.Response:
    return web.json_response(
        ErrorResponse(message=msg, code=status).model_dump(), status=status
    )


def _sse_response() -> web.StreamResponse:
    return web.StreamResponse(
        status=200,
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        },
    )


class HttpServer:
    def __init__(self, engine: AsyncEngine):
        self.engine = engine
        self.openai = OpenAIServing(engine)
        middlewares = []
        if engine.server_args.api_key:
            middlewares.append(self._auth_middleware(
                engine.server_args.api_key))
        self.app = web.Application(
            client_max_size=128 * 1024 * 1024, middlewares=middlewares
        )
        self._add_routes()

    @staticmethod
    def _auth_middleware(api_key: str):
        """Bearer-token auth on everything except /health* (matches the
        reference, which exempts any path starting with /health and keeps
        /metrics behind the key)."""

        @web.middleware
        async def auth(request: web.Request, handler):
            if request.path.startswith("/health"):
                return await handler(request)
            header = request.headers.get("Authorization", "")
            if header != f"Bearer {api_key}":
                return web.json_response(
                    ErrorResponse(
                        message="Invalid API key",
                        type="authentication_error", code=401,
                    ).model_dump(),
                    status=401,
                )
            return await handler(request)

        return auth

    def _add_routes(self):
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_get("/get_model_info", self.get_model_info)
        r.add_post("/generate", self.generate)
        r.add_post("/encode", self.encode)
        r.add_post("/classify", self.classify)
        r.add_post("/v1/embeddings", self.v1_embeddings)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/pause_generation", self.pause_generation)
        r.add_post("/continue_generation", self.continue_generation)
        r.add_get("/v1/models", self.list_models)
        r.add_post("/v1/completions", self.v1_completions)
        r.add_post("/v1/chat/completions", self.v1_chat_completions)
        r.add_post("/v1/score", self.v1_score)
        r.add_post("/v1/rerank", self.v1_rerank)
        r.add_post("/v1/responses", self.v1_responses)
        r.add_get("/v1/responses/{response_id}", self.v1_get_response)
        r.add_get("/metrics", self.metrics)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/update_weights_from_disk", self.update_weights)
        r.add_post("/update_weights_from_tensor",
                   self.update_weights_from_tensor)
        r.add_post("/init_weights_update_group",
                   self.init_weights_update_group)
        r.add_post("/update_weights_from_distributed",
                   self.update_weights_from_distributed)
        r.add_post("/get_weights_by_name", self.get_weights_by_name)
        r.add_post("/release_memory_occupation", self.release_memory)
        r.add_post("/resume_memory_occupation", self.resume_memory)
        r.add_post("/get_trace", self.get_trace)
        r.add_get("/get_load", self.get_load)
        r.add_get("/get_internal_state", self.get_internal_state)
        r.add_post("/get_internal_state", self.get_internal_state)
        r.add_post("/set_internal_state", self.set_internal_state)
        r.add_post("/start_profile", self.start_profile)
        r.add_get("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_get("/stop_profile", self.stop_profile)
        r.add_post("/parse_function_call", self.parse_function_call)
        r.add_post("/separate_reasoning", self.separate_reasoning)
        r.add_post("/slow_down", self.slow_down)
        r.add_post("/configure_logging", self.configure_logging)
        r.add_get("/ping", self.health)          # SageMaker alias
        r.add_post("/invocations", self.generate)  # SageMaker alias
        r.add_post("/generate_from_file", self.generate_from_file)
        r.add_post("/start_expert_distribution_record",
                   self.start_expert_record)
        r.add_post("/stop_expert_distribution_record",
                   self.stop_expert_record)
        r.add_post("/dump_expert_distribution_record",
                   self.dump_expert_record)
        r.add_get("/v1/models/{model:.+}", self.get_model)
        r.add_post("/v1/responses/{response_id}/cancel",
                   self.cancel_response)
        # PD disaggregation plane
        r.add_post("/pd/start", self.pd_start)
        r.add_post("/pd/prefill", self.pd_prefill)
        r.add_post("/pd/receive_kv", self.pd_receive_kv)
        r.add_post("/pd/heartbeat", self.pd_heartbeat)
        r.add_post("/pd/result", self.pd_result)

    # ------------------------------------------------------------------
    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="ok")

    async def health_generate(self, request: web.Request) -> web.Response:
        """Actually generate one token (reference http_server.py:270-341)."""
        if getattr(self.engine.runner.model, "is_classification", False):
            try:
                await self.engine.classify(input_ids=[1, 2, 3])
                return web.Response(text="ok")
            except Exception as e:  # noqa: BLE001
                return web.Response(status=503, text=f"unhealthy: {e}")
        try:
            ids = [1, 2, 3]
            out = await asyncio.wait_for(
                self.engine.generate(
                    input_ids=ids,
                    sampling_params={"max_new_tokens": 1,
                                     "temperature": 0.0},
                ),
                timeout=180.0,  # first call may pay jit compile
            )
            assert out is not None
            return web.Response(text="ok")
        except Exception as e:  # noqa: BLE001
            return web.Response(status=503, text=f"unhealthy: {e}")

    async def get_server_info(self, request: web.Request) -> web.Response:
        return web.json_response(self.engine.get_server_info())

    async def get_model_info(self, request: web.Request) -> web.Response:
        sa = self.engine.server_args
        return web.json_response({
            "model_path": sa.model_path,
            "tokenizer_path": sa.tokenizer_path,
            "served_model_name": sa.served_model_name,
            "is_generation": not getattr(
                self.engine.runner.model, "is_classification", False),
        })

    async def metrics(self, request: web.Request) -> web.Response:
        try:
            from sglang_fluentllm_tpu.metrics.collector import render_metrics

            return web.Response(
                text=render_metrics(), content_type="text/plain"
            )
        except Exception:
            return web.Response(text="", content_type="text/plain")

    # ------------------------------------------------------------------
    async def generate(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except Exception:
            return _error("invalid JSON body")
        prompt = body.get("text")
        input_ids = body.get("input_ids")
        sp = body.get("sampling_params") or {}
        if body.get("return_logprob"):
            sp["return_logprob"] = True
        stream = bool(body.get("stream", False))
        rid = body.get("rid")
        session_params = body.get("session_params")
        if prompt is None and input_ids is None:
            return _error("one of text/input_ids is required")

        # batch input
        if (isinstance(prompt, list) and prompt
                and isinstance(prompt[0], str)) or (
            isinstance(input_ids, list) and input_ids
            and isinstance(input_ids[0], list)
        ):
            items = prompt if prompt is not None else input_ids
            sps = sp if isinstance(sp, list) else [sp] * len(items)
            kw = "prompt" if prompt is not None else "input_ids"
            try:
                outs = await asyncio.gather(*[
                    self.engine.generate(
                        sampling_params=s, **{kw: it}
                    )
                    for it, s in zip(items, sps)
                ])
            except ValueError as e:
                return _error(str(e))
            return web.json_response([self._strip(o) for o in outs])

        cpd = getattr(self.engine, "colocated_pd", None)
        if cpd is not None and not stream and session_params is None:
            # colocated PD flow: prefill submesh -> device transfer ->
            # decode continuation. Streaming/session requests fall
            # through to the decode engine (prompt KV computes there).
            try:
                if input_ids is None:
                    assert self.engine.tokenizer is not None
                    input_ids = self.engine.tokenizer.encode(prompt)
                out = await cpd.generate(
                    input_ids, sampling_params=sp, rid=rid
                )
                return web.json_response(self._strip(out))
            except ValueError as e:
                return _error(str(e))

        try:
            if stream:
                resp = _sse_response()
                await resp.prepare(request)
                async for chunk in self.engine.generate_stream(
                    prompt=prompt, input_ids=input_ids,
                    sampling_params=sp, rid=rid,
                    session_params=session_params,
                ):
                    payload = json.dumps(self._strip(chunk))
                    await resp.write(f"data: {payload}\n\n".encode())
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp
            out = await self.engine.generate(
                prompt=prompt, input_ids=input_ids, sampling_params=sp,
                rid=rid, session_params=session_params,
            )
            return web.json_response(self._strip(out))
        except ValueError as e:
            return _error(str(e))

    async def encode(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            emb = await self.engine.encode(
                prompt=body.get("text"),
                input_ids=body.get("input_ids"),
            )
            return web.json_response({"embedding": emb})
        except (ValueError, AssertionError) as e:
            return _error(str(e))

    async def classify(self, request: web.Request) -> web.Response:
        """Classification/reward logits (reference /classify route)."""
        try:
            body = await request.json()
            inp = body.get("text") or body.get("input")
            kwargs = {}
            if isinstance(inp, str) or (
                isinstance(inp, list) and inp and isinstance(inp[0], str)
            ):
                kwargs["prompt"] = inp
            else:
                kwargs["input_ids"] = inp or body.get("input_ids")
            logits = await self.engine.classify(**kwargs)
            return web.json_response({
                "embedding": logits,
                "meta_info": {"num_labels": len(logits[0]) if logits
                              else 0},
            })
        except (ValueError, AssertionError, RuntimeError) as e:
            return _error(str(e))

    async def v1_embeddings(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            inp = body.get("input")
            kwargs = {}
            if isinstance(inp, str) or (
                isinstance(inp, list) and inp
                and isinstance(inp[0], str)
            ):
                kwargs["prompt"] = inp
            else:
                kwargs["input_ids"] = inp
            emb = await self.engine.encode(**kwargs)
            return web.json_response({
                "object": "list",
                "model": body.get("model",
                                  self.engine.server_args.served_model_name),
                "data": [
                    {"object": "embedding", "index": i, "embedding": e}
                    for i, e in enumerate(emb)
                ],
                "usage": {"prompt_tokens": 0, "total_tokens": 0},
            })
        except (ValueError, AssertionError) as e:
            return _error(str(e))

    @staticmethod
    def _strip(out: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(out)
        out.pop("new_token_ids", None)
        return out

    async def flush_cache(self, request: web.Request) -> web.Response:
        ok = await self.engine.flush_cache()
        return web.json_response(
            {"success": ok,
             "message": "Cache flushed" if ok else "Cache not flushed: "
             "requests in flight"},
            status=200 if ok else 503,
        )

    async def abort_request(self, request: web.Request) -> web.Response:
        body = await request.json()
        rid = body.get("rid")
        if not rid:
            return _error("rid required")
        self.engine.abort_request(rid)
        return web.json_response({"success": True})

    async def pause_generation(self, request: web.Request) -> web.Response:
        self.engine.pause_generation()
        return web.json_response({"success": True})

    async def continue_generation(self, request: web.Request) -> web.Response:
        self.engine.continue_generation()
        return web.json_response({"success": True})

    # ------------------------------------------------------------------
    async def open_session(self, request: web.Request) -> web.Response:
        body = await request.json() if request.can_read_body else {}
        sid = self.engine.sessions.open_session(
            (body or {}).get("session_id")
        )
        return web.json_response({"session_id": sid})

    async def close_session(self, request: web.Request) -> web.Response:
        body = await request.json()
        ok = self.engine.sessions.close_session(body.get("session_id", ""))
        return web.json_response({"success": ok},
                                 status=200 if ok else 404)

    async def update_weights(self, request: web.Request) -> web.Response:
        body = await request.json()
        path = body.get("model_path")
        if not path:
            return _error("model_path required")
        ok, msg = await self.engine.update_weights_from_disk(path)
        return web.json_response(
            {"success": ok, "message": str(msg)},
            status=200 if ok else 400,
        )

    async def get_weights_by_name(self, request: web.Request) -> web.Response:
        body = await request.json()
        ok, value = await self.engine.get_weights_by_name(
            body.get("name", ""), body.get("truncate_size", 100)
        )
        if not ok or value is None:
            return _error(f"unknown parameter {body.get('name')}", 404)
        return web.json_response(value)

    async def update_weights_from_tensor(
        self, request: web.Request
    ) -> web.Response:
        """RLHF in-place update; tensors arrive as base64 raw buffers with
        dtype/shape metadata (reference http_server.py:629 — 'any binary
        data ... base64 encoded')."""
        import base64

        import numpy as np

        body = await request.json()
        tensors = body.get("named_tensors") or body.get("serialized_named_tensors")
        if not tensors:
            return _error("named_tensors required")
        named = []
        try:
            for t in tensors:
                import ml_dtypes  # noqa: F401

                try:
                    dt = np.dtype(t["dtype"])
                except TypeError:
                    dt = np.dtype(getattr(ml_dtypes, t["dtype"]))
                arr = np.frombuffer(
                    base64.b64decode(t["data"]), dtype=dt
                ).reshape(t["shape"])
                named.append((t["name"], arr))
        except Exception as e:  # noqa: BLE001
            return _error(f"bad tensor payload: {e}")
        ok, msg = await self.engine.update_weights_from_tensor(
            named, flush=body.get("flush", True)
        )
        return web.json_response(
            {"success": ok, "message": str(msg)},
            status=200 if ok else 400,
        )

    async def init_weights_update_group(
        self, request: web.Request
    ) -> web.Response:
        body = await request.json()
        addr = body.get("master_address")
        port = body.get("master_port")
        if not addr or not port:
            return _error("master_address and master_port required")
        ok, msg = await self.engine.init_weights_update_group(
            addr, int(port)
        )
        return web.json_response({"success": ok, "message": str(msg)},
                                 status=200 if ok else 400)

    async def update_weights_from_distributed(
        self, request: web.Request
    ) -> web.Response:
        body = await request.json()
        names = body.get("names")
        dtypes = body.get("dtypes")
        shapes = body.get("shapes")
        if not names or not dtypes or not shapes:
            return _error("names/dtypes/shapes required")
        ok, msg = await self.engine.update_weights_from_distributed(
            names, dtypes, shapes, flush=body.get("flush", True)
        )
        return web.json_response({"success": ok, "message": str(msg)},
                                 status=200 if ok else 400)

    async def get_load(self, request: web.Request) -> web.Response:
        return web.json_response(self.engine.get_load())

    async def get_internal_state(self, request: web.Request) -> web.Response:
        """Live introspection RPC (reference scheduler.py:1860
        get_internal_state): scheduler feedback state, allocator stats,
        spec accept length, overlap pipeline state."""
        sched = self.engine.scheduler
        runner = self.engine.runner
        state = {
            "new_token_ratio": sched.new_token_ratio,
            "num_generated_tokens": sched.num_generated_tokens,
            "num_retracted": sched.num_retracted,
            "spec_accept_length": (
                sched.spec_accept_sum / sched.spec_accept_ct
                if getattr(sched, "spec_accept_ct", 0) else None
            ),
            "cache_hit_rate": (
                sched.num_cached_prompt_tokens
                / max(1, sched.num_prompt_tokens_seen)
                if getattr(sched, "num_prompt_tokens_seen", 0) else None
            ),
            "available_kv_tokens": runner.allocator.available_tokens(),
            "max_total_tokens": runner.max_total_tokens,
            "max_running_requests": runner.max_reqs,
            "step_counter": runner.step_counter,
            "memory_usage": {
                "kv_pool_gib": sum(
                    x.size * x.dtype.itemsize
                    for x in __import__("jax").tree.leaves(runner.kv_cache)
                ) / (1 << 30) if runner.kv_cache is not None else 0.0,
            },
            "slow_down_ms": self.engine._slow_down_ms,
        }
        return web.json_response({"internal_states": [state]})

    async def set_internal_state(self, request: web.Request) -> web.Response:
        """Live tuning RPC (reference set_internal_state): whitelisted
        knobs only."""
        body = await request.json()
        server_state = body.get("server_args") or body
        applied = {}
        sched = self.engine.scheduler
        if "new_token_ratio" in server_state:
            v = float(server_state["new_token_ratio"])
            if not (0.0 < v <= 1.0):
                return _error("new_token_ratio must be in (0, 1]")
            sched.new_token_ratio = v
            applied["new_token_ratio"] = v
        if "forward_sleep_time" in server_state:
            self.engine._slow_down_ms = max(
                0.0, float(server_state["forward_sleep_time"]))
            applied["forward_sleep_time"] = self.engine._slow_down_ms
        if not applied:
            return _error("no recognized internal-state keys")
        return web.json_response({"success": True, "applied": applied})

    async def start_profile(self, request: web.Request) -> web.Response:
        """jax.profiler trace capture (reference /start_profile,
        torch.profiler role)."""
        import jax

        body = {}
        if request.can_read_body:
            try:
                body = await request.json()
            except Exception:  # noqa: BLE001
                body = {}
        out_dir = (body.get("output_dir")
                   or self.engine.server_args.profile_dir or "/tmp/sft_trace")
        if getattr(self, "_profiling", False):
            return _error("profiler already running")
        try:
            jax.profiler.start_trace(out_dir)
        except Exception as e:  # noqa: BLE001
            return _error(f"profiler start failed: {e}")
        self._profiling = True
        self._profile_dir = out_dir
        return web.json_response(
            {"success": True, "message": f"tracing to {out_dir}"}
        )

    async def stop_profile(self, request: web.Request) -> web.Response:
        import jax

        if not getattr(self, "_profiling", False):
            return _error("profiler not running")
        jax.profiler.stop_trace()
        self._profiling = False
        return web.json_response(
            {"success": True,
             "message": f"trace written to {self._profile_dir}"}
        )

    async def parse_function_call(self, request: web.Request) -> web.Response:
        """Run a tool-call detector over raw text (reference
        /parse_function_call, function_call_parser role)."""
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        body = await request.json()
        text = body.get("text", "")
        parser_name = (body.get("tool_call_parser")
                       or self.engine.server_args.tool_call_parser)
        tools = body.get("tools") or []
        try:
            from sglang_fluentllm_tpu.entrypoints.openai.protocol import Tool

            parser = FunctionCallParser(
                [Tool(**t) for t in tools], parser_name
            )
            normal_text, calls = parser.parse_non_stream(text)
        except ValueError as e:
            return _error(str(e))
        return web.json_response({
            "normal_text": normal_text,
            "calls": [
                {"name": c.name, "parameters": c.parameters,
                 "tool_index": c.tool_index}
                for c in calls
            ],
        })

    async def separate_reasoning(self, request: web.Request) -> web.Response:
        from sglang_fluentllm_tpu.parser.reasoning_parser import (
            ReasoningParser,
        )

        body = await request.json()
        text = body.get("text", "")
        rp = (body.get("reasoning_parser")
              or self.engine.server_args.reasoning_parser or "deepseek_r1")
        parsed = ReasoningParser(
            implicit_open=(rp == "deepseek_r1")
        ).parse_full(text)
        return web.json_response({
            "reasoning_text": parsed.reasoning,
            "text": parsed.content,
        })

    async def slow_down(self, request: web.Request) -> web.Response:
        body = await request.json()
        ms = float(body.get("forward_sleep_time") or 0.0)
        self.engine._slow_down_ms = max(0.0, ms)
        return web.json_response({"success": True})

    async def configure_logging(self, request: web.Request) -> web.Response:
        import logging as _logging

        body = await request.json()
        level = body.get("log_level")
        if level:
            _logging.getLogger("sglang_fluentllm_tpu").setLevel(
                level.upper()
            )
        return web.json_response({"success": True})

    async def generate_from_file(self, request: web.Request) -> web.Response:
        """Multipart upload: file field 'file' holds the prompt text
        (reference /generate_from_file)."""
        reader = await request.multipart()
        text = None
        sp = {}
        async for part in reader:
            if part.name == "file":
                text = (await part.read()).decode("utf-8")
            elif part.name == "sampling_params":
                import json as _json

                sp = _json.loads((await part.read()).decode("utf-8"))
        if text is None:
            return _error("file field required")
        try:
            out = await self.engine.generate(
                prompt=text, sampling_params=sp
            )
        except ValueError as e:
            return _error(str(e))
        return web.json_response(self._strip(out))

    async def start_expert_record(self, request: web.Request) -> web.Response:
        rec = self.engine.runner.expert_recorder
        if rec is None:
            return _error("--enable-expert-distribution-recorder required")
        rec.start()
        return web.json_response({"success": True})

    async def stop_expert_record(self, request: web.Request) -> web.Response:
        rec = self.engine.runner.expert_recorder
        if rec is None:
            return _error("--enable-expert-distribution-recorder required")
        rec.stop()
        return web.json_response({"success": True})

    async def dump_expert_record(self, request: web.Request) -> web.Response:
        rec = self.engine.runner.expert_recorder
        if rec is None:
            return _error("--enable-expert-distribution-recorder required")
        return web.json_response(rec.dump())

    async def get_model(self, request: web.Request) -> web.Response:
        name = request.match_info["model"]
        served = self.engine.server_args.served_model_name
        if name != served:
            return _error(f"model {name} not found", 404)
        return web.json_response(ModelCard(id=served).model_dump())

    async def cancel_response(self, request: web.Request) -> web.Response:
        rid = request.match_info["response_id"]
        resp = await self.openai.cancel_response(rid)
        if resp is not None:
            return web.json_response(resp.model_dump(exclude_none=True))
        # not in the store: abort a possibly in-flight bare request
        self.engine.abort_request(rid)
        return web.json_response({"id": rid, "object": "response",
                                  "status": "cancelled"})

    async def release_memory(self, request: web.Request) -> web.Response:
        ok, msg = await self.engine.release_memory_occupation()
        return web.json_response({"success": ok, "message": str(msg)},
                                 status=200 if ok else 503)

    async def resume_memory(self, request: web.Request) -> web.Response:
        ok, msg = await self.engine.resume_memory_occupation()
        return web.json_response({"success": ok, "message": str(msg)})

    async def get_trace(self, request: web.Request) -> web.Response:
        if self.engine.tracer is None:
            return _error("tracing not enabled (--enable-trace)")
        body = await request.json()
        tr = self.engine.tracer.get(body.get("rid", ""))
        if tr is None:
            return _error("unknown rid", 404)
        return web.json_response(tr)

    # ------------------------------------------------------------------
    # PD disaggregation (reference disaggregation/ HTTP plane)
    # ------------------------------------------------------------------
    def _pd(self):
        if self.engine.pd is None:
            raise web.HTTPBadRequest(
                text="server not in a disaggregation mode"
            )
        return self.engine.pd

    async def pd_start(self, request: web.Request) -> web.Response:
        body = await request.json()
        out = await self._pd().start_room(
            body["room"], body["input_ids"],
            body.get("sampling_params") or {},
        )
        return web.json_response(out)

    async def pd_prefill(self, request: web.Request) -> web.Response:
        body = await request.json()
        out = await self._pd().prefill(
            body["room"], body["input_ids"],
            body.get("sampling_params") or {},
            body.get("decode_url"),
            body.get("decode_prefix_len", 0),
        )
        return web.json_response(
            out, status=200 if out.get("success") else 500
        )

    async def pd_receive_kv(self, request: web.Request) -> web.Response:
        data = await request.read()
        out = await self._pd().receive_kv(data)
        return web.json_response(
            out, status=200 if out.get("success") else 400
        )

    async def pd_heartbeat(self, request: web.Request) -> web.Response:
        body = await request.json()
        out = self._pd().heartbeat(body["room"])
        return web.json_response(
            out, status=200 if out.get("success") else 404
        )

    async def pd_result(self, request: web.Request) -> web.Response:
        body = await request.json()
        out = await self._pd().wait_result(
            body["room"],
            timeout=float(body.get("timeout", 600.0)),
            stall_ttl=float(body.get("stall_ttl", 60.0)),
        )
        if out is None or "error" in (out or {}):
            return web.json_response(out or {}, status=500)
        return web.json_response(self._strip(out))

    # ------------------------------------------------------------------
    async def list_models(self, request: web.Request) -> web.Response:
        ml = ModelList(data=[
            ModelCard(id=self.engine.server_args.served_model_name)
        ])
        return web.json_response(ml.model_dump())

    async def v1_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            req = CompletionRequest(**(await request.json()))
        except Exception as e:  # noqa: BLE001
            return _error(f"invalid request: {e}")
        try:
            if req.stream:
                resp = _sse_response()
                await resp.prepare(request)
                async for chunk in self.openai.completion_stream(req):
                    await resp.write(chunk.encode())
                await resp.write_eof()
                return resp
            out = await self.openai.completion(req)
            return web.json_response(out.model_dump(exclude_none=True))
        except ValueError as e:
            return _error(str(e))

    async def v1_chat_completions(
        self, request: web.Request
    ) -> web.StreamResponse:
        try:
            req = ChatCompletionRequest(**(await request.json()))
        except Exception as e:  # noqa: BLE001
            return _error(f"invalid request: {e}")
        try:
            if req.stream:
                resp = _sse_response()
                await resp.prepare(request)
                async for chunk in self.openai.chat_completion_stream(req):
                    await resp.write(chunk.encode())
                await resp.write_eof()
                return resp
            out = await self.openai.chat_completion(req)
            return web.json_response(out.model_dump(exclude_none=True))
        except ValueError as e:
            return _error(str(e))

    async def v1_score(self, request: web.Request) -> web.Response:
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ScoringRequest,
        )

        try:
            req = ScoringRequest(**(await request.json()))
        except Exception as e:  # noqa: BLE001
            return _error(f"invalid request: {e}")
        try:
            out = await self.openai.score(req)
            return web.json_response(out.model_dump(exclude_none=True))
        except (ValueError, AssertionError, RuntimeError) as e:
            return _error(str(e))

    async def v1_rerank(self, request: web.Request) -> web.Response:
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            V1RerankReqInput,
        )

        try:
            req = V1RerankReqInput(**(await request.json()))
        except Exception as e:  # noqa: BLE001
            return _error(f"invalid request: {e}")
        try:
            out = await self.openai.rerank(req)
            return web.json_response(
                [r.model_dump(exclude_none=True) for r in out]
            )
        except (ValueError, AssertionError, RuntimeError) as e:
            return _error(str(e))

    async def v1_responses(
        self, request: web.Request
    ) -> web.StreamResponse:
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        try:
            req = ResponsesRequest(**(await request.json()))
        except Exception as e:  # noqa: BLE001
            return _error(f"invalid request: {e}")
        try:
            if req.stream:
                resp = _sse_response()
                await resp.prepare(request)
                async for chunk in self.openai.responses_stream(req):
                    await resp.write(chunk.encode())
                await resp.write_eof()
                return resp
            out = await self.openai.responses(req)
            return web.json_response(out.model_dump(exclude_none=True))
        except (ValueError, AssertionError) as e:
            return _error(str(e))

    async def v1_get_response(self, request: web.Request) -> web.Response:
        rid = request.match_info["response_id"]
        resp = self.openai.get_response(rid)
        if resp is None:
            return _error(f"response {rid} not found", 404)
        return web.json_response(resp.model_dump(exclude_none=True))


def launch_server(server_args: ServerArgs):
    """Build the engine, warm it up, serve until interrupted
    (reference http_server.py:998 launch_server)."""
    from sglang_fluentllm_tpu.utils import configure_logger

    configure_logger(server_args.log_level)
    # SIGUSR1 -> all-thread stack dump to stderr (reference engine.py:654
    # installs a SIGQUIT handler for the same hang-diagnosis purpose)
    import faulthandler
    import signal as _signal

    try:
        faulthandler.register(_signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):
        pass
    if server_args.nnodes > 1 and server_args.node_rank > 0:
        # non-entry ranks replay rank 0's step stream (multi-host SPMD;
        # parallel/multihost.py)
        from sglang_fluentllm_tpu.parallel.multihost import run_follower

        run_follower(server_args)
        return
    if server_args.disaggregation_mode == "colocated":
        # one-process 1P1D pair on disjoint submeshes; /generate runs
        # prefill -> device-to-device KV transfer -> decode continuation
        # (disagg/colocated.py). The decode engine is the primary: all
        # non-generate surfaces (OpenAI routes, admin, metrics) serve
        # from it.
        import dataclasses

        import jax
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        from sglang_fluentllm_tpu.disagg.colocated import (
            ColocatedPDManager,
        )

        devs = jax.devices()
        # --tp-size is the PER-ENGINE width: prefill takes the first tp
        # devices, decode the next tp (same device on a 1-chip box)
        tp = server_args.tp_size
        if len(devs) >= 2 * tp:
            p_devs, d_devs = devs[:tp], devs[tp:2 * tp]
        else:
            assert tp <= len(devs), (
                f"colocated PD needs tp={tp} devices, have {len(devs)}")
            p_devs = d_devs = devs[:tp]
            logger.warning(
                "colocated PD: %d device(s) < 2*tp — prefill and decode "
                "share a mesh (transfer still exercises the device path)",
                len(devs))

        def _mk(ds):
            return _Mesh(_np.asarray(ds).reshape(1, len(ds)),
                         ("dp", "tp"))

        sa_d = dataclasses.replace(
            server_args, disaggregation_mode="null")
        # metrics register process-global Prometheus series; only the
        # primary (decode) engine owns them — a second registration from
        # the prefill engine would collide
        sa_p = dataclasses.replace(
            server_args, disaggregation_mode="null",
            enable_metrics=False)
        engine = AsyncEngine(sa_d, mesh=_mk(d_devs))
        prefill_engine = AsyncEngine(sa_p, mesh=_mk(p_devs))
        engine.colocated_pd = ColocatedPDManager(prefill_engine, engine)
    else:
        engine = AsyncEngine(server_args)
    server = HttpServer(engine)

    async def _on_startup(app):
        if server_args.warmups:
            from sglang_fluentllm_tpu.entrypoints.warmup import (
                execute_warmups,
            )

            await execute_warmups(server_args.warmups, engine)
        logger.info(
            "server ready on http://%s:%d", server_args.host,
            server_args.port,
        )

    server.app.on_startup.append(_on_startup)
    try:
        web.run_app(
            server.app,
            host=server_args.host,
            port=server_args.port,
            print=None,
            handle_signals=True,
        )
    finally:
        if engine.colocated_pd is not None:
            engine.colocated_pd.shutdown()  # both engines of the pair
        else:
            engine.shutdown()
