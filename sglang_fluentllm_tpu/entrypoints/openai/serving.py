"""OpenAI-compatible serving handlers (chat + completions).

Analog of the reference's ``entrypoints/openai/serving_chat.py``
(``OpenAIServingChat:52`` — template application, sampling-param build,
streaming deltas) and ``serving_completions.py``, built on AsyncEngine.
"""

from __future__ import annotations


import json
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional

from sglang_fluentllm_tpu.entrypoints.async_engine import AsyncEngine
from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
    ChatCompletionChoice,
    ChatCompletionRequest,
    ChatCompletionResponse,
    ChatCompletionStreamChoice,
    ChatCompletionStreamResponse,
    ChatMessage,
    CompletionChoice,
    CompletionRequest,
    CompletionResponse,
    DeltaMessage,
    RerankResponse,
    ResponseOutputMessage,
    ResponseOutputText,
    ResponsesRequest,
    ResponsesResponse,
    ResponsesUsage,
    ScoringRequest,
    ScoringResponse,
    UsageInfo,
    V1RerankReqInput,
    finish_reason_to_openai,
)


def _usage(meta: Dict[str, Any]) -> UsageInfo:
    pt = meta.get("prompt_tokens", 0)
    ct = meta.get("completion_tokens", 0)
    u = UsageInfo(prompt_tokens=pt, completion_tokens=ct,
                  total_tokens=pt + ct)
    cached = meta.get("cached_tokens", 0)
    if cached:
        u.prompt_tokens_details = {"cached_tokens": cached}
    return u


class OpenAIServing:
    def __init__(self, engine: AsyncEngine):
        self.engine = engine
        self.model_name = engine.server_args.served_model_name
        # centralized template resolution (reference template_manager.py)
        from sglang_fluentllm_tpu.parser.template_manager import TemplateManager

        self.template_manager = TemplateManager()
        ct = getattr(engine.server_args, "chat_template", None)
        self.template_manager.initialize(
            tokenizer=getattr(engine, "tokenizer", None),
            # harmony/longcat have dedicated prompt builders below, not
            # conversation templates
            chat_template=(ct if ct not in (None, "harmony", "gpt-oss",
                                            "longcat") else None),
            completion_template=getattr(
                engine.server_args, "completion_template", None),
        )
        # responses-API store: response_id -> {response, messages, task}
        self._response_store: Dict[str, Dict[str, Any]] = {}
        # server-side tool execution (reference tool_server.py)
        from sglang_fluentllm_tpu.entrypoints.openai.tool_server import (
            build_tool_server,
        )

        self.tool_server = build_tool_server(
            getattr(engine.server_args, "tool_server", None)
        )

    # ------------------------------------------------------------------
    def _apply_chat_template(self, request: ChatCompletionRequest) -> List[int]:
        tok = self.engine.tokenizer
        assert tok is not None, "chat API requires a tokenizer"
        if not request.messages:
            raise ValueError("messages must be non-empty")
        messages = []
        for m in request.messages:
            d: Dict[str, Any] = {"role": m.role, "content": m.content}
            if m.tool_calls:
                d["tool_calls"] = [tc.model_dump() for tc in m.tool_calls]
            if m.tool_call_id:
                d["tool_call_id"] = m.tool_call_id
            if m.name:
                d["name"] = m.name
            messages.append(d)
        if self.engine.server_args.chat_template in ("harmony",
                                                     "gpt-oss"):
            from sglang_fluentllm_tpu.entrypoints.openai import harmony

            text = harmony.render_conversation(
                messages,
                tools=([t.model_dump() for t in request.tools]
                       if request.tools else None),
            )
            return tok.encode(text)
        if self.engine.server_args.chat_template == "longcat":
            from sglang_fluentllm_tpu.entrypoints.openai import (
                longcat_prompt,
            )

            text = longcat_prompt.build_input(
                messages,
                tools=([t.model_dump() for t in request.tools]
                       if request.tools else None),
                tool_choice=(request.tool_choice.model_dump()
                             if hasattr(request.tool_choice, "model_dump")
                             else request.tool_choice),
            )
            return tok.encode(text)
        # named conversation template (built-in or loaded from .json).
        # When tools are in play the named template cannot carry them
        # (Conversation.render has no tool slots) — fall through to the
        # tokenizer jinja path, which forwards tool definitions/results
        # (reference serving_chat.py passes tools to apply_chat_template).
        if self._named_template_applies(request):
            rendered = self.template_manager.resolve_chat(messages)
            if rendered is not None:
                return tok.encode(rendered)
        kwargs: Dict[str, Any] = {}
        if self.template_manager.custom_jinja is not None:
            kwargs["chat_template"] = self.template_manager.custom_jinja
        if request.tools:
            kwargs["tools"] = [t.model_dump() for t in request.tools]
        try:
            return tok.apply_chat_template(
                messages, add_generation_prompt=True, tokenize=True, **kwargs
            )
        except Exception:
            # no chat template: simple role-prefixed fallback
            text = "".join(
                f"{m['role']}: {m['content']}\n" for m in messages
            ) + "assistant:"
            return tok.encode(text)

    # ------------------------------------------------------------------
    def _named_template_applies(self, request: ChatCompletionRequest) -> bool:
        """A named conversation template handles this request only when
        no tool context is present (tools / tool_calls / tool-role
        messages have no slots in Conversation.render)."""
        if self.template_manager.chat_template_name is None:
            return False
        if request.tools:
            return False
        return not any(
            m.tool_calls or m.tool_call_id or m.role == "tool"
            for m in request.messages
        )

    def _merge_template_stops(self, request, sp):
        """Add the active conversation template's stop_str to the request
        stops (reference serving_chat.py:376 copies conv.stop_str), so a
        model whose tokenizer EOS differs from the template stop token
        still terminates at the turn boundary."""
        if not self._named_template_applies(request):
            return sp
        stops = self.template_manager.stop_strings()
        if not stops:
            return sp
        cur = sp.get("stop") or []
        if isinstance(cur, str):
            cur = [cur]
        merged = list(cur) + [s for s in stops if s not in cur]
        sp = dict(sp)
        sp["stop"] = merged
        return sp

    def _apply_tool_constraint(self, request, sp):
        """tool_choice='required'/{function}: constrain sampling to a
        syntactically valid call of an allowed tool (reference
        ebnf_composer role, over the in-house grammar engine)."""
        if not request.tools or sp.get("regex") or sp.get("json_schema"):
            return sp
        from sglang_fluentllm_tpu.function_call.tool_constraint import (
            tool_call_constraint,
        )

        tc = request.tool_choice
        tc = tc.model_dump() if hasattr(tc, "model_dump") else tc
        pattern = tool_call_constraint(
            request.tools, self.engine.server_args.tool_call_parser, tc
        )
        if pattern is not None:
            sp = dict(sp)
            sp["regex"] = pattern
        return sp

    async def chat_completion(self, request: ChatCompletionRequest):
        input_ids = self._apply_chat_template(request)
        sp = self._apply_tool_constraint(
            request, request.to_sampling_params()
        )
        sp = self._merge_template_stops(request, sp)
        n = max(1, request.n)
        import asyncio

        outs = await asyncio.gather(*[
            self.engine.generate(input_ids=input_ids, sampling_params=sp)
            for _ in range(n)
        ])
        choices = [
            self._one_chat_choice(request, out, i)
            for i, out in enumerate(outs)
        ]
        total = UsageInfo()
        for out in outs:
            meta = out["meta_info"]
            total.prompt_tokens = meta["prompt_tokens"]
            total.completion_tokens += meta["completion_tokens"]
        total.total_tokens = total.prompt_tokens + total.completion_tokens
        cached = outs[0]["meta_info"].get("cached_tokens", 0)
        if cached:
            total.prompt_tokens_details = {"cached_tokens": cached}
        return ChatCompletionResponse(
            model=request.model or self.model_name,
            choices=choices,
            usage=total,
        )

    def _one_chat_choice(self, request, out, index):
        meta = out["meta_info"]
        text = out["text"]
        finish = finish_reason_to_openai(meta["finish_reason"])

        # reasoning split (parser/reasoning_parser.py)
        reasoning = None
        rp_name = self.engine.server_args.reasoning_parser
        if rp_name:
            from sglang_fluentllm_tpu.parser.reasoning_parser import (
                ReasoningParser,
            )

            parsed = ReasoningParser(
                implicit_open=(rp_name == "deepseek_r1")
            ).parse_full(text)
            reasoning = parsed.reasoning or None
            text = parsed.content

        # tool-call extraction (function_call/parser.py)
        tool_calls = None
        if self.engine.server_args.chat_template in ("harmony",
                                                     "gpt-oss"):
            from sglang_fluentllm_tpu.entrypoints.openai import harmony

            parsed = harmony.parse_output(text)
            text = parsed.get("content")
            reasoning = parsed.get("reasoning_content") or reasoning
            if parsed.get("tool_calls"):
                import uuid as _uuid

                from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
                    FunctionCall,
                    ToolCall,
                )

                tool_calls = [
                    ToolCall(
                        id=f"call_{_uuid.uuid4().hex[:24]}",
                        index=i,
                        function=FunctionCall(
                            name=c["function"]["name"],
                            arguments=c["function"]["arguments"]),
                    )
                    for i, c in enumerate(parsed["tool_calls"])
                ]
                finish = "tool_calls"
        elif (self.engine.server_args.chat_template == "longcat"
                and request.tools and request.tool_choice != "none"):
            from sglang_fluentllm_tpu.entrypoints.openai import (
                longcat_prompt,
            )

            parsed = longcat_prompt.parse_response(
                text,
                tool_choice=(request.tool_choice.model_dump()
                             if hasattr(request.tool_choice, "model_dump")
                             else request.tool_choice),
            )
            text = parsed.get("content")
            reasoning = parsed.get("reasoning_content") or reasoning
            if parsed.get("tool_calls"):
                import uuid as _uuid

                from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
                    FunctionCall,
                    ToolCall,
                )

                tool_calls = [
                    ToolCall(
                        id=f"call_{_uuid.uuid4().hex[:24]}",
                        index=i,
                        function=FunctionCall(
                            name=c["function"]["name"],
                            arguments=(
                                c["function"]["arguments"]
                                if isinstance(c["function"]["arguments"],
                                              str)
                                else __import__("json").dumps(
                                    c["function"]["arguments"])),
                        ),
                    )
                    for i, c in enumerate(parsed["tool_calls"])
                    if c.get("type") == "function"
                ]
                finish = "tool_calls"
        elif request.tools and request.tool_choice != "none":
            from sglang_fluentllm_tpu.function_call.parser import (
                FunctionCallParser,
            )

            parser = FunctionCallParser(
                request.tools,
                self.engine.server_args.tool_call_parser,
            )
            if parser.has_tool_call(text):
                text, items = parser.parse_non_stream(text)
                if items:
                    import uuid as _uuid

                    from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
                        FunctionCall,
                        ToolCall,
                    )

                    tool_calls = [
                        ToolCall(
                            id=f"call_{_uuid.uuid4().hex[:24]}",
                            index=it.tool_index,
                            function=FunctionCall(
                                name=it.name, arguments=it.parameters
                            ),
                        )
                        for it in items
                    ]
                    finish = "tool_calls"

        return ChatCompletionChoice(
            index=index,
            message=ChatMessage(
                role="assistant",
                content=text or None,
                reasoning_content=reasoning,
                tool_calls=tool_calls,
            ),
            finish_reason=finish,
            logprobs=self._logprobs_dict(meta) if request.logprobs else None,
        )

    async def chat_completion_stream(
        self, request: ChatCompletionRequest
    ) -> AsyncIterator[str]:
        input_ids = self._apply_chat_template(request)
        sp = self._apply_tool_constraint(
            request, request.to_sampling_params()
        )
        sp = self._merge_template_stops(request, sp)
        rid = f"chatcmpl-{uuid.uuid4().hex}"
        first = True
        last_meta = None
        # streaming tool-call parsing (reference serving_chat.py:911-1073):
        # text streams until a tool-call trigger, then buffers and emits
        # structured tool_call deltas when each call completes
        tool_parser = None
        saw_tool_call = False
        if request.tools and request.tool_choice != "none":
            from sglang_fluentllm_tpu.function_call.parser import (
                FunctionCallParser,
            )

            try:
                tool_parser = FunctionCallParser(
                    request.tools,
                    self.engine.server_args.tool_call_parser,
                )
            except ValueError:
                tool_parser = None

        def _mk(delta, fr=None):
            return ChatCompletionStreamResponse(
                id=rid,
                model=request.model or self.model_name,
                choices=[ChatCompletionStreamChoice(
                    index=0, delta=delta, finish_reason=fr,
                )],
            )

        def _tool_deltas(calls):
            out = []
            for it in calls:
                out.append(DeltaMessage(tool_calls=[{
                    "index": it.tool_index,
                    "id": f"call_{uuid.uuid4().hex[:16]}",
                    "type": "function",
                    "function": {"name": it.name,
                                 "arguments": it.parameters},
                }]))
            return out

        async for chunk in self.engine.generate_stream(
            input_ids=input_ids, sampling_params=sp, rid=rid
        ):
            last_meta = chunk["meta_info"]
            deltas = []
            if tool_parser is not None:
                r = tool_parser.parse_stream_chunk(chunk["delta_text"])
                if r.normal_text:
                    deltas.append(DeltaMessage(content=r.normal_text))
                if r.calls:
                    saw_tool_call = True
                    deltas.extend(_tool_deltas(r.calls))
            else:
                deltas.append(DeltaMessage(content=chunk["delta_text"]))
            finished = chunk["meta_info"]["finish_reason"]
            if finished and tool_parser is not None:
                r = tool_parser.parse_stream_final()
                if r.normal_text:
                    deltas.append(DeltaMessage(content=r.normal_text))
                if r.calls:
                    saw_tool_call = True
                    deltas.extend(_tool_deltas(r.calls))
            fr = None
            if finished:
                fr = ("tool_calls" if saw_tool_call else
                      finish_reason_to_openai(last_meta["finish_reason"]))
            if not deltas:
                deltas = [DeltaMessage(content="")]
            for i, delta in enumerate(deltas):
                if first:
                    delta.role = "assistant"
                    first = False
                resp = _mk(
                    delta, fr if i == len(deltas) - 1 else None
                )
                yield (
                    f"data: {resp.model_dump_json(exclude_none=True)}\n\n"
                )
        if (request.stream_options or {}).get("include_usage") and last_meta:
            usage_resp = ChatCompletionStreamResponse(
                id=rid, model=request.model or self.model_name, choices=[],
                usage=_usage(last_meta),
            )
            yield f"data: {usage_resp.model_dump_json(exclude_none=True)}\n\n"
        yield "data: [DONE]\n\n"

    # ------------------------------------------------------------------
    def _normalize_prompts(self, request: CompletionRequest):
        p = request.prompt
        if request.suffix and isinstance(p, (str, list)):
            # FIM code completion (ref code_completion_parser.py:77-84)
            fim = self.template_manager.fim_prompt
            if isinstance(p, str):
                p = fim(p, request.suffix)
            elif p and isinstance(p[0], str):
                p = [fim(x, request.suffix) for x in p]
        if isinstance(p, str):
            return [("text", p)]
        if isinstance(p, list) and p and isinstance(p[0], int):
            return [("ids", p)]
        if isinstance(p, list) and p and isinstance(p[0], str):
            return [("text", x) for x in p]
        if isinstance(p, list) and p and isinstance(p[0], list):
            return [("ids", x) for x in p]
        return [("text", str(p))]

    async def completion(self, request: CompletionRequest):
        prompts = self._normalize_prompts(request)
        sp = request.to_sampling_params()
        n = max(1, request.n)
        choices = []
        total = UsageInfo()
        import asyncio

        async def one(i, kind, p):
            kwargs = {"prompt": p} if kind == "text" else {"input_ids": p}
            return i, await self.engine.generate(
                sampling_params=sp, **kwargs
            )

        # n samples per prompt; choice order is prompt-major (OpenAI)
        results = await asyncio.gather(*[
            one(i * n + j, k, p)
            for i, (k, p) in enumerate(prompts)
            for j in range(n)
        ])
        for i, out in sorted(results):
            meta = out["meta_info"]
            text = out["text"]
            pi = i // n
            if request.echo and prompts[pi][0] == "text":
                text = prompts[pi][1] + text
            choices.append(CompletionChoice(
                index=i,
                text=text,
                finish_reason=finish_reason_to_openai(meta["finish_reason"]),
                logprobs=self._logprobs_dict(meta)
                if request.logprobs is not None else None,
            ))
            total.prompt_tokens += meta["prompt_tokens"]
            total.completion_tokens += meta["completion_tokens"]
        total.total_tokens = total.prompt_tokens + total.completion_tokens
        return CompletionResponse(
            model=request.model or self.model_name,
            choices=choices,
            usage=total,
        )

    async def completion_stream(
        self, request: CompletionRequest
    ) -> AsyncIterator[str]:
        prompts = self._normalize_prompts(request)
        kind, p = prompts[0]
        sp = request.to_sampling_params()
        rid = f"cmpl-{uuid.uuid4().hex}"
        kwargs = {"prompt": p} if kind == "text" else {"input_ids": p}
        last_meta = None
        async for chunk in self.engine.generate_stream(
            sampling_params=sp, rid=rid, **kwargs
        ):
            last_meta = chunk["meta_info"]
            fr = finish_reason_to_openai(last_meta["finish_reason"]) \
                if last_meta["finish_reason"] else None
            resp = CompletionResponse(
                id=rid,
                object="text_completion",
                model=request.model or self.model_name,
                choices=[CompletionChoice(
                    index=0, text=chunk["delta_text"], finish_reason=fr
                )],
            )
            yield f"data: {resp.model_dump_json(exclude_none=True)}\n\n"
        if (request.stream_options or {}).get("include_usage") and last_meta:
            resp = CompletionResponse(
                id=rid, model=request.model or self.model_name, choices=[],
                usage=_usage(last_meta),
            )
            yield f"data: {resp.model_dump_json(exclude_none=True)}\n\n"
        yield "data: [DONE]\n\n"

    # ------------------------------------------------------------------
    async def score(self, request: ScoringRequest) -> ScoringResponse:
        """/v1/score (reference serving_score.py:16)."""
        scores = await self.engine.score(
            query=request.query,
            items=request.items,
            label_token_ids=request.label_token_ids,
            apply_softmax=request.apply_softmax,
            item_first=request.item_first,
        )
        return ScoringResponse(
            scores=scores, model=request.model or self.model_name
        )

    async def rerank(self, request: V1RerankReqInput) -> List[RerankResponse]:
        """/v1/rerank (reference serving_rerank.py:47). The reference routes
        query/doc pairs through a cross-encoder embedding request; with no
        cross-encoder head in the zoo the TPU-native analog scores each
        document by cosine similarity of pooled (L2-normalized) query/doc
        embeddings from the same model."""
        if not request.query or not request.query.strip():
            raise ValueError("query cannot be empty")
        if not request.documents or any(
            not d or not d.strip() for d in request.documents
        ):
            raise ValueError("each document must be a non-empty string")
        embs = await self.engine.encode(
            prompt=[request.query] + list(request.documents)
        )
        q = embs[0]
        out = []
        for idx, (doc, e) in enumerate(zip(request.documents, embs[1:])):
            score = float(sum(a * b for a, b in zip(q, e)))
            out.append(RerankResponse(
                score=score, document=doc, index=idx,
            ))
        out.sort(key=lambda r: r.score, reverse=True)
        return out

    # ------------------------------------------------------------------
    # responses API (reference serving_responses.py subset: create +
    # retrieve + previous_response_id chaining + streaming deltas)
    # ------------------------------------------------------------------
    def _responses_messages(self, request: ResponsesRequest):
        msgs: List[Dict[str, Any]] = []
        if request.previous_response_id:
            prev = self._response_store.get(request.previous_response_id)
            if prev is None:
                raise ValueError(
                    f"previous response {request.previous_response_id} "
                    "not found"
                )
            msgs.extend(prev["messages"])
        if request.instructions:
            msgs.append({"role": "system", "content": request.instructions})
        if isinstance(request.input, str):
            msgs.append({"role": "user", "content": request.input})
        else:
            for item in request.input:
                if item.get("type") == "function_call_output":
                    # client-executed tool result continuing a previous
                    # response's function_call item
                    msgs.append({
                        "role": "tool",
                        "tool_call_id": item.get("call_id", ""),
                        "content": item.get("output", ""),
                    })
                    continue
                if item.get("type") == "function_call":
                    msgs.append({
                        "role": "assistant",
                        "content": "",
                        "tool_calls": [{
                            "id": item.get("call_id", ""),
                            "type": "function",
                            "function": {
                                "name": item.get("name", ""),
                                "arguments": item.get("arguments", ""),
                            },
                        }],
                    })
                    continue
                role = item.get("role", "user")
                content = item.get("content", "")
                if isinstance(content, list):
                    content = "".join(
                        c.get("text", "") for c in content
                        if isinstance(c, dict)
                    )
                msgs.append({"role": role, "content": content})
        return msgs

    def _responses_ids(self, msgs, tools=None) -> List[int]:
        tok = self.engine.tokenizer
        assert tok is not None, "responses API requires a tokenizer"
        try:
            kw = {"tools": tools} if tools else {}
            return tok.apply_chat_template(
                msgs, add_generation_prompt=True, tokenize=True, **kw
            )
        except Exception:
            text = "".join(
                f"{m['role']}: {m.get('content', '')}\n" for m in msgs
            ) + "assistant:"
            return tok.encode(text)

    MAX_TOOL_ITERS = 8

    def _responses_tools(self, request: ResponsesRequest):
        """Merged tool specs: request function tools + server-side tools
        (reference tool_server integration)."""
        tools = [
            t for t in (request.tools or []) if isinstance(t, dict)
        ]
        if self.tool_server is not None:
            have = {t.get("function", {}).get("name") for t in tools}
            tools += [
                t for t in self.tool_server.list_tools()
                if t["function"]["name"] not in have
            ]
        return tools

    async def _responses_core(self, request: ResponsesRequest,
                              resp: ResponsesResponse,
                              msgs: List[Dict[str, Any]],
                              store_entry: Optional[Dict[str, Any]]):
        """Unified Responses engine loop as an event generator
        (reference serving_responses.py responses_full_generator +
        _generate_with_builtin_tools): generate; surface function_call
        items; execute server-side tools and continue; finish with the
        assistant message. Yields (event_kind, payload)."""
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponseFunctionToolCall,
            ResponseFunctionToolCallOutput,
        )

        tools = self._responses_tools(request)
        sp = request.to_sampling_params()
        total_in = total_out = 0
        want_tools = bool(tools) and request.tool_choice != "none"
        max_iters = (request.max_tool_calls
                     or self.MAX_TOOL_ITERS) if want_tools else 1
        for it in range(max_iters):
            parser = None
            if want_tools:
                from sglang_fluentllm_tpu.function_call.parser import (
                    FunctionCallParser,
                )

                parser = FunctionCallParser(
                    tools, self.engine.server_args.tool_call_parser
                )
            rid = resp.id if it == 0 else f"{resp.id}:t{it}"
            if store_entry is not None:
                store_entry["current_rid"] = rid
            text_parts: List[str] = []
            last_meta = None
            emitted_calls = 0
            async for chunk in self.engine.generate_stream(
                input_ids=self._responses_ids(msgs, tools or None),
                sampling_params=sp,
                rid=rid,
            ):
                last_meta = chunk["meta_info"]
                d = chunk["delta_text"]
                if not d:
                    continue
                text_parts.append(d)
                if parser is None:
                    yield ("response.output_text.delta",
                           {"item_id": resp.id, "delta": d})
                    continue
                res = parser.parse_stream_chunk(d)
                if res.normal_text:
                    yield ("response.output_text.delta",
                           {"item_id": resp.id,
                            "delta": res.normal_text})
                for call in res.calls:
                    if call.name:
                        emitted_calls += 1
                        yield ("response.output_item.added",
                               {"item": {"type": "function_call",
                                         "name": call.name}})
                    if call.parameters:
                        yield ("response.function_call_arguments.delta",
                               {"delta": call.parameters})
            full = "".join(text_parts)
            if last_meta:
                total_in += last_meta["prompt_tokens"]
                total_out += last_meta["completion_tokens"]
                resp.usage = ResponsesUsage(
                    input_tokens=total_in, output_tokens=total_out,
                    total_tokens=total_in + total_out,
                )
            calls = []
            normal_text = full
            if parser is not None and parser.has_tool_call(full):
                normal_text, calls = parser.parse_non_stream(full)
            if not calls:
                msg = ResponseOutputMessage(
                    content=[ResponseOutputText(text=normal_text)],
                )
                resp.output.append(msg)
                msgs.append({"role": "assistant", "content": full})
                resp.status = "completed"
                yield ("response.output_item.done",
                       {"item": msg.model_dump(exclude_none=True)})
                return
            # tool-call turn: record items; execute server-side tools
            msgs.append({"role": "assistant", "content": full})
            client_executed = False
            for call in calls:
                item = ResponseFunctionToolCall(
                    name=call.name or "",
                    arguments=call.parameters or "",
                )
                resp.output.append(item)
                yield ("response.output_item.done",
                       {"item": item.model_dump(exclude_none=True)})
                if (self.tool_server is not None
                        and self.tool_server.has_tool(item.name)):
                    try:
                        args = json.loads(item.arguments or "{}")
                    except Exception:  # noqa: BLE001
                        args = {}
                    result = await self.tool_server.execute(
                        item.name, args
                    )
                    out_item = ResponseFunctionToolCallOutput(
                        call_id=item.call_id, output=result,
                    )
                    resp.output.append(out_item)
                    msgs.append({
                        "role": "tool", "name": item.name,
                        "tool_call_id": item.call_id,
                        "content": result,
                    })
                    yield ("response.output_item.done",
                           {"item": out_item.model_dump(
                               exclude_none=True)})
                else:
                    client_executed = True
            if client_executed:
                # OpenAI semantics: the CLIENT runs function tools and
                # continues via previous_response_id +
                # function_call_output input items
                resp.status = "completed"
                return
        resp.status = "completed"

    def _responses_store(self, request, resp, msgs, entry=None):
        if request.store:
            e = entry if entry is not None else {}
            e.update({"response": resp, "messages": msgs})
            self._response_store[resp.id] = e
            return e
        return entry

    async def responses(self, request: ResponsesRequest) -> ResponsesResponse:
        if request.background and not request.store:
            raise ValueError("background mode requires store=true")
        msgs = self._responses_messages(request)
        resp = ResponsesResponse(
            model=request.model or self.model_name,
            status="queued" if request.background else "in_progress",
            previous_response_id=request.previous_response_id,
            instructions=request.instructions,
            metadata=request.metadata,
        )
        entry = self._responses_store(request, resp, msgs, {}) or {
            "response": resp, "messages": msgs}
        if request.background:
            # reference serving_responses.py:268 background mode: return
            # immediately; poll via GET /v1/responses/{id}; cancel via
            # POST .../cancel
            import asyncio

            async def _run():
                resp.status = "in_progress"
                try:
                    async for _ in self._responses_core(
                            request, resp, msgs, entry):
                        pass
                except asyncio.CancelledError:
                    resp.status = "cancelled"
                    raise
                except Exception as e:  # noqa: BLE001
                    resp.status = "failed"
                    resp.error = {"message": str(e)}

            task = asyncio.get_running_loop().create_task(_run())
            entry["task"] = task
            return resp
        async for _ in self._responses_core(request, resp, msgs, entry):
            pass
        return resp

    async def responses_stream(
        self, request: ResponsesRequest
    ) -> AsyncIterator[str]:
        """SSE event stream: response.created -> (output_text.delta |
        output_item.added | function_call_arguments.delta |
        output_item.done)* -> response.completed (OpenAI responses
        event framing, reference responses_stream_generator)."""
        msgs = self._responses_messages(request)
        resp = ResponsesResponse(
            model=request.model or self.model_name, status="in_progress",
            previous_response_id=request.previous_response_id,
            instructions=request.instructions,
            metadata=request.metadata,
        )
        entry = self._responses_store(request, resp, msgs, {}) or {
            "response": resp, "messages": msgs}

        def ev(kind: str, payload: Dict[str, Any]) -> str:
            payload = dict(payload, type=kind)
            return (f"event: {kind}\n"
                    f"data: {json.dumps(payload)}\n\n")

        yield ev("response.created",
                 {"response": resp.model_dump(exclude_none=True)})
        try:
            async for kind, payload in self._responses_core(
                    request, resp, msgs, entry):
                yield ev(kind, payload)
        except Exception as e:  # noqa: BLE001
            resp.status = "failed"
            resp.error = {"message": str(e)}
            yield ev("response.failed",
                     {"response": resp.model_dump(exclude_none=True)})
            return
        yield ev("response.completed",
                 {"response": resp.model_dump(exclude_none=True)})

    def get_response(self, response_id: str) -> Optional[ResponsesResponse]:
        entry = self._response_store.get(response_id)
        return entry["response"] if entry else None

    async def cancel_response(
        self, response_id: str
    ) -> Optional[ResponsesResponse]:
        """Cancel a background response (reference cancel_responses):
        aborts the in-flight generation and marks the store entry."""
        entry = self._response_store.get(response_id)
        if entry is None:
            return None
        resp = entry["response"]
        task = entry.get("task")
        if task is not None and not task.done():
            task.cancel()
            rid = entry.get("current_rid", response_id)
            try:
                self.engine.abort_request(rid)
            except Exception:  # noqa: BLE001
                pass
            resp.status = "cancelled"
        return resp

    def _logprobs_dict(self, meta) -> Optional[Dict[str, Any]]:
        lps = meta.get("output_token_logprobs")
        if lps is None:
            return None
        tok = self.engine.tokenizer

        def _tok(tid):
            return tok.decode([tid]) if tok else str(tid)

        tops = meta.get("output_top_logprobs")
        content = []
        for i, (lp, tid) in enumerate(lps):
            entry = {"token": _tok(tid), "logprob": lp}
            if tops is not None and i < len(tops):
                entry["top_logprobs"] = [
                    {"token": _tok(t), "logprob": v} for v, t in tops[i]
                ]
            content.append(entry)
        return {"content": content}
