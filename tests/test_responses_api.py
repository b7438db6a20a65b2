"""Responses API depth (VERDICT r3 #8, reference serving_responses.py):
background mode, cancel, streamed events, and the server-side tool loop
with function-call round trips.

The tool-loop tests drive OpenAIServing over a SCRIPTED engine so the
model's tool-call emissions are deterministic; the HTTP tests exercise
background/cancel end-to-end against a live server with the tiny model.
"""

import asyncio
import json

import httpx
import pytest

from tests.server_utils import (
    kill_server,
    popen_launch_server,
    write_tiny_tokenizer,
)
from tests.utils import TINY_LLAMA_CFG, write_model_dir

PROMPT_TEXT = "<3> <11> <42>"


# ---------------------------------------------------------------------
# Scripted-engine harness
# ---------------------------------------------------------------------
class _Tok:
    def encode(self, text):
        return [1, 2, 3]

    def apply_chat_template(self, msgs, **kw):
        raise RuntimeError("no template")  # force the fallback path


class _Args:
    served_model_name = "scripted"
    tool_call_parser = "json"
    tool_server = None


class _ScriptedEngine:
    """Yields pre-scripted generation outputs, one script per call."""

    def __init__(self, scripts):
        self.scripts = list(scripts)
        self.server_args = _Args()
        self.tokenizer = _Tok()
        self.aborted = []
        self.calls = 0
        self.delay = 0.0

    async def generate_stream(self, input_ids=None, sampling_params=None,
                              rid=None, **kw):
        text = self.scripts[min(self.calls, len(self.scripts) - 1)]
        self.calls += 1
        # emit in two chunks to exercise incremental parsing
        mid = max(1, len(text) // 2)
        for part, fin in ((text[:mid], False), (text[mid:], True)):
            if self.delay:
                await asyncio.sleep(self.delay)
            yield {
                "delta_text": part,
                "text": text[: mid if not fin else len(text)],
                "meta_info": {"prompt_tokens": len(input_ids or []),
                              "completion_tokens": 4,
                              "finish_reason": {"type": "length"}
                              if fin else None},
                "finished": fin,
                "output_ids": [7, 8, 9, 10],
            }

    def abort_request(self, rid):
        self.aborted.append(rid)


def _serving(scripts, tool_server="demo"):
    from sglang_fluentllm_tpu.entrypoints.openai.serving import (
        OpenAIServing,
    )

    eng = _ScriptedEngine(scripts)
    eng.server_args.tool_server = tool_server
    return OpenAIServing(eng), eng


TOOL_CALL = json.dumps({"name": "add", "arguments": {"a": 2, "b": 40}})
CLIENT_TOOL_CALL = json.dumps(
    {"name": "lookup", "arguments": {"key": "x"}})


class TestToolLoop:
    def test_server_tool_round_trip(self):
        """Model emits a demo-server tool call; the server executes it,
        feeds the result back, and the second turn answers."""
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, eng = _serving([TOOL_CALL, "the answer is 42"])
        out = asyncio.run(srv.responses(ResponsesRequest(
            input="what is 2 + 40?", temperature=0.0)))
        assert out.status == "completed"
        kinds = [o.type for o in out.output]
        assert kinds == ["function_call", "function_call_output",
                         "message"]
        assert out.output[0].name == "add"
        assert out.output[1].output == "42"
        assert out.output[2].content[0].text == "the answer is 42"
        assert eng.calls == 2
        # usage accumulated over both turns
        assert out.usage.output_tokens == 8

    def test_client_tool_round_trip(self):
        """A function tool NOT served by the tool server returns the
        function_call item to the client; the client continues with a
        function_call_output input item chained on the response id."""
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, eng = _serving([CLIENT_TOOL_CALL, "x means hello"],
                            tool_server=None)
        req = ResponsesRequest(
            input="look up x", temperature=0.0,
            tools=[{"type": "function", "function": {
                "name": "lookup", "description": "",
                "parameters": {"type": "object"}}}],
        )
        out1 = asyncio.run(srv.responses(req))
        assert out1.status == "completed"
        assert out1.output[-1].type == "function_call"
        call = out1.output[-1]
        assert call.name == "lookup"
        # client executes and continues
        req2 = ResponsesRequest(
            previous_response_id=out1.id,
            input=[{"type": "function_call_output",
                    "call_id": call.call_id, "output": "hello"}],
            temperature=0.0,
        )
        out2 = asyncio.run(srv.responses(req2))
        assert out2.status == "completed"
        assert out2.output[-1].content[0].text == "x means hello"

    def test_tool_choice_none_skips_parsing(self):
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, eng = _serving([TOOL_CALL])
        out = asyncio.run(srv.responses(ResponsesRequest(
            input="x", temperature=0.0, tool_choice="none")))
        assert out.output[0].type == "message"
        assert eng.calls == 1

    def test_streaming_tool_events(self):
        """SSE stream surfaces output_item events for the tool call, its
        executed output, and the final message."""
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, eng = _serving([TOOL_CALL, "done: 42"])

        async def drain():
            chunks = []
            async for s in srv.responses_stream(ResponsesRequest(
                    input="q", temperature=0.0, stream=True)):
                chunks.append(s)
            return chunks

        chunks = asyncio.run(drain())
        events = [c.split("\n", 1)[0][7:] for c in chunks]
        assert events[0] == "response.created"
        assert events[-1] == "response.completed"
        assert "response.output_item.done" in events
        # the completed payload carries the whole item trail
        final = json.loads(chunks[-1].split("data: ", 1)[1])
        kinds = [o["type"] for o in final["response"]["output"]]
        assert kinds == ["function_call", "function_call_output",
                         "message"]

    def test_demo_tool_server_registry(self):
        from sglang_fluentllm_tpu.entrypoints.openai.tool_server import (
            demo_tool_server,
        )

        srv = demo_tool_server()
        assert srv.has_tool("add") and srv.has_tool("echo")
        specs = {t["function"]["name"] for t in srv.list_tools()}
        assert specs == {"add", "echo"}
        out = asyncio.run(srv.execute("echo", {"text": "hi"}))
        assert out == "hi"


class TestBackgroundInProcess:
    def test_background_runs_and_polls(self):
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, eng = _serving(["slow answer"], tool_server=None)
        eng.delay = 0.05

        async def run():
            out = await srv.responses(ResponsesRequest(
                input="q", temperature=0.0, background=True))
            assert out.status in ("queued", "in_progress")
            # poll until done
            for _ in range(100):
                await asyncio.sleep(0.02)
                got = srv.get_response(out.id)
                if got.status == "completed":
                    return got
            raise AssertionError("never completed")

        got = asyncio.run(run())
        assert got.output[0].content[0].text == "slow answer"

    def test_background_cancel(self):
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, eng = _serving(["never finishes"], tool_server=None)
        eng.delay = 0.5

        async def run():
            out = await srv.responses(ResponsesRequest(
                input="q", temperature=0.0, background=True))
            await asyncio.sleep(0.05)
            got = await srv.cancel_response(out.id)
            assert got.status == "cancelled"
            # the in-flight generation was aborted at the engine
            assert eng.aborted
            return got

        asyncio.run(run())

    def test_background_requires_store(self):
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ResponsesRequest,
        )

        srv, _ = _serving(["x"], tool_server=None)
        with pytest.raises(ValueError, match="store"):
            asyncio.run(srv.responses(ResponsesRequest(
                input="q", background=True, store=False)))


@pytest.fixture(scope="module")
def server():
    model_dir = write_model_dir(TINY_LLAMA_CFG)
    write_tiny_tokenizer(model_dir, TINY_LLAMA_CFG["vocab_size"])
    proc, base_url = popen_launch_server(model_dir)
    yield base_url
    kill_server(proc)


class TestBackgroundHTTP:
    def test_background_e2e(self, server):
        r = httpx.post(server + "/v1/responses", json={
            "model": "test", "input": PROMPT_TEXT,
            "max_output_tokens": 6, "temperature": 0,
            "background": True,
        }, timeout=300)
        assert r.status_code == 200, r.text
        out = r.json()
        assert out["status"] in ("queued", "in_progress")
        rid = out["id"]
        import time as _t

        deadline = _t.time() + 120
        while _t.time() < deadline:
            got = httpx.get(server + f"/v1/responses/{rid}",
                            timeout=60).json()
            if got["status"] == "completed":
                break
            _t.sleep(0.3)
        assert got["status"] == "completed", got
        assert got["output"][0]["content"][0]["text"]
        assert got["usage"]["output_tokens"] == 6

    def test_background_cancel_http(self, server):
        r = httpx.post(server + "/v1/responses", json={
            "model": "test", "input": PROMPT_TEXT,
            "max_output_tokens": 300, "temperature": 0,
            "background": True,
        }, timeout=300)
        rid = r.json()["id"]
        c = httpx.post(server + f"/v1/responses/{rid}/cancel",
                       timeout=60)
        assert c.status_code == 200
        got = c.json()
        assert got["status"] in ("cancelled", "completed")
