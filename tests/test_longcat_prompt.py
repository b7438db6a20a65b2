"""LongCat chat/tool prompt protocol (openai_api/longcat_prompt_builder
parity): TypeScript tool rendering, round markers, emission parsing,
think extraction, and build->parse round-trips."""

import json

from sglang_fluentllm_tpu.entrypoints.openai import longcat_prompt as lp

WEATHER = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get current weather",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"type": "string", "description": "City name"},
                "days": {"type": "integer"},
                "unit": {"type": "string", "enum": ["c", "f"]},
            },
            "required": ["city"],
        },
    },
}


class TestTypescript:
    def test_function_rendering(self):
        ts = lp.functions_to_typescript(WEATHER["function"])
        assert "type get_weather = (_:{" in ts
        assert "city: string" in ts            # required: no '?'
        assert "days?: number" in ts           # optional + integer->number
        assert 'unit?: "c" | "f"' in ts        # enum
        assert "// Get current weather" in ts
        assert "=> any;" in ts

    def test_nested_object_and_array(self):
        fn = {
            "name": "f", "description": "d",
            "parameters": {
                "type": "object",
                "properties": {
                    "items": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "properties": {"id": {"type": "integer"}},
                            "required": ["id"],
                        },
                    },
                },
                "required": [],
            },
        }
        ts = lp.functions_to_typescript(fn)
        assert "items?: {" in ts and "}[]" in ts
        assert "id: number" in ts


class TestBuildInput:
    def test_rounds_and_roles(self):
        msgs = [
            {"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "weather?"},
        ]
        p = lp.build_input(msgs)
        assert "# Messages" in p
        assert "[Round 0] USER:hi" in p
        assert "[Round 1] USER:weather?" in p
        assert "SYSTEM:be brief" in p
        assert p.endswith("ASSISTANT:")

    def test_think_model_generation_prompt(self):
        p = lp.build_input([{"role": "user", "content": "x"}],
                           is_think_model=True)
        assert p.endswith("ASSISTANT:<longcat_think>\n")

    def test_tools_section_and_forced_choice(self):
        p = lp.build_input(
            [{"role": "user", "content": "x"}],
            tools=[WEATHER],
            tool_choice={"type": "function",
                         "function": {"name": "get_weather"}},
        )
        assert "# Tools" in p
        assert "namespace functions {" in p
        assert "namespace multi_tool_use {" in p
        assert p.endswith("<|function|>\n```typescript\nfunctions.get_weather")

    def test_tool_turn_and_assistant_call_rendering(self):
        msgs = [
            {"role": "user", "content": "w?"},
            {"role": "assistant", "tool_calls": [
                {"type": "function",
                 "function": {"name": "get_weather",
                              "arguments": '{"city": "SF"}'}}]},
            {"role": "tool", "name": "get_weather", "content": "sunny"},
        ]
        p = lp.build_input(msgs, tools=[WEATHER])
        assert '<|function|>\n```typescript\nfunctions.get_weather({"city": "SF"});\n```' in p
        assert 'TOOL:{"content": "sunny", "name": "get_weather"}' in p


class TestParseResponse:
    def test_single_function_roundtrip(self):
        text = ('<|function|>\n```typescript\n'
                'functions.get_weather({"city": "SF"});\n```')
        r = lp.parse_response(text)
        assert r["tool_calls"][0]["function"]["name"] == "get_weather"
        assert json.loads(
            r["tool_calls"][0]["function"]["arguments"]) == {"city": "SF"}
        assert r["content"] is None

    def test_multi_tool_use(self):
        uses = {"tool_uses": [
            {"recipient_name": "functions.a", "parameters": "{\"x\": 1}"},
            {"recipient_name": "functions.b", "parameters": "{}"},
        ]}
        text = ("<|multi_tool_use|>\n```typescript\n"
                "multi_tool_use.parallel(%s);\n```"
                % json.dumps(uses))
        r = lp.parse_response(text)
        assert [c["function"]["name"] for c in r["tool_calls"]] == ["a", "b"]

    def test_forced_choice_prefix_is_prepended(self):
        # model continues after the forced prefix: only '({..});' emitted
        r = lp.parse_response(
            '({"city": "SF"});\n```',
            tool_choice={"type": "function",
                         "function": {"name": "get_weather"}},
        )
        assert r["tool_calls"][0]["function"]["name"] == "get_weather"

    def test_think_extraction(self):
        r = lp.parse_response("<think>\nhmm\n</think>the answer")
        assert r["reasoning_content"] == "hmm"
        assert r["content"] == "the answer"
        r2 = lp.parse_response("deep thought\n</longcat_think>\nanswer")
        assert r2["reasoning_content"] == "deep thought"
        assert r2["content"] == "answer"

    def test_plain_content(self):
        r = lp.parse_response("just text")
        assert r["content"] == "just text" and r["tool_calls"] is None

    def test_code_block(self):
        r = lp.parse_response("<|code|>\n```python\nprint(1)\n```")
        assert r["tool_calls"][0]["code"]["input"] == "print(1)"
