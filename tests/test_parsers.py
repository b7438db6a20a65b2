"""Function-call detectors + reasoning parser unit tests
(reference function_call/ + parser/reasoning_parser.py coverage)."""

import json

import pytest

from sglang_fluentllm_tpu.entrypoints.openai.protocol import Function, Tool
from sglang_fluentllm_tpu.function_call.parser import (
    DeepSeekV3Detector,
    FunctionCallParser,
    GenericJsonDetector,
    Llama32Detector,
    MistralDetector,
    Qwen25Detector,
)
from sglang_fluentllm_tpu.parser.reasoning_parser import ReasoningParser

TOOLS = [
    Tool(function=Function(name="get_weather",
                           parameters={"type": "object"})),
    Tool(function=Function(name="search")),
]


class TestDetectors:
    def test_qwen25(self):
        text = ('I will check.\n<tool_call>\n'
                '{"name": "get_weather", "arguments": {"city": "SF"}}\n'
                '</tool_call>')
        normal, items = Qwen25Detector().detect_and_parse(text, TOOLS)
        assert normal == "I will check."
        assert items[0].name == "get_weather"
        assert json.loads(items[0].parameters) == {"city": "SF"}

    def test_qwen25_multiple(self):
        text = ('<tool_call>{"name": "get_weather", "arguments": {}}'
                '</tool_call><tool_call>'
                '{"name": "search", "arguments": {"q": "x"}}</tool_call>')
        _, items = Qwen25Detector().detect_and_parse(text, TOOLS)
        assert [i.name for i in items] == ["get_weather", "search"]

    def test_llama32(self):
        text = ('<|python_tag|>{"name": "search", '
                '"parameters": {"q": "tpu"}}')
        normal, items = Llama32Detector().detect_and_parse(text, TOOLS)
        assert items[0].name == "search"

    def test_llama32_bare_json(self):
        text = '{"name": "search", "parameters": {"q": "tpu"}}'
        _, items = Llama32Detector().detect_and_parse(text, TOOLS)
        assert items and items[0].name == "search"

    def test_mistral(self):
        text = ('[TOOL_CALLS] [{"name": "get_weather", '
                '"arguments": {"city": "Paris"}}]')
        _, items = MistralDetector().detect_and_parse(text, TOOLS)
        assert items[0].name == "get_weather"

    def test_deepseek_v3(self):
        text = (
            "ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"SF\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>"
        )
        normal, items = DeepSeekV3Detector().detect_and_parse(text, TOOLS)
        assert normal == "ok"
        assert items[0].name == "get_weather"
        assert json.loads(items[0].parameters) == {"city": "SF"}

    def test_generic_json_filters_unknown_tools(self):
        text = ('{"name": "not_a_tool", "arguments": {}} and '
                '{"name": "search", "arguments": {"q": "x"}}')
        _, items = GenericJsonDetector().detect_and_parse(text, TOOLS)
        assert [i.name for i in items] == ["search"]

    def test_parser_dispatch(self):
        p = FunctionCallParser(TOOLS, "qwen25")
        assert p.has_tool_call("<tool_call>x")
        assert not p.has_tool_call("hello")
        with pytest.raises(ValueError):
            FunctionCallParser(TOOLS, "nope")


class TestReasoningParser:
    def test_full_parse(self):
        r = ReasoningParser().parse_full(
            "<think>step 1\nstep 2</think>\nThe answer is 4."
        )
        assert r.reasoning == "step 1\nstep 2"
        assert r.content == "The answer is 4."

    def test_implicit_open(self):
        r = ReasoningParser(implicit_open=True).parse_full(
            "thinking...</think>answer"
        )
        assert r.reasoning == "thinking..."
        assert r.content == "answer"

    def test_no_think(self):
        r = ReasoningParser().parse_full("just an answer")
        assert r.reasoning == ""
        assert r.content == "just an answer"

    def test_streaming(self):
        p = ReasoningParser()
        chunks = ["<th", "ink>rea", "soning</th", "ink>ans", "wer"]
        reasoning, content = "", ""
        for c in chunks:
            r, t = p.parse_stream(c)
            reasoning += r
            content += t
        assert reasoning == "reasoning"
        assert content == "answer"

    def test_streaming_no_tags(self):
        p = ReasoningParser()
        r, t = p.parse_stream("plain text ")
        r2, t2 = p.parse_stream("more")
        assert r + r2 == ""
        assert t + t2 == "plain text more"


class TestLongcatDetectors:
    def test_longcat_json(self):
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        p = FunctionCallParser(None, "longcat")
        text = (
            'let me check.<longcat_tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "SF"}}\n'
            '</longcat_tool_call><longcat_tool_call>\n'
            '{"name": "get_time", "arguments": {}}\n'
            '</longcat_tool_call>'
        )
        normal, calls = p.parse_non_stream(text)
        assert normal == "let me check."
        assert [c.name for c in calls] == ["get_weather", "get_time"]
        import json as _json

        assert _json.loads(calls[0].parameters) == {"city": "SF"}

    def test_longcat_xml(self):
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        p = FunctionCallParser(None, "longcat_xml")
        text = (
            "<longcat_tool_call>get_weather\n"
            "<longcat_arg_key>city</longcat_arg_key>"
            "<longcat_arg_value>SF</longcat_arg_value>"
            "<longcat_arg_key>days</longcat_arg_key>"
            "<longcat_arg_value>3</longcat_arg_value>"
            "</longcat_tool_call>"
        )
        normal, calls = p.parse_non_stream(text)
        assert normal == ""
        assert calls[0].name == "get_weather"
        import json as _json

        assert _json.loads(calls[0].parameters) == {"city": "SF", "days": 3}


class TestStreamingToolParse:
    def test_streaming_emits_text_then_call(self):
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        p = FunctionCallParser(None, "qwen25")
        chunks = [
            "Sure, ", "let me look. ", "<tool_", "call>",
            '\n{"name": "f1", ', '"arguments": {"x": 1}}\n',
            "</tool_call>", " done",
        ]
        texts, calls = [], []
        for c in chunks:
            r = p.parse_stream_chunk(c)
            texts.append(r.normal_text)
            calls.extend(r.calls)
        r = p.parse_stream_final()
        texts.append(r.normal_text)
        calls.extend(r.calls)
        # the prefix streamed out BEFORE the call completed
        assert "".join(texts).startswith("Sure, let me look. ")
        assert len(calls) == 1 and calls[0].name == "f1"

    def test_streaming_longcat(self):
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        p = FunctionCallParser(None, "longcat")
        full = (
            'hi<longcat_tool_call>\n{"name": "a", "arguments": {}}\n'
            '</longcat_tool_call>'
        )
        calls = []
        text = ""
        for i in range(0, len(full), 7):
            r = p.parse_stream_chunk(full[i : i + 7])
            text += r.normal_text
            calls.extend(r.calls)
        r = p.parse_stream_final()
        calls.extend(r.calls)
        assert text.startswith("hi")
        assert len(calls) == 1 and calls[0].name == "a"


class TestNewDetectors:
    """Round-2 detector additions (reference function_call/ parity)."""

    def _tools(self, *names):
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            Function,
            Tool,
        )

        return [Tool(function=Function(name=n, parameters={}))
                for n in names]

    def _parse(self, parser_name, text, *tool_names):
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        p = FunctionCallParser(self._tools(*tool_names), parser_name)
        assert p.has_tool_call(text)
        return p.parse_non_stream(text)

    def test_deepseekv31(self):
        text = ("ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_weather"
                '<｜tool▁sep｜>{"city": "Tokyo"}<｜tool▁call▁end｜>'
                "<｜tool▁calls▁end｜>")
        normal, calls = self._parse("deepseekv31", text, "get_weather")
        assert normal == "ok"
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].parameters) == {"city": "Tokyo"}

    def test_glm4_moe(self):
        text = ("pre<tool_call>get_weather\n"
                "<arg_key>city</arg_key><arg_value>Paris</arg_value>\n"
                "<arg_key>days</arg_key><arg_value>3</arg_value>"
                "</tool_call>")
        normal, calls = self._parse("glm4_moe", text, "get_weather")
        assert normal == "pre"
        args = json.loads(calls[0].parameters)
        assert args == {"city": "Paris", "days": 3}

    def test_kimi_k2(self):
        text = ("<|tool_calls_section_begin|><|tool_call_begin|>"
                "functions.get_weather:0<|tool_call_argument_begin|>"
                '{"city": "Oslo"}<|tool_call_end|>'
                "<|tool_calls_section_end|>")
        _, calls = self._parse("kimi_k2", text, "get_weather")
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].parameters) == {"city": "Oslo"}

    def test_qwen3_coder(self):
        text = ("<tool_call><function=get_weather>\n"
                "<parameter=city>Berlin</parameter>\n"
                "<parameter=days>2</parameter>\n"
                "</function></tool_call>")
        _, calls = self._parse("qwen3_coder", text, "get_weather")
        args = json.loads(calls[0].parameters)
        assert args == {"city": "Berlin", "days": 2}

    def test_pythonic(self):
        text = '[get_weather(city="Rome", days=5), ping(host="a.b")]'
        _, calls = self._parse("pythonic", text, "get_weather", "ping")
        assert [c.name for c in calls] == ["get_weather", "ping"]
        assert json.loads(calls[0].parameters) == {
            "city": "Rome", "days": 5}

    def test_step3(self):
        text = ("<｜tool_calls_begin｜><｜tool_call_begin｜>function"
                '<｜tool_sep｜><steptml:invoke name="get_weather">'
                '<steptml:parameter name="city">Kyiv</steptml:parameter>'
                "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>")
        _, calls = self._parse("step3", text, "get_weather")
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].parameters) == {"city": "Kyiv"}

    def test_gpt_oss(self):
        text = ("<|channel|>commentary to=functions.get_weather"
                '<|constrain|>json<|message|>{"city": "Lima"}<|call|>'
                "<|channel|>final<|message|>Here you go.")
        normal, calls = self._parse("gpt_oss", text, "get_weather")
        assert calls[0].name == "get_weather"
        assert json.loads(calls[0].parameters) == {"city": "Lima"}
        assert "Here you go." in normal


class TestDeepSeekV32Detector:
    """DSML format (reference deepseekv32_detector.py): XML parameter
    tags or a direct JSON body inside <|DSML|invoke>."""

    def _parse(self, text):
        from sglang_fluentllm_tpu.function_call.parser import (
            DeepSeekV32Detector,
        )

        return DeepSeekV32Detector().detect_and_parse(text, None)

    def test_xml_parameters(self):
        text = (
            'before <｜DSML｜function_calls>'
            '<｜DSML｜invoke name="get_spot">'
            '<｜DSML｜parameter name="city" string="true">San Francisco'
            '</｜DSML｜parameter>'
            '<｜DSML｜parameter name="top_k" string="false">3'
            '</｜DSML｜parameter>'
            '</｜DSML｜invoke>'
            '</｜DSML｜function_calls> after'
        )
        normal, items = self._parse(text)
        assert normal == "before  after".replace("  ", " ") or "before" in normal
        assert len(items) == 1
        assert items[0].name == "get_spot"
        import json as _json

        args = _json.loads(items[0].parameters)
        assert args == {"city": "San Francisco", "top_k": 3}

    def test_json_body_and_multiple_invokes(self):
        text = (
            '<｜DSML｜function_calls>'
            '<｜DSML｜invoke name="a">{"x": 1}</｜DSML｜invoke>'
            '<｜DSML｜invoke name="b">{"y": "z"}</｜DSML｜invoke>'
            '</｜DSML｜function_calls>'
        )
        normal, items = self._parse(text)
        assert [it.name for it in items] == ["a", "b"]


class TestToolConstraint:
    """tool_choice=required/{function} -> sampling regex (reference
    ebnf_composer role)."""

    TOOLS = [
        {"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object",
                           "properties": {"city": {"type": "string"}},
                           "required": ["city"]}}},
        {"type": "function", "function": {
            "name": "add",
            "parameters": {"type": "object",
                           "properties": {"a": {"type": "integer"},
                                          "b": {"type": "integer"}},
                           "required": ["a", "b"]}}},
    ]

    def test_required_matches_any_tool(self):
        import re

        from sglang_fluentllm_tpu.function_call.tool_constraint import (
            tool_call_constraint,
        )

        pat = tool_call_constraint(self.TOOLS, "json", "required")
        assert pat is not None
        ok1 = '{"name": "get_weather", "arguments": {"city": "SF"}}'
        ok2 = '{"name": "add", "arguments": {"a": 1, "b": 2}}'
        bad = '{"name": "rm_rf", "arguments": {}}'
        assert re.fullmatch(pat, ok1)
        assert re.fullmatch(pat, ok2)
        assert not re.fullmatch(pat, bad)

    def test_specific_function(self):
        import re

        from sglang_fluentllm_tpu.function_call.tool_constraint import (
            tool_call_constraint,
        )

        pat = tool_call_constraint(
            self.TOOLS, "json",
            {"type": "function", "function": {"name": "add"}},
        )
        assert re.fullmatch(pat, '{"name": "add", "arguments": {"a": 1, "b": 2}}')
        assert not re.fullmatch(
            pat, '{"name": "get_weather", "arguments": {"city": "SF"}}'
        )

    def test_qwen_wrapper_and_auto_none(self):
        import re

        from sglang_fluentllm_tpu.function_call.tool_constraint import (
            tool_call_constraint,
        )

        pat = tool_call_constraint(self.TOOLS, "qwen25", "required")
        assert re.fullmatch(
            pat,
            '<tool_call>\n{"name": "add", "arguments": {"a": 1, "b": 2}}'
            "\n</tool_call>",
        )
        assert tool_call_constraint(self.TOOLS, "json", "auto") is None
        assert tool_call_constraint(self.TOOLS, "json", "none") is None
        # sentinel-heavy format: parse-only fallback
        assert tool_call_constraint(self.TOOLS, "kimi_k2",
                                    "required") is None
