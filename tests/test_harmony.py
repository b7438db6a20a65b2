"""gpt-oss Harmony chat format (harmony_utils analog)."""

from sglang_fluentllm_tpu.entrypoints.openai import harmony as hy

TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Weather lookup",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
        },
    },
}]


class TestRender:
    def test_system_and_channels_header(self):
        p = hy.render_conversation(
            [{"role": "user", "content": "hi"}])
        assert p.startswith("<|start|>system<|message|>")
        assert "Reasoning: medium" in p
        assert "# Valid channels: analysis, commentary, final." in p
        assert "<|start|>user<|message|>hi<|end|>" in p
        assert p.endswith("<|start|>assistant")

    def test_system_message_becomes_developer_instructions(self):
        p = hy.render_conversation([
            {"role": "system", "content": "answer in French"},
            {"role": "user", "content": "hi"},
        ])
        assert ("<|start|>developer<|message|># Instructions\n\n"
                "answer in French<|end|>") in p

    def test_tools_render_and_commentary_routing_note(self):
        p = hy.render_conversation(
            [{"role": "user", "content": "w?"}], tools=TOOLS)
        assert "namespace functions {" in p
        assert "type get_weather" in p
        assert "commentary channel: 'functions'" in p

    def test_history_tool_call_and_response(self):
        p = hy.render_conversation([
            {"role": "user", "content": "w?"},
            {"role": "assistant", "tool_calls": [
                {"type": "function",
                 "function": {"name": "get_weather",
                              "arguments": '{"city": "SF"}'}}]},
            {"role": "tool", "name": "get_weather", "content": "sunny"},
        ], tools=TOOLS)
        assert ("<|start|>assistant<|channel|>commentary "
                "to=functions.get_weather<|constrain|>json"
                '<|message|>{"city": "SF"}<|call|>') in p
        assert ("<|start|>functions.get_weather to=assistant"
                "<|channel|>commentary<|message|>sunny<|end|>") in p


class TestParse:
    def test_analysis_and_final_split(self):
        out = hy.parse_output(
            "<|channel|>analysis<|message|>let me think"
            "<|end|><|start|>assistant<|channel|>final"
            "<|message|>the answer<|return|>")
        assert out["reasoning_content"] == "let me think"
        assert out["content"] == "the answer"
        assert out["tool_calls"] is None

    def test_commentary_tool_call(self):
        out = hy.parse_output(
            "<|channel|>analysis<|message|>need weather<|end|>"
            "<|start|>assistant<|channel|>commentary "
            "to=functions.get_weather<|constrain|>json"
            '<|message|>{"city": "SF"}<|call|>')
        assert out["tool_calls"][0]["function"]["name"] == "get_weather"
        assert out["tool_calls"][0]["function"]["arguments"] == (
            '{"city": "SF"}')
        assert out["reasoning_content"] == "need weather"

    def test_plain_text_without_channels(self):
        out = hy.parse_output("no channels here")
        assert out["content"] == "no channels here"
        assert out["tool_calls"] is None

    def test_render_parse_roundtrip_through_detector(self):
        """The render-side call format parses with the existing
        GptOssDetector too (same grammar both ways)."""
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            Function,
            Tool,
        )
        from sglang_fluentllm_tpu.function_call.parser import (
            FunctionCallParser,
        )

        tools = [Tool(function=Function(
            name="get_weather",
            parameters={"type": "object"}))]
        text = ("<|channel|>commentary to=functions.get_weather"
                '<|constrain|>json<|message|>{"city": "SF"}<|call|>')
        parser = FunctionCallParser(tools, "gpt-oss")
        assert parser.has_tool_call(text)
        _, items = parser.parse_non_stream(text)
        assert items and items[0].name == "get_weather"


class TestCustomTemplateFile:
    def test_jinja_file_template_applied(self, tmp_path):
        """--chat-template <file.jinja> overrides the tokenizer's
        template (reference template_manager.py role)."""
        import json

        from tests.server_utils import write_tiny_tokenizer
        from tests.utils import TINY_LLAMA_CFG, tiny_engine, write_model_dir

        d = write_model_dir(TINY_LLAMA_CFG)
        write_tiny_tokenizer(d)
        tpl = tmp_path / "t.jinja"
        # vocab is word-level "<i>" tokens: render into that vocab so
        # the template's effect is visible in the token ids
        tpl.write_text(
            "{% for m in messages %}{{ m.content }} {% endfor %}<9>")
        e = tiny_engine(model_path_override=d, skip_tokenizer_init=False,
                        chat_template=str(tpl))
        from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
            ChatCompletionRequest,
            ChatMessage,
        )
        from sglang_fluentllm_tpu.entrypoints.openai.serving import (
            OpenAIServing,
        )

        # use the underlying sync engine's tokenizer through a minimal
        # serving shim; construct through __init__ so the real template
        # resolution (TemplateManager on server_args.chat_template) runs
        class Shim:
            pass

        shim = Shim()
        shim.tokenizer = e.tokenizer
        shim.server_args = e.server_args
        srv = OpenAIServing(shim)
        req = ChatCompletionRequest(
            model="m",
            messages=[ChatMessage(role="user", content="<3> <5>")],
        )
        ids = srv._apply_chat_template(req)
        assert list(ids)[-1] == 9, ids     # template's trailing <9>
        assert 3 in list(ids) and 5 in list(ids)
