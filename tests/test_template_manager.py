"""TemplateManager (parser/template_manager.py) — parity with reference
managers/template_manager.py + parser/code_completion_parser.py."""

import json

import pytest

from sglang_fluentllm_tpu.parser.template_manager import (
    CompletionTemplate,
    Conversation,
    FimPosition,
    SeparatorStyle,
    TemplateManager,
    chat_template_exists,
    completion_template_exists,
    detect_force_reasoning,
    detect_jinja_content_format,
    generate_completion_prompt,
    get_conv_template,
)

MSGS = [
    {"role": "system", "content": "be brief"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "2+2?"},
]


def test_builtin_registry():
    for name in ("chatml", "qwen", "llama-3", "vicuna_v1.1", "deepseek"):
        assert chat_template_exists(name)
    for name in ("deepseek_coder", "star_coder", "qwen_coder"):
        assert completion_template_exists(name)


def test_chatml_render():
    out = get_conv_template("chatml").render(MSGS)
    assert out == (
        "<|im_start|>system\nbe brief<|im_end|>\n"
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello<|im_end|>\n"
        "<|im_start|>user\n2+2?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_llama3_render():
    out = get_conv_template("llama-3").render(MSGS)
    assert out.startswith("<|begin_of_text|><|start_header_id|>system")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "hi<|eot_id|>" in out


def test_openai_content_parts_flattened():
    msgs = [{"role": "user",
             "content": [{"type": "text", "text": "a"},
                         {"type": "text", "text": "b"}]}]
    out = get_conv_template("chatml").render(msgs)
    assert "<|im_start|>user\nab<|im_end|>" in out


def test_fim_middle_and_end_positions():
    mid = CompletionTemplate("m", "<B>", "<M>", "<E>", FimPosition.MIDDLE)
    end = CompletionTemplate("e", "<B>", "<M>", "<E>", FimPosition.END)
    assert generate_completion_prompt("PRE", "SUF", mid) == "<B>PRE<M>SUF<E>"
    assert generate_completion_prompt("PRE", "SUF", end) == "<B>PRE<E>SUF<M>"


def test_manager_fim_prompt():
    tm = TemplateManager()
    tm.initialize(completion_template="star_coder")
    got = tm.fim_prompt("def f(:", "    return 1")
    assert got == "<fim_prefix>def f(:<fim_suffix>    return 1<fim_middle>"
    # no suffix -> untouched
    assert tm.fim_prompt("x", None) == "x"
    # no template -> untouched
    assert TemplateManager().fim_prompt("x", "y") == "x"


def test_manager_builtin_name_and_stop_strings():
    tm = TemplateManager()
    tm.initialize(chat_template="qwen")
    text = tm.resolve_chat([{"role": "user", "content": "hi"}])
    assert "You are a helpful assistant." in text
    assert tm.stop_strings() == ["<|im_end|>"]


def test_manager_json_conv_template(tmp_path):
    p = tmp_path / "mytpl.json"
    p.write_text(json.dumps({
        "name": "mytpl",
        "system": "SYS {system_message}",
        "user": "Human",
        "assistant": "Bot",
        "sep_style": "ADD_COLON_SINGLE",
        "sep": "\n",
        "stop_str": "###",
    }))
    tm = TemplateManager()
    tm.initialize(chat_template=str(p))
    out = tm.resolve_chat(MSGS)
    assert out.startswith("SYS be brief\n")
    assert "Human: hi\n" in out and out.endswith("Bot:")
    assert tm.stop_strings() == ["###"]


def test_manager_jinja_file(tmp_path):
    p = tmp_path / "t.jinja"
    p.write_text("{% for m in messages %}{{ m['content'] }}{% endfor %}")
    tm = TemplateManager()
    tm.initialize(chat_template=str(p))
    assert tm.chat_template_name is None
    assert tm.custom_jinja is not None
    assert tm.resolve_chat(MSGS) is None  # HF path owns rendering


def test_manager_unknown_template_raises():
    with pytest.raises(RuntimeError):
        TemplateManager().initialize(chat_template="no-such-template")


def test_jinja_content_format_detection():
    openai_tpl = (
        "{% for message in messages %}{% for part in message['content'] %}"
        "{{ part.text }}{% endfor %}{% endfor %}"
    )
    string_tpl = "{% for m in messages %}{{ m['content'] }}{% endfor %}"
    assert detect_jinja_content_format(openai_tpl) == "openai"
    assert detect_jinja_content_format(string_tpl) == "string"
    assert detect_jinja_content_format(None) == "string"


def test_force_reasoning_detection():
    assert detect_force_reasoning(
        "...<|im_start|>assistant\\n<think>\\n...")
    assert not detect_force_reasoning("plain template")
    # enable_thinking default overrides
    assert detect_force_reasoning(
        "{% if enable_thinking | default(true) %}x{% endif %}")
    assert not detect_force_reasoning(
        "<|im_start|>assistant\\n<think>\\n "
        "{% if enable_thinking | default(false) %}x{% endif %}")


# ---------------------------------------------------------------------------
# serving integration: tool fallthrough + stop-string merge (ADVICE r4)
# ---------------------------------------------------------------------------
def _serving_with_named_template(name="qwen"):
    from sglang_fluentllm_tpu.entrypoints.openai.serving import OpenAIServing

    class Tok:
        def encode(self, s):
            return [ord(c) % 101 for c in s]

        def apply_chat_template(self, messages, add_generation_prompt=True,
                                tokenize=True, **kw):
            # records whether tools were forwarded (HF jinja path)
            self.last_tools = kw.get("tools")
            text = "".join(m["content"] or "" for m in messages) + "JINJA"
            return self.encode(text)

    class Args:
        served_model_name = "m"
        chat_template = name
        completion_template = None
        tool_server = None
        tool_call_parser = None

    class Shim:
        tokenizer = Tok()
        server_args = Args()

    return OpenAIServing(Shim())


def _chat_req(tools=None, messages=None):
    from sglang_fluentllm_tpu.entrypoints.openai.protocol import (
        ChatCompletionRequest,
    )

    return ChatCompletionRequest(
        model="m",
        messages=messages or [{"role": "user", "content": "hi"}],
        tools=tools,
    )


def test_named_template_tools_fall_through_to_jinja():
    """With a named template active, tool definitions must still reach
    the model: serving falls through to tokenizer.apply_chat_template
    (ref serving_chat.py forwards tools there)."""
    srv = _serving_with_named_template("qwen")
    tools = [{"type": "function",
              "function": {"name": "f", "parameters": {}}}]
    req = _chat_req(tools=tools)
    assert not srv._named_template_applies(req)
    srv._apply_chat_template(req)
    assert srv.engine.tokenizer.last_tools is not None

    # no tools -> named template owns rendering (CHATML framing)
    req2 = _chat_req()
    assert srv._named_template_applies(req2)


def test_named_template_tool_role_messages_fall_through():
    srv = _serving_with_named_template("qwen")
    msgs = [
        {"role": "user", "content": "hi"},
        {"role": "tool", "content": "42", "tool_call_id": "x"},
    ]
    assert not srv._named_template_applies(_chat_req(messages=msgs))


def test_named_template_stop_strings_merged():
    """conv.stop_str must land in the sampling stop list (ref
    serving_chat.py:376), so generation halts at the turn boundary even
    when tokenizer EOS differs from the template stop token."""
    srv = _serving_with_named_template("qwen")
    req = _chat_req()
    sp = srv._merge_template_stops(req, {"stop": ["foo"]})
    assert sp["stop"] == ["foo", "<|im_end|>"]
    # tools active -> named template not applied -> no merge
    tools = [{"type": "function",
              "function": {"name": "f", "parameters": {}}}]
    sp2 = srv._merge_template_stops(_chat_req(tools=tools), {"stop": []})
    assert sp2["stop"] == []
