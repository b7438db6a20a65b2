"""gpt-oss Harmony chat format.

Analog of the reference's ``srt/entrypoints/harmony_utils.py`` +
``context.py`` (which bind the external ``openai_harmony`` encoder; not
available here, so the public Harmony wire format is implemented
directly). The format is the gpt-oss models' contract:

    <|start|>system<|message|>...<|end|>
    <|start|>developer<|message|># Instructions ... # Tools ...<|end|>
    <|start|>user<|message|>hi<|end|>
    <|start|>assistant<|channel|>final<|message|>hello<|end|>
    <|start|>assistant<|channel|>commentary to=functions.f
        <|constrain|>json<|message|>{...}<|call|>
    <|start|>functions.f to=assistant<|channel|>commentary
        <|message|>{result}<|end|>
    <|start|>assistant                      <- generation prompt

Output parsing splits the ``analysis`` channel into reasoning_content,
``final`` into content, and delegates ``commentary`` tool calls to
``function_call.parser.GptOssDetector`` (same grammar both ways).

Enabled with ``--chat-template harmony``.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

from sglang_fluentllm_tpu.entrypoints.openai.longcat_prompt import (
    functions_to_typescript,
)

VALID_CHANNELS = ("analysis", "commentary", "final")


def render_system(
    reasoning_effort: str = "medium",
    model_identity: str = "You are ChatGPT, a large language model "
                          "trained by OpenAI.",
    current_date: Optional[str] = None,
    with_tools: bool = False,
) -> str:
    lines = [model_identity, "Knowledge cutoff: 2024-06"]
    if current_date:
        lines.append(f"Current date: {current_date}")
    lines.append("")
    lines.append(f"Reasoning: {reasoning_effort}")
    lines.append("")
    chan = ("# Valid channels: analysis, commentary, final. "
            "Channel must be included for every message.")
    if with_tools:
        chan += ("\nCalls to these tools must go to the commentary "
                 "channel: 'functions'.")
    lines.append(chan)
    return "<|start|>system<|message|>" + "\n".join(lines) + "<|end|>"


def render_developer(
    instructions: Optional[str],
    tools: Optional[List[Dict[str, Any]]],
) -> str:
    parts = []
    if instructions:
        parts.append("# Instructions\n\n" + instructions)
    fns = [t["function"] for t in (tools or [])
           if t.get("type") == "function" and t.get("function")]
    if fns:
        ts = functions_to_typescript(fns)
        parts.append("# Tools\n\n## functions\n\nnamespace functions "
                     "{\n" + ts + "\n\n} // namespace functions")
    if not parts:
        return ""
    return ("<|start|>developer<|message|>" + "\n\n".join(parts)
            + "<|end|>")


def render_conversation(
    messages: List[Dict[str, Any]],
    tools: Optional[List[Dict[str, Any]]] = None,
    reasoning_effort: str = "medium",
    current_date: Optional[str] = None,
) -> str:
    """Messages -> full Harmony prompt ending in the generation cue."""
    system_texts = [m.get("content") or "" for m in messages
                    if m["role"] == "system"]
    out = [render_system(reasoning_effort, current_date=current_date,
                         with_tools=bool(tools))]
    dev = render_developer("\n\n".join(t for t in system_texts if t)
                           or None, tools)
    if dev:
        out.append(dev)
    for m in messages:
        role = m["role"]
        if role == "system":
            continue  # folded into the developer message
        if role == "user":
            out.append("<|start|>user<|message|>"
                       + (m.get("content") or "") + "<|end|>")
        elif role == "assistant":
            for call in m.get("tool_calls") or []:
                fn = call["function"]
                args = fn["arguments"]
                if not isinstance(args, str):
                    args = json.dumps(args, ensure_ascii=False)
                out.append(
                    "<|start|>assistant<|channel|>commentary "
                    f"to=functions.{fn['name']}<|constrain|>json"
                    f"<|message|>{args}<|call|>"
                )
            if m.get("content"):
                out.append("<|start|>assistant<|channel|>final"
                           f"<|message|>{m['content']}<|end|>")
        elif role == "tool":
            name = m.get("name", "tool")
            out.append(
                f"<|start|>functions.{name} to=assistant"
                "<|channel|>commentary<|message|>"
                + (m.get("content") or "") + "<|end|>"
            )
        else:
            raise ValueError(f"invalid role {role!r}")
    out.append("<|start|>assistant")
    return "".join(out)


_SEG_RE = re.compile(
    r"<\|channel\|>(analysis|final|commentary[^<]*)"
    r"(?:<\|constrain\|>\w+)?<\|message\|>"
    r"(.*?)(?=<\|channel\|>|<\|end\|>|<\|return\|>|<\|call\|>|"
    r"<\|start\|>|$)",
    re.S,
)


def parse_output(text: str) -> Dict[str, Any]:
    """Completion text -> {content, reasoning_content, tool_calls}.

    Handles outputs with or without the leading ``<|start|>assistant``
    (the generation prompt usually supplies it)."""
    reasoning: List[str] = []
    final: List[str] = []
    calls: List[Dict[str, Any]] = []
    matched = False
    for m in _SEG_RE.finditer(text):
        matched = True
        chan, body = m.group(1), m.group(2)
        if chan == "analysis":
            reasoning.append(body)
        elif chan == "final":
            final.append(body)
        else:  # commentary — tool call when addressed to functions.*
            to = re.search(r"to=([\w.-]+)", chan)
            if to:
                name = to.group(1).split(".", 1)[-1]
                calls.append({"type": "function", "function": {
                    "name": name,
                    "arguments": body.strip(),
                }})
            else:
                final.append(body)
    if not matched:
        # plain text (model skipped channels): everything is content
        return {"role": "assistant", "content": text or None,
                "reasoning_content": None, "tool_calls": None}
    return {
        "role": "assistant",
        "content": "".join(final).strip() or None,
        "reasoning_content": "".join(reasoning).strip() or None,
        "tool_calls": calls or None,
    }
