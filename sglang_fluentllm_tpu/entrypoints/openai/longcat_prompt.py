"""LongCat chat/tool prompt protocol.

Analog of the reference's ``srt/openai_api/longcat_prompt_builder.py``
(``PromptBuilder``): LongCat chat checkpoints are trained on a bespoke
wire format — ``SYSTEM:/USER:/ASSISTANT:/TOOL:`` role prefixes with
``[Round N]`` turn markers, tools rendered as a TypeScript ``functions``
namespace, tool calls emitted as fenced ``functions.name({...});``
blocks behind ``<|function|>`` / ``<|multi_tool_use|>`` / ``<|code|>`` /
``<|retrieval|>`` sentinels, and thinking wrapped in ``<think>`` or
closed by ``</longcat_think>``. The format strings below are the
model's contract and must match byte-for-byte; the rendering/parsing
code is original.

Enabled with ``--chat-template longcat``.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Tuple

SPECIAL = {
    "system": "SYSTEM:",
    "user": "USER:",
    "assistant": "ASSISTANT:",
    "assistant_think": "ASSISTANT:<longcat_think>\n",
    "tool": "TOOL:",
    "function": "<|function|>\n",
    "multi_tool_use": "<|multi_tool_use|>\n",
    "code": "<|code|>\n",
    "retrieval": "<|retrieval|>\n",
    "files_start": "<|files_start|>\n",
    "files_end": "<|files_end|>\n",
}

_TS_SIMPLE = {"integer": "number", "number": "number", "string": "string",
              "boolean": "boolean"}

_CODE_BLOCK = """
    ## python

    When you send a message containing Python code to python, it will be executed in a stateful Jupyter notebook environment.
    Python will respond with the output of the execution or time out after 60.0 seconds.
    Internet access for this session is disabled.
    Do not make external web requests or API calls as they will fail.
    """

_RETRIEVAL_BLOCK = """
    ## retrieval

    namespace retrieval {

        type search = (_: {
            query: string,
        }) => any;

    } // namespace retrieval
    """

_MULTI_TOOL_BLOCK = """
    ## multi_tool_use

    // This tool serves as a wrapper for utilizing multiple tools. Each tool that can be used must be specified in the tool sections. Only tools in the functions namespace are permitted.
    // Ensure that the parameters provided to each tool are valid according to that tool's specification.
    namespace multi_tool_use {

        // Use this function to run multiple tools simultaneously, but only if they can operate in parallel. Do this even if the prompt suggests using the tools sequentially.
        type parallel = (_: {
            // The tools to be executed in parallel. NOTE: only functions tools are permitted
            tool_uses: {
                // The name of the tool to use. The format should either be just the name of the tool, or in the format namespace.function_name for plugin and function tools.
                recipient_name: string,
                // The parameters to pass to the tool. Ensure these are valid according to the tool's own specifications.
                parameters: object,
            }[],
        }) => any;

    } // namespace multi_tool_use
    """


def _ts_type(info: Dict[str, Any], indent: str) -> str:
    """JSON-schema fragment -> TypeScript type expression."""
    t = info.get("type", "string")
    if "enum" in info and t not in ("object", "array"):
        return '"' + '" | "'.join(info["enum"]) + '"'
    if t == "object":
        inner = indent + "    "
        req = info.get("required", [])
        rows = [_ts_field(k, v, req, inner)
                for k, v in info.get("properties", {}).items()]
        return "{\n" + ",\n".join(rows) + "\n" + indent + "}"
    if t == "array":
        item = info.get("items")
        if item is None:
            return "array"
        return _ts_type(item, indent) + "[]"
    return _TS_SIMPLE.get(t, t)


def _ts_field(name: str, info: Dict[str, Any], required: List[str],
              indent: str) -> str:
    opt = "" if name in required else "?"
    desc = (info.get("description") or "").replace("\n", " ")
    if "example_value" in info:
        desc = f"{desc}, example_value: {info['example_value']}"
    ty = _ts_type(info, indent)
    head = f"{indent}// {desc}\n" if desc else ""
    return f"{head}{indent}{name}{opt}: {ty}"


def functions_to_typescript(functions: List[Dict[str, Any]]) -> str:
    """Render function schemas as ``type name = (_: {...}) => ret``
    declarations (reference ``functions2typescript``)."""
    if isinstance(functions, dict):
        functions = [functions]
    out = []
    for fn in functions:
        params = fn.get("parameters") or {}
        req = params.get("required", [])
        rows = [_ts_field(k, v, req, " " * 8)
                for k, v in params.get("properties", {}).items()]
        body = ",\n".join(rows)
        ret = "any;"
        if fn.get("returns", {}).get("type"):
            rinfo = fn["returns"]
            rdesc = (rinfo.get("description") or "").replace("\n", " ")
            ret = _ts_type(rinfo, " " * 8) + ";"
            if rdesc:
                ret += f" // {rdesc}"
        out.append(
            f"\n    // {fn.get('description', '')}\n"
            f"    type {fn['name']} = (_:{{\n{body}\n    }}) => {ret}"
        )
    return "\n".join(out)


def render_tools(tools: List[Dict[str, Any]]) -> str:
    """``# Tools`` section with one block per declared tool type."""
    parts = ["# Tools\n"]
    for tool in tools:
        kind = tool.get("type")
        if kind == "function" and tool.get("function"):
            ts = functions_to_typescript(tool["function"])
            parts.append(
                "\n    ## functions\n\n    namespace functions {\n\n"
                f"{ts}\n\n    }}// namespace functions\n    "
            )
            parts.append(_MULTI_TOOL_BLOCK)
        elif kind == "code_interpreter":
            parts.append(_CODE_BLOCK)
        elif kind == "retrieval":
            parts.append(_RETRIEVAL_BLOCK)
    return "".join(parts)


def _fenced(sentinel: str, body: str, comment: Optional[str],
            lang: str = "typescript") -> str:
    head = SPECIAL[sentinel] + f"```{lang}\n"
    if comment is not None:
        head += f"//{comment}\n"
    return head + body + "\n```"


def render_assistant(message: Dict[str, Any],
                     tools: Optional[List[Dict[str, Any]]]) -> str:
    """Assistant turn: plain content, or its tool calls re-rendered in
    the model's emission format (reference ``build_target``)."""
    calls = message.get("tool_calls")
    if not calls or tools is None:
        return message.get("content") or ""
    content = message.get("content")
    if len(calls) > 1:
        uses = [{"recipient_name": "functions." + c["function"]["name"],
                 "parameters": c["function"]["arguments"]}
                for c in calls]
        body = "multi_tool_use.parallel(%s);" % json.dumps(
            {"tool_uses": uses}, ensure_ascii=False)
        return _fenced("multi_tool_use", body, content)
    call = calls[0]
    kind = call.get("type", "function")
    if kind == "function":
        fn = call["function"]
        args = fn["arguments"]
        if not isinstance(args, str):
            args = json.dumps(args, ensure_ascii=False)
        return _fenced("function", f"functions.{fn['name']}({args});",
                       content)
    if kind == "code":
        body = SPECIAL["code"]
        if content is not None:
            body += content + "\n"
        return body + "```python\n" + call["code"]["input"] + "\n```"
    if kind == "retrieval":
        return _fenced("retrieval",
                       f"retrieval.search({call['retrieval']});", content)
    raise ValueError(f"invalid tool type {kind!r}")


def tool_choice_prefix(tool_choice) -> str:
    """Forced-tool prefill (reference ``build_tool_choice_prefix``)."""
    if not isinstance(tool_choice, dict):
        return ""
    kind = tool_choice["type"]
    if kind == "function":
        return (SPECIAL["function"] + "```typescript\nfunctions."
                + tool_choice["function"]["name"])
    if kind == "code":
        return SPECIAL["code"] + "```python\n"
    if kind == "multi_tool_use":
        return (SPECIAL["multi_tool_use"]
                + "```typescript\nmulti_tool_use.parallel")
    if kind == "retrieval":
        return (SPECIAL["retrieval"] + "```typescript\nretrieval.search")
    raise ValueError(f"invalid tool type {kind!r}")


def build_input(
    messages: List[Dict[str, Any]],
    tools: Optional[List[Dict[str, Any]]] = None,
    tool_choice="auto",
    is_think_model: bool = False,
) -> str:
    """Full model input (reference ``build_input``): tools section,
    ``# Messages`` with [Round N] markers, generation prompt, and the
    forced-tool prefix."""
    parts = []
    if tools and tool_choice not in (None, "none"):
        parts.append(render_tools(tools) + "\n")
    lines = ["# Messages\n\n"]
    rnd = 0
    for m in messages:
        role = m["role"]
        if role not in ("system", "user", "assistant", "tool"):
            raise ValueError(f"invalid role {role!r}")
        chunk = ""
        if role == "user":
            chunk += f"[Round {rnd}] "
            rnd += 1
        chunk += SPECIAL[role]
        if role == "user":
            if m.get("files") is not None:
                chunk += (SPECIAL["files_start"]
                          + json.dumps(m["files"], ensure_ascii=False)
                          + SPECIAL["files_end"])
            chunk += m.get("content") or ""
        elif role == "assistant":
            chunk += render_assistant(m, tools)
        elif role == "tool":
            resp = {"content": m.get("content")}
            if m.get("name"):
                resp["name"] = m["name"]
            chunk += json.dumps(resp, ensure_ascii=False)
        else:
            chunk += m.get("content") or ""
        lines.append(chunk + " ")
    lines.append(SPECIAL["assistant_think"] if is_think_model
                 else SPECIAL["assistant"])
    return "".join(parts) + "".join(lines) + tool_choice_prefix(tool_choice)


def split_think(text: str) -> Tuple[str, Optional[str]]:
    """(content, reasoning): strip ``<think>…</think>`` or the
    implicit-open ``…\\n</longcat_think>\\n`` form."""
    m = re.findall(r"<think>\n(.*?)\n</think>", text, flags=re.DOTALL)
    if m:
        return re.sub(r"<think>\n.*?\n</think>", "", text,
                      flags=re.DOTALL), m[0]
    m = re.findall(r"(.*?)\n</longcat_think>\n", text, flags=re.DOTALL)
    if m:
        return re.sub(r"(.*?)\n</longcat_think>\n", "", text,
                      flags=re.DOTALL), m[0]
    return text, None


def parse_response(text: str, tool_choice="auto") -> Dict[str, Any]:
    """Model output -> assistant message dict with content /
    reasoning_content / tool_calls (reference ``parse_target``)."""
    text = tool_choice_prefix(tool_choice) + text
    content: Optional[str] = None
    calls: List[Dict[str, Any]] = []

    def _body(sentinel: str) -> Tuple[str, Optional[str]]:
        inner = text.split(SPECIAL[sentinel] + "```typescript\n", 1)[1]
        inner = inner.split("\n```", 1)[0]
        return inner, None

    if SPECIAL["function"] in text:
        inner, _ = _body("function")
        pre, rest = inner.split("functions.", 1)
        if pre.startswith("//"):
            content = pre[2:].strip("\n")
        name, args = rest.split("(", 1)
        calls.append({"type": "function", "function": {
            "name": name, "arguments": args.strip(");")}})
    elif SPECIAL["code"] in text:
        pre, rest = text.split(SPECIAL["code"], 1)
        if pre:
            content = pre
        code = rest.split("```python\n", 1)[1].split("\n```", 1)[0]
        calls.append({"type": "code", "code": {"input": code}})
    elif SPECIAL["retrieval"] in text:
        inner, _ = _body("retrieval")
        pre, rest = inner.split("retrieval.search(", 1)
        if pre.startswith("//"):
            content = pre[2:].strip("\n")
        calls.append({"type": "retrieval",
                      "retrieval": rest.strip(");")})
    elif SPECIAL["multi_tool_use"] in text:
        inner, _ = _body("multi_tool_use")
        pre, rest = inner.split("multi_tool_use.parallel(", 1)
        if pre.startswith("//"):
            content = pre[2:].strip("\n")
        for use in json.loads(rest.strip(");"))["tool_uses"]:
            calls.append({"type": "function", "function": {
                "name": use["recipient_name"].split("functions.")[1],
                "arguments": use["parameters"]}})
    else:
        content = text

    resp: Dict[str, Any] = {"role": "assistant", "content": None,
                            "tool_calls": None}
    if content is not None:
        answer, think = split_think(content)
        if think is not None:
            resp["reasoning_content"] = think
        resp["content"] = answer
    if calls:
        resp["tool_calls"] = calls
    return resp
