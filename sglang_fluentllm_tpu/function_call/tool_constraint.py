"""Constrained tool-call generation (reference
``function_call/ebnf_composer.py`` + base_format_detector
``build_ebnf``): when ``tool_choice`` is ``required`` or names a specific
function, the sampled text is CONSTRAINED to a syntactically valid call
whose arguments satisfy the tool's JSON schema.

Ours composes a REGEX (the grammar engine's native input) from each
tool's parameter schema via the existing JSON-schema lowering, wrapped in
the active parser's wire format. Formats without a regular wire syntax
fall back to unconstrained (parse-only) behavior."""

from __future__ import annotations

import json
import re
from typing import Any, List, Optional

from sglang_fluentllm_tpu.constrained.json_schema import schema_to_regex

WS = r"[ \n]?"


def _call_regex(name: str, params_schema: Any) -> str:
    """'{"name": "<fn>", "arguments": <schema>}' as a regex."""
    args = schema_to_regex(params_schema or {"type": "object"}, ws=WS)
    return (
        rf"\{{{WS}\"name\"{WS}:{WS}{re.escape(json.dumps(name))}"
        rf"{WS},{WS}\"arguments\"{WS}:{WS}{args}{WS}\}}"
    )


def tool_call_constraint(
    tools: List[Any],
    tool_call_parser: str,
    tool_choice: Any,
) -> Optional[str]:
    """Regex enforcing a valid tool call, or None when the choice does not
    require constraining (auto/none) or the wire format is unsupported.

    tool_choice: "required" | {"type": "function", "function": {"name"}}.
    """
    if tool_choice in (None, "auto", "none"):
        return None
    wanted = None
    if isinstance(tool_choice, dict):
        wanted = (tool_choice.get("function") or {}).get("name")
        if wanted is None:
            return None
    elif tool_choice != "required":
        return None

    calls = []
    for t in tools or []:
        fn = getattr(t, "function", None) or (
            t.get("function") if isinstance(t, dict) else None
        )
        if fn is None:
            continue
        name = getattr(fn, "name", None) or (
            fn.get("name") if isinstance(fn, dict) else None
        )
        if name is None or (wanted is not None and name != wanted):
            continue
        params = getattr(fn, "parameters", None)
        if params is None and isinstance(fn, dict):
            params = fn.get("parameters")
        calls.append(_call_regex(name, params))
    if not calls:
        return None
    body = "(?:" + "|".join(calls) + ")"

    # wrap in the active parser's wire format (regular formats only)
    if tool_call_parser in ("json",):
        return body
    if tool_call_parser in ("qwen25", "qwen3"):
        return rf"<tool_call>\n?{body}\n?</tool_call>"
    if tool_call_parser in ("llama3", "llama32"):
        return body  # llama 3.2 emits the bare JSON object
    if tool_call_parser == "mistral":
        return rf"\[TOOL_CALLS\]{WS}\[{WS}{body}{WS}\]"
    return None  # sentinel-heavy formats: parse-only (reference parity)
