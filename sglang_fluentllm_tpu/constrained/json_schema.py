"""JSON schema -> regex (outlines-style schema lowering).

Covers the common schema subset: object (properties/required/
additionalProperties=false), array (items, minItems/maxItems), string
(enum/const/pattern/maxLength), number, integer, boolean, null, anyOf.
Whitespace follows the reference's constrained-json convention: a
configurable pattern between structural tokens (default minimal)."""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional

STRING_INNER = r'(?:[^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
STRING = f'"{STRING_INNER}*"'
INTEGER = r"(-)?(0|[1-9][0-9]*)"
NUMBER = rf"{INTEGER}(\.[0-9]+)?([eE][+-][0-9]+)?"
BOOLEAN = r"(true|false)"
NULL = r"null"


def _lit(s: str) -> str:
    return re.escape(s)


def schema_to_regex(schema: Any, ws: str = r"[ ]?") -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _build(schema, ws)


def _build(sc: Dict[str, Any], ws: str) -> str:
    if sc is True or sc == {}:
        # any JSON value (bounded nesting depth of 2 for tractability)
        simple = f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
        return simple
    if "enum" in sc:
        opts = "|".join(_lit(json.dumps(v)) for v in sc["enum"])
        return f"(?:{opts})"
    if "const" in sc:
        return _lit(json.dumps(sc["const"]))
    if "anyOf" in sc or "oneOf" in sc:
        subs = sc.get("anyOf") or sc.get("oneOf")
        return "(?:" + "|".join(_build(s, ws) for s in subs) + ")"
    t = sc.get("type")
    if isinstance(t, list):
        return "(?:" + "|".join(
            _build({**sc, "type": x}, ws) for x in t
        ) + ")"
    if t == "string":
        if "pattern" in sc:
            return f'"{sc["pattern"]}"'
        if "maxLength" in sc:
            lo = sc.get("minLength", 0)
            return f'"{STRING_INNER}{{{lo},{sc["maxLength"]}}}"'
        if "minLength" in sc:
            return f'"{STRING_INNER}{{{sc["minLength"]},}}"'
        return STRING
    if t == "integer":
        return INTEGER
    if t == "number":
        return NUMBER
    if t == "boolean":
        return BOOLEAN
    if t == "null":
        return NULL
    if t == "array":
        item = _build(sc.get("items", {}), ws)
        lo = sc.get("minItems", 0)
        hi = sc.get("maxItems")
        if hi is not None and hi == lo == 0:
            return rf"\[{ws}\]"
        rep_lo = max(lo - 1, 0)
        rep = (
            f"{{{rep_lo},{hi - 1}}}" if hi is not None else f"{{{rep_lo},}}"
        )
        body = f"{item}(?:{ws},{ws}{item}){rep}"
        if lo == 0:
            return rf"\[{ws}(?:{body})?{ws}\]"
        return rf"\[{ws}{body}{ws}\]"
    if t == "object" or "properties" in sc:
        props = sc.get("properties", {})
        required = set(sc.get("required", props.keys()))
        parts = []
        for name, sub in props.items():
            pat = f'{_lit(json.dumps(name))}{ws}:{ws}{_build(sub, ws)}'
            parts.append((pat, name in required))
        if not parts:
            return rf"\{{{ws}\}}"
        # emit properties in declaration order; optional ones may be absent
        # (approximation: optional properties render as (part,)? groups)
        segs = []
        first = True
        for pat, req in parts:
            if first:
                seg = pat
                first = False
            else:
                seg = f"{ws},{ws}{pat}"
            segs.append(f"(?:{seg})" + ("" if req else "?"))
        body = "".join(segs)
        return rf"\{{{ws}{body}{ws}\}}"
    # unknown -> any simple value
    return f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"


def build_regex_from_ebnf(ebnf: str) -> str:
    raise NotImplementedError(
        "EBNF grammars are not supported yet; use regex or json_schema"
    )
