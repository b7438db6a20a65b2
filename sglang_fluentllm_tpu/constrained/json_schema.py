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
    """Lower a (G)BNF grammar to a regex by inline rule expansion.

    Supports the practical GBNF subset (reference routes EBNF through
    xgrammar, ``srt/constrained/xgrammar_backend.py``): ``name ::= ...``
    rules, double-quoted literals with escapes, ``[...]`` character
    classes, grouping, alternation ``|``, postfix ``* + ?`` and
    ``{m,n}`` bounds, and rule references. Start rule is ``root``.
    RECURSIVE rules cannot be expressed as a regex and raise
    ValueError — that is the documented limitation of the FSM engine
    (the reference's pushdown machine accepts them).
    """
    rules = _parse_ebnf_rules(ebnf)
    if "root" not in rules:
        raise ValueError("EBNF grammar must define a 'root' rule")

    expanding: list = []
    memo: Dict[str, str] = {}

    def expand(name: str) -> str:
        if name in memo:
            return memo[name]
        if name in expanding:
            raise ValueError(
                f"recursive EBNF rule '{name}' cannot be compiled to a "
                "regular expression"
            )
        if name not in rules:
            raise ValueError(f"undefined EBNF rule '{name}'")
        expanding.append(name)
        pattern = _ebnf_node_to_regex(rules[name], expand)
        expanding.pop()
        memo[name] = pattern
        return pattern

    return expand("root")


def _parse_ebnf_rules(text: str) -> Dict[str, list]:
    """Parse into {name: alternatives-AST}. AST nodes:
    ("lit", s) | ("class", s) | ("ref", name) | ("seq", [n...]) |
    ("alt", [n...]) | ("rep", node, suffix)."""
    import re as _re

    # strip comments
    lines = []
    for ln in text.splitlines():
        out, i, inq = [], 0, False
        while i < len(ln):
            c = ln[i]
            if c == '"' and (i == 0 or ln[i - 1] != "\\"):
                inq = not inq
            if c == "#" and not inq:
                break
            out.append(c)
            i += 1
        lines.append("".join(out))
    text = "\n".join(lines)
    # split on rule heads
    heads = list(_re.finditer(
        r"(?m)^\s*([A-Za-z_][A-Za-z0-9_-]*)\s*::=", text))
    if not heads:
        raise ValueError("no EBNF rules found")
    rules: Dict[str, list] = {}
    for i, m in enumerate(heads):
        body = text[m.end(): heads[i + 1].start()
                    if i + 1 < len(heads) else len(text)]
        rules[m.group(1)] = _parse_ebnf_alt(body.strip())
    return rules


def _parse_ebnf_alt(s: str):
    toks = _ebnf_tokens(s)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def next_tok():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    def parse_alt():
        parts = [parse_seq()]
        while peek() == ("op", "|"):
            next_tok()
            parts.append(parse_seq())
        return ("alt", parts) if len(parts) > 1 else parts[0]

    def parse_seq():
        items = []
        while peek() is not None and peek() not in (
            ("op", "|"), ("op", ")")
        ):
            items.append(parse_item())
        return ("seq", items)

    def parse_item():
        kind, val = next_tok()
        if kind == "lit":
            node = ("lit", val)
        elif kind == "class":
            node = ("class", val)
        elif kind == "name":
            node = ("ref", val)
        elif (kind, val) == ("op", "("):
            node = parse_alt()
            if peek() != ("op", ")"):
                raise ValueError("unbalanced '(' in EBNF")
            next_tok()
        else:
            raise ValueError(f"unexpected EBNF token {val!r}")
        while peek() is not None and peek()[0] == "rep":
            node = ("rep", node, next_tok()[1])
        return node

    node = parse_alt()
    if pos[0] != len(toks):
        raise ValueError("trailing EBNF tokens")
    return node


def _ebnf_tokens(s: str):
    import re as _re

    toks = []
    i = 0
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
        elif c == '"':
            j = i + 1
            buf = []
            while j < len(s) and s[j] != '"':
                if s[j] == "\\":
                    buf.append(s[j:j + 2])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            if j >= len(s):
                raise ValueError("unterminated string literal in EBNF")
            toks.append(("lit", "".join(buf)))
            i = j + 1
        elif c == "[":
            j = i + 1
            while j < len(s) and s[j] != "]":
                j += 2 if s[j] == "\\" else 1
            if j >= len(s):
                raise ValueError("unterminated character class in EBNF")
            toks.append(("class", s[i:j + 1]))
            i = j + 1
        elif c in "*+?":
            toks.append(("rep", c))
            i += 1
        elif c == "{":
            m = _re.match(r"\{\s*\d+\s*(,\s*\d*\s*)?\}", s[i:])
            if not m:
                raise ValueError("bad repetition bound in EBNF")
            toks.append(("rep", m.group(0).replace(" ", "")))
            i += m.end()
        elif c in "()|":
            toks.append(("op", c))
            i += 1
        else:
            m = _re.match(r"[A-Za-z_][A-Za-z0-9_-]*", s[i:])
            if not m:
                raise ValueError(f"bad EBNF character {c!r}")
            toks.append(("name", m.group(0)))
            i += m.end()
    return toks


def _ebnf_node_to_regex(node, expand) -> str:
    import re as _re

    kind = node[0]
    if kind == "lit":
        # unescape EBNF escapes then re-escape for regex
        raw = node[1].encode().decode("unicode_escape")
        return _re.escape(raw)
    if kind == "class":
        return node[1]  # regex-compatible as written
    if kind == "ref":
        return f"(?:{expand(node[1])})"
    if kind == "seq":
        return "".join(_ebnf_node_to_regex(n, expand) for n in node[1])
    if kind == "alt":
        return ("(?:" + "|".join(
            _ebnf_node_to_regex(n, expand) for n in node[1]) + ")")
    if kind == "rep":
        return f"(?:{_ebnf_node_to_regex(node[1], expand)}){node[2]}"
    raise AssertionError(node)
