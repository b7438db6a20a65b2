"""JSON schema -> regex (outlines-style schema lowering).

Covers the common schema subset: object (properties/required/
additionalProperties=false), array (items, minItems/maxItems), string
(enum/const/pattern/maxLength), number, integer, boolean, null, anyOf,
``$ref``/``$defs`` — including RECURSIVE references. Recursion is lowered
by bounded structural expansion: each self-reference is inlined up to a
configurable depth (the regular-language image of a pushdown automaton
with a bounded stack — VERDICT r2 #6; the reference's xgrammar PDA is
unbounded, ``srt/constrained/base_grammar_backend.py:79-108``). At the
depth floor, recursive branches are PRUNED (an anyOf drops them, an
optional property disappears, a minItems=0 array bottoms out at ``[]``);
a schema with no finite derivation within the budget raises.

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
SIMPLE = f"(?:{STRING}|{NUMBER}|{BOOLEAN}|{NULL})"

DEFAULT_RECURSION_DEPTH = 5


def _lit(s: str) -> str:
    return re.escape(s)


def schema_to_regex(schema: Any, ws: str = r"[ ]?",
                    max_depth: int = DEFAULT_RECURSION_DEPTH) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    ctx = _Ctx(schema, ws, max_depth)
    out = _build(schema, ctx, max_depth)
    if out is None:
        raise ValueError(
            f"schema has no finite derivation within recursion depth "
            f"{max_depth}"
        )
    return out


class _Ctx:
    def __init__(self, root, ws, max_depth):
        self.root = root
        self.ws = ws
        self.max_depth = max_depth

    def resolve(self, ref: str):
        """JSON-pointer resolution relative to the root schema
        ('#', '#/$defs/x', '#/definitions/x', any '#/a/b' path)."""
        if not ref.startswith("#"):
            raise ValueError(f"only intra-document $ref supported: {ref}")
        node = self.root
        for part in ref[1:].strip("/").split("/"):
            if not part:
                continue
            part = part.replace("~1", "/").replace("~0", "~")
            node = node[part]
        return node


ANY_VALUE_MAX = 3  # untyped-value nesting cap (regex grows ~5x/level)


def _any_value(ctx: _Ctx, depth: int) -> str:
    """'any JSON value' with bounded nesting (replaces the old fixed
    flat cap)."""
    depth = min(depth, ANY_VALUE_MAX)
    if depth <= 0:
        return SIMPLE
    ws = ctx.ws
    inner = _any_value(ctx, depth - 1)
    arr = rf"\[{ws}(?:{inner}(?:{ws},{ws}{inner})*)?{ws}\]"
    member = f'{STRING}{ws}:{ws}{inner}'
    obj = rf"\{{{ws}(?:{member}(?:{ws},{ws}{member})*)?{ws}\}}"
    return f"(?:{SIMPLE}|{arr}|{obj})"


def _build(sc, ctx: _Ctx, depth: int) -> Optional[str]:
    """Lower one schema node; None = no finite derivation at this depth
    (recursive branch pruned by the caller)."""
    ws = ctx.ws
    if sc is True or sc == {}:
        return _any_value(ctx, depth)
    if "$ref" in sc:
        if depth <= 0:
            return None  # bottom of the bounded stack: prune
        return _build(ctx.resolve(sc["$ref"]), ctx, depth - 1)
    if "enum" in sc:
        opts = "|".join(_lit(json.dumps(v)) for v in sc["enum"])
        return f"(?:{opts})"
    if "const" in sc:
        return _lit(json.dumps(sc["const"]))
    if "anyOf" in sc or "oneOf" in sc:
        subs = sc.get("anyOf") or sc.get("oneOf")
        built = [_build(s, ctx, depth) for s in subs]
        built = [b for b in built if b is not None]
        if not built:
            return None
        return "(?:" + "|".join(built) + ")"
    t = sc.get("type")
    if isinstance(t, list):
        built = [_build({**sc, "type": x}, ctx, depth) for x in t]
        built = [b for b in built if b is not None]
        if not built:
            return None
        return "(?:" + "|".join(built) + ")"
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
        item = _build(sc.get("items", {}), ctx, depth)
        lo = sc.get("minItems", 0)
        hi = sc.get("maxItems")
        if item is None:
            # recursive item at the depth floor: only the empty array
            # remains derivable
            if lo == 0:
                return rf"\[{ws}\]"
            return None
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
            built = _build(sub, ctx, depth)
            if built is None:
                if name in required:
                    return None  # required recursive member: prune object
                continue  # optional recursive member: absent at the floor
            pat = f'{_lit(json.dumps(name))}{ws}:{ws}{built}'
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
    return SIMPLE


def build_regex_from_ebnf(
    ebnf: str, max_depth: int = DEFAULT_RECURSION_DEPTH
) -> str:
    """Lower a (G)BNF grammar to a regex by inline rule expansion.

    Supports the practical GBNF subset (reference routes EBNF through
    xgrammar, ``srt/constrained/xgrammar_backend.py``): ``name ::= ...``
    rules, double-quoted literals with escapes, ``[...]`` character
    classes, grouping, alternation ``|``, postfix ``* + ?`` and
    ``{m,n}`` bounds, and rule references. Start rule is ``root``.

    RECURSIVE rules (self- or mutually-referential) are lowered by
    bounded structural expansion, ``max_depth`` levels deep — the
    regular image of the reference's pushdown machine with a bounded
    stack (VERDICT r2 #6). At the floor, recursive alternatives are
    pruned (an alternation drops them; a ``*``/``?``/``{0,..}``
    repetition bottoms out empty); a grammar with no finite derivation
    within the budget raises.
    """
    rules = _parse_ebnf_rules(ebnf)
    if "root" not in rules:
        raise ValueError("EBNF grammar must define a 'root' rule")

    # per-rule expansion counters implement the bounded stack: a rule may
    # appear at most max_depth times on the expansion path
    counts: Dict[str, int] = {}

    def expand(name: str) -> Optional[str]:
        if name not in rules:
            raise ValueError(f"undefined EBNF rule '{name}'")
        if counts.get(name, 0) >= max_depth:
            return None  # bottom of the bounded stack: prune
        counts[name] = counts.get(name, 0) + 1
        try:
            return _ebnf_node_to_regex(rules[name], expand)
        finally:
            counts[name] -= 1

    out = expand("root")
    if out is None:
        raise ValueError(
            f"EBNF grammar has no finite derivation within recursion "
            f"depth {max_depth}"
        )
    return out


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


def _ebnf_node_to_regex(node, expand) -> Optional[str]:
    """None propagates 'no finite derivation at this depth' upward:
    alternations drop such branches, min-0 repetitions bottom out empty,
    everything else fails the enclosing derivation."""
    import re as _re

    kind = node[0]
    if kind == "lit":
        # unescape EBNF escapes then re-escape for regex
        raw = node[1].encode().decode("unicode_escape")
        return _re.escape(raw)
    if kind == "class":
        return node[1]  # regex-compatible as written
    if kind == "ref":
        sub = expand(node[1])
        return None if sub is None else f"(?:{sub})"
    if kind == "seq":
        parts = [_ebnf_node_to_regex(n, expand) for n in node[1]]
        if any(p is None for p in parts):
            return None
        return "".join(parts)
    if kind == "alt":
        parts = [_ebnf_node_to_regex(n, expand) for n in node[1]]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return "(?:" + "|".join(parts) + ")"
    if kind == "rep":
        sub = _ebnf_node_to_regex(node[1], expand)
        if sub is None:
            # x* / x? / x{0,n} derive the empty string at the floor
            if node[2][0] in "*?" or node[2].startswith("{0"):
                return ""
            return None
        return f"(?:{sub}){node[2]}"
    raise AssertionError(node)
