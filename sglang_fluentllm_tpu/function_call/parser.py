"""Function/tool-call parsing.

Analog of the reference's ``srt/function_call/`` (``FunctionCallParser:31``
over model-specific detectors, streaming partial-JSON parsing). Detectors
implemented: qwen25 (``<tool_call>{...}</tool_call>``), llama32
(``<|python_tag|>{...}`` / bare JSON), mistral (``[TOOL_CALLS] [...]``),
deepseek v3 (unicode fenced), plus a generic JSON detector. Streaming
support emits argument fragments incrementally per tool call.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, List, Optional, Tuple


@dataclasses.dataclass
class ToolCallItem:
    tool_index: int
    name: Optional[str]
    parameters: str  # JSON string fragment (streaming) or full


def _try_parse_json(s: str):
    try:
        return json.loads(s), True
    except Exception:  # noqa: BLE001
        return None, False


def _find_json_objects(text: str) -> List[Tuple[int, int, Any]]:
    """Locate top-level JSON objects/arrays in free text."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        if text[i] in "{[":
            depth = 0
            in_str = False
            esc = False
            for j in range(i, n):
                c = text[j]
                if in_str:
                    if esc:
                        esc = False
                    elif c == "\\":
                        esc = True
                    elif c == '"':
                        in_str = False
                    continue
                if c == '"':
                    in_str = True
                elif c in "{[":
                    depth += 1
                elif c in "}]":
                    depth -= 1
                    if depth == 0:
                        obj, ok = _try_parse_json(text[i : j + 1])
                        if ok:
                            out.append((i, j + 1, obj))
                        i = j
                        break
            i += 1
        else:
            i += 1
    return out


class BaseFormatDetector:
    name = "base"
    bot_token: str = ""
    eot_token: str = ""

    def detect_and_parse(self, text: str, tools) -> Tuple[str, List[ToolCallItem]]:
        """Returns (normal_text, tool_calls)."""
        raise NotImplementedError

    def has_tool_call(self, text: str) -> bool:
        return bool(self.bot_token) and self.bot_token in text

    @staticmethod
    def _tool_name(t):
        """Tool spec name from either the pydantic chat-API model or a
        plain dict (responses API)."""
        if isinstance(t, dict):
            return (t.get("function") or {}).get("name")
        fn = getattr(t, "function", None)
        return getattr(fn, "name", None) if fn else None

    @staticmethod
    def _to_items(objs, tools) -> List[ToolCallItem]:
        valid_names = {
            n for n in (
                BaseFormatDetector._tool_name(t) for t in (tools or [])
            ) if n
        } if tools else None
        items = []
        for obj in objs:
            if not isinstance(obj, dict):
                continue
            name = obj.get("name") or (obj.get("function") or {}).get("name")
            args = obj.get("arguments", obj.get("parameters",
                           (obj.get("function") or {}).get("arguments", {})))
            if name is None:
                continue
            if valid_names is not None and name not in valid_names:
                continue
            if not isinstance(args, str):
                args = json.dumps(args)
            items.append(ToolCallItem(len(items), name, args))
        return items


class Qwen25Detector(BaseFormatDetector):
    name = "qwen25"
    bot_token = "<tool_call>"
    eot_token = "</tool_call>"

    def detect_and_parse(self, text, tools):
        normal = []
        objs = []
        rest = text
        while True:
            i = rest.find(self.bot_token)
            if i == -1:
                normal.append(rest)
                break
            normal.append(rest[:i])
            j = rest.find(self.eot_token, i)
            body = rest[i + len(self.bot_token): j if j != -1 else None]
            obj, ok = _try_parse_json(body.strip())
            if ok:
                objs.append(obj)
            rest = rest[j + len(self.eot_token):] if j != -1 else ""
        return "".join(normal).strip(), self._to_items(objs, tools)


class Llama32Detector(BaseFormatDetector):
    name = "llama32"
    bot_token = "<|python_tag|>"

    def detect_and_parse(self, text, tools):
        normal = text
        payload = None
        if self.bot_token in text:
            normal, payload = text.split(self.bot_token, 1)
        elif text.lstrip().startswith("{"):
            normal, payload = "", text
        if payload is None:
            return text.strip(), []
        objs = [o for _, _, o in _find_json_objects(payload)]
        return normal.strip(), self._to_items(objs, tools)

    def has_tool_call(self, text: str) -> bool:
        return self.bot_token in text or text.lstrip().startswith("{")


class MistralDetector(BaseFormatDetector):
    name = "mistral"
    bot_token = "[TOOL_CALLS]"

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal, payload = text.split(self.bot_token, 1)
        objs = []
        for _, _, o in _find_json_objects(payload):
            if isinstance(o, list):
                objs.extend(o)
            else:
                objs.append(o)
        return normal.strip(), self._to_items(objs, tools)


class DeepSeekV3Detector(BaseFormatDetector):
    name = "deepseekv3"
    bot_token = "<｜tool▁calls▁begin｜>"
    eot_token = "<｜tool▁calls▁end｜>"
    call_begin = "<｜tool▁call▁begin｜>"
    call_end = "<｜tool▁call▁end｜>"
    sep = "<｜tool▁sep｜>"

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal, payload = text.split(self.bot_token, 1)
        payload = payload.split(self.eot_token)[0]
        objs = []
        for seg in payload.split(self.call_begin)[1:]:
            seg = seg.split(self.call_end)[0]
            # format: "function<sep>name\n```json\n{...}\n```"
            if self.sep in seg:
                head, rest = seg.split(self.sep, 1)
                name = rest.split("\n", 1)[0].strip()
                m = re.search(r"```json\s*(.*?)```", rest, re.S)
                args, ok = _try_parse_json(m.group(1).strip()) if m else (
                    None, False)
                objs.append({"name": name,
                             "arguments": args if ok else {}})
        return normal.strip(), self._to_items(objs, tools)


class LongcatDetector(BaseFormatDetector):
    """LongCat flagship tool-call format (reference
    ``function_call/longcat_detector.py``): one JSON object per
    ``<longcat_tool_call>\n{...}\n</longcat_tool_call>`` block, blocks
    back to back."""

    name = "longcat"
    bot_token = "<longcat_tool_call>"
    eot_token = "</longcat_tool_call>"

    def detect_and_parse(self, text, tools):
        normal = []
        objs = []
        rest = text
        while True:
            i = rest.find(self.bot_token)
            if i == -1:
                normal.append(rest)
                break
            normal.append(rest[:i])
            j = rest.find(self.eot_token, i)
            body = rest[i + len(self.bot_token): j if j != -1 else None]
            obj, ok = _try_parse_json(body.strip())
            if ok:
                objs.append(obj)
            rest = rest[j + len(self.eot_token):] if j != -1 else ""
        return "".join(normal).strip(), self._to_items(objs, tools)


class LongcatXMLDetector(BaseFormatDetector):
    """LongCat XML arg format (reference
    ``function_call/longcat_xml_detector.py``):

        <longcat_tool_call>name
        <longcat_arg_key>k</longcat_arg_key>
        <longcat_arg_value>v</longcat_arg_value>...
        </longcat_tool_call>

    Arg values parse as JSON when possible, else raw strings."""

    name = "longcat_xml"
    bot_token = "<longcat_tool_call>"
    eot_token = "</longcat_tool_call>"
    ARG_RE = re.compile(
        r"<longcat_arg_key>(.*?)</longcat_arg_key>\s*"
        r"<longcat_arg_value>(.*?)</longcat_arg_value>",
        re.S,
    )

    def detect_and_parse(self, text, tools):
        normal = []
        objs = []
        rest = text
        while True:
            i = rest.find(self.bot_token)
            if i == -1:
                normal.append(rest)
                break
            normal.append(rest[:i])
            j = rest.find(self.eot_token, i)
            body = rest[i + len(self.bot_token): j if j != -1 else None]
            name, _, arg_text = body.partition("\n")
            args = {}
            for k, v in self.ARG_RE.findall(arg_text):
                val, ok = _try_parse_json(v.strip())
                args[k.strip()] = val if ok else v.strip()
            objs.append({"name": name.strip(), "arguments": args})
            rest = rest[j + len(self.eot_token):] if j != -1 else ""
        return "".join(normal).strip(), self._to_items(objs, tools)


class DeepSeekV32Detector(BaseFormatDetector):
    """DeepSeek V3.2 DSML format (reference
    ``function_call/deepseekv32_detector.py``): calls wrapped in
    ``<｜DSML｜function_calls>``, each invoke as
    ``<｜DSML｜invoke name="fn">`` with either XML parameter tags
    (``<｜DSML｜parameter name="k" string="true">v</｜DSML｜parameter>``)
    or a direct JSON object body."""

    name = "deepseekv32"
    bot_token = "<｜DSML｜function_calls>"
    eot_token = "</｜DSML｜function_calls>"
    INVOKE_RE = re.compile(
        r'<｜DSML｜invoke\s+name="([^"]+)"\s*>(.*?)</｜DSML｜invoke>',
        re.S,
    )
    PARAM_RE = re.compile(
        r'<｜DSML｜parameter\s+name="([^"]+)"'
        r'(?:\s+string="([^"]*)")?\s*>(.*?)</｜DSML｜parameter>',
        re.S,
    )

    def detect_and_parse(self, text, tools):
        normal = []
        objs = []
        rest = text
        while True:
            i = rest.find(self.bot_token)
            if i == -1:
                normal.append(rest)
                break
            normal.append(rest[:i])
            j = rest.find(self.eot_token, i)
            body = rest[i + len(self.bot_token): j if j != -1 else None]
            for fn_name, inner in self.INVOKE_RE.findall(body):
                params = self.PARAM_RE.findall(inner)
                if params:
                    args = {}
                    for k, is_str, v in params:
                        v = v.strip()
                        if is_str == "true":
                            args[k] = v
                        else:
                            val, ok = _try_parse_json(v)
                            args[k] = val if ok else v
                else:
                    val, ok = _try_parse_json(inner.strip())
                    args = val if ok and isinstance(val, dict) else {}
                objs.append({"name": fn_name, "arguments": args})
            rest = rest[j + len(self.eot_token):] if j != -1 else ""
        return "".join(normal).strip(), self._to_items(objs, tools)


class GenericJsonDetector(BaseFormatDetector):
    """Fallback: any top-level {"name": ..., "arguments"/"parameters": ...}."""

    name = "json"

    def detect_and_parse(self, text, tools):
        spans = _find_json_objects(text)
        objs = []
        keep = []
        last = 0
        for i, j, o in spans:
            if isinstance(o, dict) and (
                "name" in o and ("arguments" in o or "parameters" in o)
            ):
                keep.append(text[last:i])
                last = j
                objs.append(o)
        keep.append(text[last:])
        return "".join(keep).strip(), self._to_items(objs, tools)

    def has_tool_call(self, text: str) -> bool:
        _, items = self.detect_and_parse(text, None)
        return bool(items)



class DeepSeekV31Detector(BaseFormatDetector):
    """DeepSeek V3.1/V3.2 format (reference deepseekv31_detector.py /
    deepseekv32_detector.py): ``<tool_call_begin>{name}<tool_sep>{json}
    <tool_call_end>`` — name directly, args as plain JSON."""

    name = "deepseekv31"
    bot_token = "<｜tool▁calls▁begin｜>"
    eot_token = "<｜tool▁calls▁end｜>"
    call_begin = "<｜tool▁call▁begin｜>"
    call_end = "<｜tool▁call▁end｜>"
    sep = "<｜tool▁sep｜>"

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal, payload = text.split(self.bot_token, 1)
        payload = payload.split(self.eot_token)[0]
        objs = []
        for seg in payload.split(self.call_begin)[1:]:
            seg = seg.split(self.call_end)[0]
            if self.sep in seg:
                name, rest = seg.split(self.sep, 1)
                args, ok = _try_parse_json(rest.strip())
                objs.append({"name": name.strip(),
                             "arguments": args if ok else {}})
        return normal.strip(), self._to_items(objs, tools)


class Glm4MoeDetector(BaseFormatDetector):
    """GLM-4.5/4.6 (reference glm4_moe_detector.py):
    ``<tool_call>name\n<arg_key>k</arg_key><arg_value>v</arg_value>...
    </tool_call>``."""

    name = "glm4_moe"
    bot_token = "<tool_call>"
    eot_token = "</tool_call>"

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal = text.split(self.bot_token, 1)[0]
        objs = []
        for m in re.findall(r"<tool_call>(.*?)</tool_call>", text, re.S):
            dm = re.match(r"([^\n]*)\n(.*)", m, re.S)
            if not dm:
                continue
            name = dm.group(1).strip()
            args = {}
            for k, v in re.findall(
                r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>",
                dm.group(2), re.S,
            ):
                val, ok = _try_parse_json(v.strip())
                args[k.strip()] = val if ok else v.strip()
            objs.append({"name": name, "arguments": args})
        return normal.strip(), self._to_items(objs, tools)

    def has_tool_call(self, text: str) -> bool:
        # distinguish from qwen25's identical bot token by the arg_key tag
        return self.bot_token in text


class KimiK2Detector(BaseFormatDetector):
    """Kimi K2 (reference kimik2_detector.py):
    ``<|tool_calls_section_begin|><|tool_call_begin|>functions.name:idx
    <|tool_call_argument_begin|>{json}<|tool_call_end|>...``."""

    name = "kimi_k2"
    bot_token = "<|tool_calls_section_begin|>"
    eot_token = "<|tool_calls_section_end|>"
    _call_re = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<tid>[\w\.]+:\d+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>\{.*?\})\s*"
        r"<\|tool_call_end\|>", re.S,
    )

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal = text.split(self.bot_token, 1)[0]
        objs = []
        for m in self._call_re.finditer(text):
            tid = m.group("tid")  # functions.get_weather:0
            name = tid.split(":")[0]
            if "." in name:
                name = name.split(".", 1)[1]
            args, ok = _try_parse_json(m.group("args"))
            objs.append({"name": name, "arguments": args if ok else {}})
        return normal.strip(), self._to_items(objs, tools)


class Qwen3CoderDetector(BaseFormatDetector):
    """Qwen3-Coder XML (reference qwen3_coder_detector.py):
    ``<tool_call><function=name><parameter=key>value</parameter>...
    </function></tool_call>``."""

    name = "qwen3_coder"
    bot_token = "<tool_call>"
    eot_token = "</tool_call>"

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal = text.split(self.bot_token, 1)[0]
        objs = []
        for block in re.findall(r"<tool_call>(.*?)</tool_call>", text,
                                re.S):
            fm = re.search(r"<function=(.*?)>(.*?)</function>", block,
                           re.S)
            if not fm:
                continue
            name = fm.group(1).strip()
            args = {}
            for pm in re.finditer(
                r"<parameter=(.*?)>(.*?)</parameter>", fm.group(2), re.S
            ):
                raw = pm.group(2).strip()
                val, ok = _try_parse_json(raw)
                args[pm.group(1).strip()] = val if ok else raw
            objs.append({"name": name, "arguments": args})
        return normal.strip(), self._to_items(objs, tools)


class PythonicDetector(BaseFormatDetector):
    """Llama-4 pythonic calls (reference pythonic_detector.py):
    ``[name(kw=value, ...), other(...)]`` parsed via the Python AST."""

    name = "pythonic"
    _re = re.compile(r"\[[A-Za-z_]\w*\(.*\)\s*\]", re.S)

    def has_tool_call(self, text: str) -> bool:
        return bool(self._re.search(text))

    def detect_and_parse(self, text, tools):
        import ast

        m = self._re.search(text)
        if not m:
            return text.strip(), []
        normal = text[:m.start()] + text[m.end():]
        objs = []
        try:
            node = ast.parse(m.group(0).strip(), mode="eval")
            if isinstance(node.body, ast.List):
                for call in node.body.elts:
                    if not isinstance(call, ast.Call):
                        continue
                    name = getattr(call.func, "id", None)
                    if name is None:
                        continue
                    args = {}
                    for kw in call.keywords:
                        try:
                            args[kw.arg] = ast.literal_eval(kw.value)
                        except (ValueError, SyntaxError):
                            continue
                    objs.append({"name": name, "arguments": args})
        except SyntaxError:
            return text.strip(), []
        return normal.strip(), self._to_items(objs, tools)


class Step3Detector(BaseFormatDetector):
    """Step3 steptml format (reference step3_detector.py)."""

    name = "step3"
    bot_token = "<｜tool_calls_begin｜>"
    eot_token = "<｜tool_calls_end｜>"
    _invoke_re = re.compile(
        r'<steptml:invoke name="([^"]+)">(.*?)</steptml:invoke>', re.S)
    _param_re = re.compile(
        r'<steptml:parameter name="([^"]+)">(.*?)</steptml:parameter>',
        re.S)

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal = text.split(self.bot_token, 1)[0]
        objs = []
        for im in self._invoke_re.finditer(text):
            args = {}
            for pm in self._param_re.finditer(im.group(2)):
                raw = pm.group(2).strip()
                val, ok = _try_parse_json(raw)
                args[pm.group(1)] = val if ok else raw
            objs.append({"name": im.group(1), "arguments": args})
        return normal.strip(), self._to_items(objs, tools)


class GptOssDetector(BaseFormatDetector):
    """gpt-oss harmony commentary channel (reference
    gpt_oss_detector.py): ``<|channel|>commentary
    to=functions.name<|constrain|>json<|message|>{args}<|call|>``."""

    name = "gpt_oss"
    bot_token = "<|channel|>commentary to="
    _call_re = re.compile(
        r"to=([A-Za-z_][\w.-]*)\s*<\|constrain\|>json"
        r"<\|message\|>(.*?)(?:<\|call\|>|$)", re.S,
    )

    def detect_and_parse(self, text, tools):
        if self.bot_token not in text:
            return text.strip(), []
        normal = text.split("<|channel|>", 1)[0]
        objs = []
        for m in self._call_re.finditer(text):
            name = m.group(1)
            if "." in name:
                name = name.split(".", 1)[1]
            args, ok = _try_parse_json(m.group(2).strip())
            objs.append({"name": name, "arguments": args if ok else {}})
        # the final channel's message is user-visible content
        fm = re.search(r"<\|channel\|>final<\|message\|>(.*)", text,
                       re.S)
        if fm:
            normal = (normal + fm.group(1)).strip()
        return normal.strip(), self._to_items(objs, tools)


DETECTORS = {
    "qwen25": Qwen25Detector,
    "qwen3": Qwen25Detector,
    "llama3": Llama32Detector,
    "llama32": Llama32Detector,
    "mistral": MistralDetector,
    "deepseekv3": DeepSeekV3Detector,
    "longcat": LongcatDetector,
    "longcat_xml": LongcatXMLDetector,
    "deepseekv31": DeepSeekV31Detector,
    "deepseekv32": DeepSeekV32Detector,
    "glm4_moe": Glm4MoeDetector,
    "glm45": Glm4MoeDetector,
    "kimi_k2": KimiK2Detector,
    "qwen3_coder": Qwen3CoderDetector,
    "pythonic": PythonicDetector,
    "step3": Step3Detector,
    "gpt-oss": GptOssDetector,
    "gpt_oss": GptOssDetector,
    "json": GenericJsonDetector,
}


@dataclasses.dataclass
class StreamingParseResult:
    """One streaming step's output (reference base_format_detector
    ``parse_streaming_increment`` contract)."""

    normal_text: str = ""
    calls: List[ToolCallItem] = dataclasses.field(default_factory=list)


class FunctionCallParser:
    """Dispatches to a model-specific detector (reference
    function_call/function_call_parser.py:31)."""

    def __init__(self, tools, tool_call_parser: str = "json"):
        cls = DETECTORS.get(tool_call_parser)
        if cls is None:
            raise ValueError(
                f"unknown tool_call_parser {tool_call_parser}; "
                f"available: {sorted(DETECTORS)}"
            )
        self.detector = cls()
        self.tools = tools

    def has_tool_call(self, text: str) -> bool:
        return self.detector.has_tool_call(text)

    def parse_non_stream(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        return self.detector.detect_and_parse(text, self.tools)

    # ---- streaming (reference parse_streaming_increment) --------------
    def parse_stream_chunk(self, delta_text: str) -> "StreamingParseResult":
        """Incremental parse (reference base_format_detector
        ``parse_streaming_increment``): text before a tool-call trigger
        streams through; once triggered, text buffers and each tool call
        is emitted as its closing marker arrives. Detectors without a
        closing marker emit at ``parse_stream_final``."""
        if not hasattr(self, "_buf"):
            self._buf = ""
            self._emitted = 0
        self._buf += delta_text
        det = self.detector
        if not det.bot_token:
            return StreamingParseResult()  # flushed at final
        idx = self._buf.find(det.bot_token)
        if idx == -1:
            # emit everything except a tail that could begin the trigger
            hold = 0
            for k in range(min(len(det.bot_token) - 1, len(self._buf)),
                           0, -1):
                if self._buf.endswith(det.bot_token[:k]):
                    hold = k
                    break
            cut = len(self._buf) - hold
            normal, self._buf = self._buf[:cut], self._buf[cut:]
            return StreamingParseResult(normal_text=normal)
        normal = self._buf[:idx]
        pending = self._buf[idx:]
        self._buf = pending
        calls = []
        if det.eot_token:
            n_complete = pending.count(det.eot_token)
            if n_complete > self._emitted:
                _, items = det.detect_and_parse(pending, self.tools)
                calls = items[self._emitted:n_complete]
                self._emitted = n_complete
        return StreamingParseResult(normal_text=normal, calls=calls)

    def parse_stream_final(self) -> "StreamingParseResult":
        """Flush: parse whatever is still buffered (tool calls for
        markerless detectors, trailing text otherwise)."""
        buf = getattr(self, "_buf", "")
        emitted = getattr(self, "_emitted", 0)
        self._buf, self._emitted = "", 0
        if not buf:
            return StreamingParseResult()
        normal, items = self.detector.detect_and_parse(buf, self.tools)
        return StreamingParseResult(normal_text=normal,
                                    calls=items[emitted:])
