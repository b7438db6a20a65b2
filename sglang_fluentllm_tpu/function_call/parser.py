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
    def _to_items(objs, tools) -> List[ToolCallItem]:
        valid_names = {
            t.function.name for t in (tools or []) if t and t.function
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


DETECTORS = {
    "qwen25": Qwen25Detector,
    "qwen3": Qwen25Detector,
    "llama3": Llama32Detector,
    "llama32": Llama32Detector,
    "mistral": MistralDetector,
    "deepseekv3": DeepSeekV3Detector,
    "longcat": LongcatDetector,
    "longcat_xml": LongcatXMLDetector,
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
