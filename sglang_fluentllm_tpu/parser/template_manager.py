"""Centralized chat / completion template resolution.

Parity target: reference ``srt/managers/template_manager.py`` (263 LoC) plus
the pieces of ``srt/parser/conversation.py``, ``code_completion_parser.py``
and ``jinja_template_utils.py`` it drives. Host-only code — no device work.

Responsibilities:
- resolve a chat template from (a) a built-in name, (b) a ``.jinja`` file,
  (c) a ``.json`` conversation-template file, or (d) the tokenizer's own HF
  jinja template (the fallback);
- detect whether a jinja template iterates message content parts ("openai"
  format) or expects plain strings ("string" format)
  (ref jinja_template_utils.detect_jinja_template_content_format);
- detect force-reasoning templates (``<think>`` in the generation prompt,
  ref template_manager.py:86-106);
- fill-in-the-middle (FIM) completion templates for code completion with
  ``suffix`` (ref code_completion_parser.py:87-101).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import logging
import os
import re
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# conversation (named chat) templates
# ---------------------------------------------------------------------------
class SeparatorStyle(enum.Enum):
    ADD_COLON_SINGLE = enum.auto()   # "role: msg<sep>"
    ADD_COLON_TWO = enum.auto()      # user sep vs assistant sep2
    NO_COLON_SINGLE = enum.auto()    # "rolemsg<sep>"
    CHATML = enum.auto()             # <|im_start|>role\nmsg<|im_end|>
    LLAMA3 = enum.auto()             # <|start_header_id|>... llama-3 headers


@dataclasses.dataclass
class Conversation:
    """A named, non-jinja chat template (ref conversation.Conversation)."""

    name: str
    system_template: str = "{system_message}"
    system_message: str = ""
    roles: Tuple[str, str] = ("user", "assistant")
    sep_style: SeparatorStyle = SeparatorStyle.ADD_COLON_SINGLE
    sep: str = "\n"
    sep2: str = ""
    stop_str: Any = None

    def render(
        self,
        messages: List[Dict[str, Any]],
        add_generation_prompt: bool = True,
    ) -> str:
        """Render an OpenAI-style message list to a prompt string."""
        system = self.system_message
        turns: List[Tuple[str, str]] = []
        for m in messages:
            content = m.get("content") or ""
            if isinstance(content, list):  # openai content parts
                content = "".join(
                    p.get("text", "") for p in content if isinstance(p, dict)
                )
            if m["role"] == "system":
                system = content
            else:
                role = self.roles[0 if m["role"] != "assistant" else 1]
                turns.append((role, content))

        parts: List[str] = []
        st = self.sep_style
        if st == SeparatorStyle.CHATML:
            if system:
                parts.append(f"<|im_start|>system\n{system}<|im_end|>\n")
            for role, msg in turns:
                parts.append(f"<|im_start|>{role}\n{msg}<|im_end|>\n")
            if add_generation_prompt:
                parts.append(f"<|im_start|>{self.roles[1]}\n")
        elif st == SeparatorStyle.LLAMA3:
            parts.append("<|begin_of_text|>")
            if system:
                parts.append(
                    "<|start_header_id|>system<|end_header_id|>\n\n"
                    f"{system}<|eot_id|>"
                )
            for role, msg in turns:
                parts.append(
                    f"<|start_header_id|>{role}<|end_header_id|>\n\n"
                    f"{msg}<|eot_id|>"
                )
            if add_generation_prompt:
                parts.append(
                    f"<|start_header_id|>{self.roles[1]}<|end_header_id|>\n\n"
                )
        else:
            if system:
                parts.append(
                    self.system_template.format(system_message=system) + self.sep
                )
            seps = (
                (self.sep, self.sep2 or self.sep)
                if st == SeparatorStyle.ADD_COLON_TWO
                else (self.sep, self.sep)
            )
            for i, (role, msg) in enumerate(turns):
                colon = "" if st == SeparatorStyle.NO_COLON_SINGLE else ": "
                parts.append(f"{role}{colon}{msg}{seps[i % 2]}")
            if add_generation_prompt:
                colon = "" if st == SeparatorStyle.NO_COLON_SINGLE else ":"
                parts.append(f"{self.roles[1]}{colon}")
        return "".join(parts)


_CONV_TEMPLATES: Dict[str, Conversation] = {}


def register_conv_template(conv: Conversation, override: bool = False) -> None:
    if not override and conv.name in _CONV_TEMPLATES:
        raise ValueError(f"chat template {conv.name!r} already registered")
    _CONV_TEMPLATES[conv.name] = conv


def chat_template_exists(name: str) -> bool:
    return name in _CONV_TEMPLATES


def get_conv_template(name: str) -> Conversation:
    return _CONV_TEMPLATES[name]


register_conv_template(Conversation(name="chatml", sep_style=SeparatorStyle.CHATML))
register_conv_template(
    Conversation(
        name="qwen",
        system_message="You are a helpful assistant.",
        sep_style=SeparatorStyle.CHATML,
        stop_str="<|im_end|>",
    )
)
register_conv_template(
    Conversation(
        name="llama-3",
        sep_style=SeparatorStyle.LLAMA3,
        roles=("user", "assistant"),
        stop_str="<|eot_id|>",
    )
)
register_conv_template(
    Conversation(
        name="vicuna_v1.1",
        system_message=(
            "A chat between a curious user and an artificial intelligence "
            "assistant. The assistant gives helpful, detailed, and polite "
            "answers to the user's questions."
        ),
        roles=("USER", "ASSISTANT"),
        sep_style=SeparatorStyle.ADD_COLON_TWO,
        sep=" ",
        sep2="</s>",
    )
)
register_conv_template(
    Conversation(
        name="deepseek",
        roles=("User", "Assistant"),
        sep_style=SeparatorStyle.ADD_COLON_TWO,
        sep="\n\n",
        sep2="<｜end▁of▁sentence｜>",
    )
)


# ---------------------------------------------------------------------------
# FIM completion templates
# ---------------------------------------------------------------------------
class FimPosition(enum.Enum):
    MIDDLE = enum.auto()  # begin PROMPT middle SUFFIX end
    END = enum.auto()     # begin PROMPT end SUFFIX middle


@dataclasses.dataclass
class CompletionTemplate:
    name: str
    fim_begin_token: str
    fim_middle_token: str
    fim_end_token: str
    fim_position: FimPosition


_COMPLETION_TEMPLATES: Dict[str, CompletionTemplate] = {}


def register_completion_template(
    t: CompletionTemplate, override: bool = False
) -> None:
    if not override and t.name in _COMPLETION_TEMPLATES:
        raise ValueError(f"completion template {t.name!r} already registered")
    _COMPLETION_TEMPLATES[t.name] = t


def completion_template_exists(name: str) -> bool:
    return name in _COMPLETION_TEMPLATES


register_completion_template(
    CompletionTemplate(
        "deepseek_coder",
        "<｜fim▁begin｜>", "<｜fim▁hole｜>", "<｜fim▁end｜>",
        FimPosition.MIDDLE,
    )
)
register_completion_template(
    CompletionTemplate(
        "star_coder",
        "<fim_prefix>", "<fim_middle>", "<fim_suffix>", FimPosition.END,
    )
)
register_completion_template(
    CompletionTemplate(
        "qwen_coder",
        "<|fim_prefix|>", "<|fim_middle|>", "<|fim_suffix|>", FimPosition.END,
    )
)


def generate_completion_prompt(
    prompt: str, suffix: str, template: CompletionTemplate
) -> str:
    """ref code_completion_parser.generate_completion_prompt:87-101."""
    b, m, e = (
        template.fim_begin_token,
        template.fim_middle_token,
        template.fim_end_token,
    )
    if template.fim_position == FimPosition.MIDDLE:
        return f"{b}{prompt}{m}{suffix}{e}"
    return f"{b}{prompt}{e}{suffix}{m}"


# ---------------------------------------------------------------------------
# jinja content-format + reasoning detection
# ---------------------------------------------------------------------------
def detect_jinja_content_format(template: Optional[str]) -> str:
    """'openai' if the template iterates message content parts, else 'string'.

    Mirrors reference jinja_template_utils.detect_jinja_template_content_format
    (AST walk for ``for part in message['content']``); a jinja2 AST walk when
    jinja2 is importable, with a regex fallback.
    """
    if not template:
        return "string"
    try:
        import jinja2

        ast = jinja2.Environment().parse(template)
        for node in ast.find_all(jinja2.nodes.For):
            it = node.iter
            while isinstance(it, (jinja2.nodes.Filter, jinja2.nodes.Test)):
                it = it.node
            if isinstance(it, jinja2.nodes.Getitem):
                if (
                    isinstance(it.arg, jinja2.nodes.Const)
                    and it.arg.value == "content"
                ):
                    return "openai"
            elif isinstance(it, jinja2.nodes.Getattr) and it.attr == "content":
                return "openai"
        return "string"
    except Exception:
        pat = r"for\s+\w+\s+in\s+\w+(\[.content.\]|\.content)"
        return "openai" if re.search(pat, template) else "string"


def detect_force_reasoning(template: Optional[str]) -> bool:
    """ref template_manager._detect_reasoning_pattern:86-106."""
    if not template:
        return False
    has = re.search(r"<\|im_start\|>assistant\\n<think>\\n", template) is not None
    m = re.search(r"enable_thinking\s*\|\s*default\((true|false|.*?)\)", template)
    if m is not None:
        has = m.group(1) == "true"
    return has


# ---------------------------------------------------------------------------
# the manager
# ---------------------------------------------------------------------------
class TemplateManager:
    """Resolves and applies chat + completion templates for one server.

    ``resolve_chat(messages, ...)`` returns a rendered prompt string when a
    built-in / file template owns rendering, or None when the HF tokenizer's
    own jinja template should be used (possibly with ``custom_jinja``
    overriding it).
    """

    def __init__(self) -> None:
        self.chat_template_name: Optional[str] = None
        self.completion_template_name: Optional[str] = None
        self.custom_jinja: Optional[str] = None
        self.jinja_content_format: str = "string"
        self.force_reasoning: bool = False

    # -- init ---------------------------------------------------------
    def initialize(
        self,
        tokenizer: Any = None,
        chat_template: Optional[str] = None,
        completion_template: Optional[str] = None,
    ) -> None:
        if chat_template:
            self._load_chat_template(chat_template)
        if completion_template:
            self._load_completion_template(completion_template)
        tmpl = self.custom_jinja or getattr(tokenizer, "chat_template", None)
        if self.chat_template_name is None:
            self.jinja_content_format = detect_jinja_content_format(tmpl)
        self.force_reasoning = detect_force_reasoning(tmpl)

    def _load_chat_template(self, arg: str) -> None:
        if chat_template_exists(arg):
            self.chat_template_name = arg
            return
        if not os.path.exists(arg):
            raise RuntimeError(
                f"chat template {arg!r} is neither a built-in name nor a file"
            )
        if arg.endswith(".jinja"):
            with open(arg) as fp:
                self.custom_jinja = fp.read().strip("\n").replace("\\n", "\n")
            self.chat_template_name = None
        elif arg.endswith(".json"):
            with open(arg) as fp:
                t = json.load(fp)
            register_conv_template(
                Conversation(
                    name=t["name"],
                    system_template=t.get("system", "{system_message}"),
                    system_message=t.get("system_message", ""),
                    roles=(t["user"], t["assistant"]),
                    sep_style=SeparatorStyle[t["sep_style"]],
                    sep=t.get("sep", "\n"),
                    sep2=t.get("sep2", ""),
                    stop_str=t.get("stop_str"),
                ),
                override=True,
            )
            self.chat_template_name = t["name"]
        else:
            raise RuntimeError(f"unrecognized chat template file: {arg!r}")

    def _load_completion_template(self, arg: str) -> None:
        if completion_template_exists(arg):
            self.completion_template_name = arg
            return
        if not (os.path.exists(arg) and arg.endswith(".json")):
            raise RuntimeError(
                f"completion template {arg!r} is neither built-in nor a json file"
            )
        with open(arg) as fp:
            t = json.load(fp)
        register_completion_template(
            CompletionTemplate(
                name=t["name"],
                fim_begin_token=t["fim_begin_token"],
                fim_middle_token=t["fim_middle_token"],
                fim_end_token=t["fim_end_token"],
                fim_position=FimPosition[t["fim_position"]],
            ),
            override=True,
        )
        self.completion_template_name = t["name"]

    # -- application --------------------------------------------------
    def resolve_chat(
        self,
        messages: List[Dict[str, Any]],
        add_generation_prompt: bool = True,
    ) -> Optional[str]:
        if self.chat_template_name is None:
            return None
        conv = get_conv_template(self.chat_template_name)
        return conv.render(messages, add_generation_prompt)

    def stop_strings(self) -> List[str]:
        if self.chat_template_name is None:
            return []
        s = get_conv_template(self.chat_template_name).stop_str
        if not s:
            return []
        return [s] if isinstance(s, str) else list(s)

    def fim_prompt(self, prompt: str, suffix: Optional[str]) -> str:
        """Apply the FIM completion template when a suffix is present
        (ref code_completion_parser.generate_completion_prompt_from_request)."""
        if not suffix or self.completion_template_name is None:
            return prompt
        return generate_completion_prompt(
            prompt, suffix, _COMPLETION_TEMPLATES[self.completion_template_name]
        )
