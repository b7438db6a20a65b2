"""OpenAI-compatible API protocol models.

Analog of the reference's ``srt/entrypoints/openai/protocol.py`` (862 LoC
pydantic protocol). Core request/response surfaces for chat completions,
completions, models and embeddings; tool-call plumbing arrives with the
function_call subsystem.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, Field


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "sglang_fluentllm_tpu"


class ModelList(BaseModel):
    object: str = "list"
    data: List[ModelCard] = []


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0
    prompt_tokens_details: Optional[Dict[str, int]] = None


class FunctionCall(BaseModel):
    name: Optional[str] = None
    arguments: str = ""


class ToolCall(BaseModel):
    id: str
    type: str = "function"
    index: Optional[int] = None
    function: FunctionCall


class Function(BaseModel):
    name: str
    description: Optional[str] = None
    parameters: Optional[Dict[str, Any]] = None
    strict: bool = False


class Tool(BaseModel):
    type: str = "function"
    function: Function


class ChatMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None
    tool_call_id: Optional[str] = None
    name: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: List[ChatMessage]
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    n: int = 1
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[Dict[str, Any]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    response_format: Optional[Dict[str, Any]] = None
    tools: Optional[List[Tool]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = "auto"
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    seed: Optional[int] = None

    def to_sampling_params(self) -> Dict[str, Any]:
        max_new = (
            self.max_completion_tokens or self.max_tokens or 1024
        )
        sp: Dict[str, Any] = dict(
            max_new_tokens=max_new,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            stop=self.stop,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            return_logprob=self.logprobs,
            top_logprobs_num=self.top_logprobs or 0,
        )
        rf = self.response_format
        if rf:
            if rf.get("type") == "json_schema":
                import json as _json

                schema = rf.get("json_schema", {}).get("schema")
                if schema is not None:
                    sp["json_schema"] = _json.dumps(schema)
            elif rf.get("type") == "json_object":
                sp["json_schema"] = '{"type": "object"}'
        return sp


class ChatCompletionChoice(BaseModel):
    index: int
    message: ChatMessage
    logprobs: Optional[Dict[str, Any]] = None
    finish_reason: Optional[str] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{uuid.uuid4().hex}")
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionChoice] = []
    usage: Optional[UsageInfo] = None


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None


class ChatCompletionStreamChoice(BaseModel):
    index: int
    delta: DeltaMessage
    logprobs: Optional[Dict[str, Any]] = None
    finish_reason: Optional[str] = None


class ChatCompletionStreamResponse(BaseModel):
    id: str
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionStreamChoice] = []
    usage: Optional[UsageInfo] = None


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: Union[str, List[str], List[int], List[List[int]]] = ""
    suffix: Optional[str] = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    n: int = 1
    max_tokens: int = 16
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[Dict[str, Any]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    logprobs: Optional[int] = None
    echo: bool = False
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    json_schema: Optional[str] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    seed: Optional[int] = None

    def to_sampling_params(self) -> Dict[str, Any]:
        return dict(
            max_new_tokens=self.max_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            stop=self.stop,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            return_logprob=self.logprobs is not None,
            top_logprobs_num=self.logprobs or 0,
            json_schema=self.json_schema,
            regex=self.regex,
            ebnf=self.ebnf,
        )


class CompletionChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[Dict[str, Any]] = None
    finish_reason: Optional[str] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{uuid.uuid4().hex}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[CompletionChoice] = []
    usage: Optional[UsageInfo] = None


class EmbeddingRequest(BaseModel):
    model: str = ""
    input: Union[str, List[str], List[int], List[List[int]]]
    encoding_format: str = "float"


class ScoringRequest(BaseModel):
    """Reference ``protocol.py:592`` (ScoringRequest)."""

    model: str = ""
    query: Optional[Union[str, List[int]]] = None
    items: Optional[Union[str, List[str], List[List[int]]]] = None
    label_token_ids: Optional[List[int]] = None
    apply_softmax: bool = False
    item_first: bool = False


class ScoringResponse(BaseModel):
    object: str = "scoring"
    model: str = ""
    scores: List[List[float]] = []
    usage: Optional[UsageInfo] = None


class V1RerankReqInput(BaseModel):
    """Reference ``protocol.py:616``."""

    query: str
    documents: List[str]


class RerankResponse(BaseModel):
    score: float
    document: str
    index: int
    meta_info: Optional[Dict[str, Any]] = None


# --- responses API (reference serving_responses.py subset) -------------
class ResponsesRequest(BaseModel):
    model: str = ""
    input: Union[str, List[Dict[str, Any]]] = ""
    instructions: Optional[str] = None
    previous_response_id: Optional[str] = None
    max_output_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    stream: bool = False
    store: bool = True
    background: bool = False
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Union[str, Dict[str, Any]] = "auto"
    max_tool_calls: Optional[int] = None
    metadata: Optional[Dict[str, Any]] = None

    def to_sampling_params(self) -> Dict[str, Any]:
        return dict(
            max_new_tokens=self.max_output_tokens or 1024,
            temperature=self.temperature,
            top_p=self.top_p,
        )


class ResponseOutputText(BaseModel):
    type: str = "output_text"
    text: str = ""
    annotations: List[Dict[str, Any]] = []


class ResponseOutputMessage(BaseModel):
    id: str = Field(
        default_factory=lambda: f"msg_{uuid.uuid4().hex}"
    )
    type: str = "message"
    role: str = "assistant"
    status: str = "completed"
    content: List[ResponseOutputText] = []


class ResponseFunctionToolCall(BaseModel):
    """Responses-API function_call output item."""

    id: str = Field(default_factory=lambda: f"fc_{uuid.uuid4().hex}")
    type: str = "function_call"
    call_id: str = Field(
        default_factory=lambda: f"call_{uuid.uuid4().hex[:24]}"
    )
    name: str = ""
    arguments: str = ""
    status: str = "completed"


class ResponseFunctionToolCallOutput(BaseModel):
    """function_call_output item: the tool's result (server-executed
    tools record it here; clients send it back as an input item)."""

    id: str = Field(default_factory=lambda: f"fco_{uuid.uuid4().hex}")
    type: str = "function_call_output"
    call_id: str = ""
    output: str = ""


class ResponsesUsage(BaseModel):
    input_tokens: int = 0
    output_tokens: int = 0
    total_tokens: int = 0


ResponseOutputItem = Union[
    ResponseOutputMessage, ResponseFunctionToolCall,
    ResponseFunctionToolCallOutput,
]


class ResponsesResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"resp_{uuid.uuid4().hex}")
    object: str = "response"
    created_at: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    # queued | in_progress | completed | failed | cancelled
    status: str = "completed"
    output: List[ResponseOutputItem] = []
    previous_response_id: Optional[str] = None
    instructions: Optional[str] = None
    usage: Optional[ResponsesUsage] = None
    error: Optional[Dict[str, Any]] = None
    metadata: Optional[Dict[str, Any]] = None


class ErrorResponse(BaseModel):
    object: str = "error"
    message: str
    type: str = "invalid_request_error"
    code: int = 400


def finish_reason_to_openai(fr: Optional[Dict[str, Any]]) -> Optional[str]:
    if fr is None:
        return None
    kind = fr.get("type")
    if kind in ("eos", "stop"):
        return "stop"
    if kind == "length":
        return "length"
    if kind == "abort":
        return "abort"
    return kind
