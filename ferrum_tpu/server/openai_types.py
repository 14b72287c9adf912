"""OpenAI-compatible request/response types + field-level validation.

TPU-native analog of the reference's OpenAI surface
(crates/ferrum-server/src/{openai.rs,types.rs} and the documented
accept/reject contract in docs/openai-api-compatibility.md): every
unsupported field rejects with HTTP 400 and a `param` pointer instead of
being silently dropped.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, Field

from ..types import GuidedOptions, InvalidRequestError, SamplingParams


# ---------------------------------------------------------------------------
# Requests
# ---------------------------------------------------------------------------

class ChatMessage(BaseModel):
    model_config = ConfigDict(extra="allow")
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    name: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None
    tool_call_id: Optional[str] = None
    function_call: Optional[Dict[str, Any]] = None


class StreamOptions(BaseModel):
    include_usage: bool = False


class ResponseFormat(BaseModel):
    model_config = ConfigDict(extra="allow")
    type: str = "text"
    json_schema: Optional[Dict[str, Any]] = None


class ChatCompletionRequest(BaseModel):
    model_config = ConfigDict(extra="allow")
    model: str
    messages: List[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None              # common extension
    n: int = 1
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None  # vLLM extension
    logit_bias: Optional[Dict[str, float]] = None
    logprobs: Optional[bool] = None
    top_logprobs: Optional[int] = None
    seed: Optional[int] = None
    user: Optional[str] = None
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = None
    functions: Optional[List[Dict[str, Any]]] = None
    function_call: Optional[Union[str, Dict[str, Any]]] = None
    response_format: Optional[ResponseFormat] = None
    chat_template_kwargs: Optional[Dict[str, Any]] = None
    min_tokens: Optional[int] = None         # vLLM extension
    ignore_eos: Optional[bool] = None        # vLLM extension


class CompletionRequest(BaseModel):
    model_config = ConfigDict(extra="allow")
    model: str
    prompt: Any
    max_tokens: Optional[int] = 16
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    n: int = 1
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    seed: Optional[int] = None
    echo: bool = False
    logprobs: Optional[int] = None
    ignore_eos: Optional[bool] = None
    min_tokens: Optional[int] = None
    # vLLM-compatible guided-decoding extensions (served by the
    # device-FSM path, sampling/token_fsm.py).
    guided_regex: Optional[str] = None
    guided_json: Optional[Dict[str, Any]] = None
    guided_choice: Optional[List[str]] = None


class EmbeddingsRequest(BaseModel):
    model_config = ConfigDict(extra="allow")
    model: str
    input: Any
    encoding_format: str = "float"


# ---------------------------------------------------------------------------
# Validation (explicit 400 rejection table)
# ---------------------------------------------------------------------------

def _reject(msg: str, param: str):
    raise InvalidRequestError(msg, param=param)


def validate_chat_request(req: ChatCompletionRequest) -> None:
    if req.n != 1:
        _reject("only n=1 is supported", "n")
    if req.logit_bias:
        _reject("logit_bias is not supported", "logit_bias")
    if req.logprobs:
        _reject("logprobs is not supported", "logprobs")
    if req.top_logprobs and req.top_logprobs > 0:
        _reject("top_logprobs is not supported", "top_logprobs")
    if req.stream_options is not None and not req.stream:
        _reject("stream_options requires stream=true", "stream_options")
    if req.tools:
        for t in req.tools:
            if t.get("type") != "function":
                _reject("only function tools are supported", "tools")
    if req.tool_choice is not None:
        tc = req.tool_choice
        if isinstance(tc, str):
            if tc not in ("auto", "none", "required"):
                _reject(f"unknown tool_choice {tc!r}", "tool_choice")
            if tc == "required" and not req.tools:
                _reject("tool_choice=required needs at least one tool",
                        "tool_choice")
        elif isinstance(tc, dict):
            name = (tc.get("function") or {}).get("name")
            declared = {(t.get("function") or {}).get("name")
                        for t in (req.tools or [])}
            if name not in declared:
                _reject(f"tool_choice names undeclared tool {name!r}",
                        "tool_choice")
    if req.function_call is not None and isinstance(req.function_call, dict):
        name = req.function_call.get("name")
        declared = {f.get("name") for f in (req.functions or [])}
        if name not in declared:
            _reject(f"function_call names undeclared function {name!r}",
                    "function_call")
    if req.response_format is not None:
        rf = req.response_format
        if rf.type not in ("text", "json_object", "json_schema"):
            _reject(f"unknown response_format.type {rf.type!r}",
                    "response_format.type")
        if rf.type == "json_schema":
            if not rf.json_schema:
                _reject("json_schema missing", "response_format.json_schema")
    if req.chat_template_kwargs is not None:
        et = req.chat_template_kwargs.get("enable_thinking")
        if et is not None and not isinstance(et, bool):
            _reject("enable_thinking must be a boolean",
                    "chat_template_kwargs.enable_thinking")
    for i, m in enumerate(req.messages):
        if m.role not in ("system", "user", "assistant", "tool", "function"):
            _reject(f"unknown role {m.role!r}", f"messages[{i}].role")
        if isinstance(m.content, list):
            for part in m.content:
                if part.get("type") != "text":
                    _reject("multimodal content parts are not supported",
                            f"messages[{i}].content")


def validate_completion_request(req: CompletionRequest) -> None:
    if not isinstance(req.prompt, str):
        _reject("prompt must be a single string", "prompt")
    if req.n != 1:
        _reject("only n=1 is supported", "n")
    if req.logprobs and not req.echo:
        _reject("logprobs requires echo=true (prompt scoring); "
                "completion-token logprobs are not supported", "logprobs")
    if req.echo and not req.logprobs:
        _reject("echo without logprobs is not supported", "echo")
    if req.echo and (req.max_tokens or 0) != 0:
        _reject("echo+logprobs requires max_tokens=0 (prompt scoring)",
                "max_tokens")
    if req.echo and req.stream:
        _reject("echo+logprobs cannot stream", "stream")
    if req.stream_options is not None and not req.stream:
        _reject("stream_options requires stream=true", "stream_options")


def flatten_content(content) -> str:
    if content is None:
        return ""
    if isinstance(content, str):
        return content
    return "".join(p.get("text", "") for p in content
                   if p.get("type") == "text")


def sampling_from_chat(req: ChatCompletionRequest,
                       default_max: int = 512) -> SamplingParams:
    mt = req.max_completion_tokens or req.max_tokens or default_max
    stop = req.stop if isinstance(req.stop, list) else (
        [req.stop] if req.stop else [])
    return SamplingParams(
        temperature=req.temperature if req.temperature is not None else 1.0,
        top_p=req.top_p if req.top_p is not None else 1.0,
        top_k=req.top_k or 0,
        repetition_penalty=req.repetition_penalty or 1.0,
        max_tokens=mt,
        min_tokens=req.min_tokens or 0,
        stop=stop,
        seed=req.seed,
        ignore_eos=bool(req.ignore_eos))


def guided_from_completion(req: CompletionRequest) -> Optional[GuidedOptions]:
    """vLLM-style guided_regex / guided_json / guided_choice on
    /v1/completions (at most one; 400 otherwise)."""
    import re as _re
    set_fields = [f for f in ("guided_regex", "guided_json",
                              "guided_choice") if getattr(req, f)]
    if not set_fields:
        return None
    if len(set_fields) > 1:
        _reject("at most one of guided_regex/guided_json/guided_choice",
                set_fields[1])
    if req.guided_regex is not None:
        return GuidedOptions(regex=req.guided_regex)
    if req.guided_json is not None:
        return GuidedOptions(json_schema=req.guided_json, strict=True)
    return GuidedOptions(regex="|".join(
        _re.escape(c) for c in req.guided_choice))


def guided_from_chat(req: ChatCompletionRequest) -> Optional[GuidedOptions]:
    rf = req.response_format
    if rf is None or rf.type == "text":
        return None
    if rf.type == "json_object":
        return GuidedOptions(json_mode=True, strict=False)
    schema = rf.json_schema or {}
    strict = bool(schema.get("strict"))
    return GuidedOptions(json_schema=schema, strict=strict)


# ---------------------------------------------------------------------------
# Responses
# ---------------------------------------------------------------------------

def completion_id(prefix: str = "chatcmpl") -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


def chat_response(model: str, text: str, finish_reason: str,
                  prompt_tokens: int, completion_tokens: int,
                  tool_calls: Optional[List[Dict[str, Any]]] = None,
                  function_call: Optional[Dict[str, Any]] = None,
                  rid: Optional[str] = None) -> Dict[str, Any]:
    msg: Dict[str, Any] = {"role": "assistant", "content": text}
    if tool_calls:
        msg["tool_calls"] = tool_calls
        msg["content"] = None if not text else text
        finish_reason = "tool_calls"
    if function_call:
        msg["function_call"] = function_call
        msg["content"] = None if not text else text
    return {
        "id": rid or completion_id(),
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "message": msg,
            "finish_reason": finish_reason,
        }],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


def chat_chunk(rid: str, model: str, delta: Dict[str, Any],
               finish_reason: Optional[str] = None,
               usage: Optional[Dict[str, int]] = None) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "id": rid,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "choices": [{"index": 0, "delta": delta,
                     "finish_reason": finish_reason}],
    }
    if usage is not None:
        out["choices"] = []
        out["usage"] = usage
    return out


def error_body(message: str, etype: str = "invalid_request_error",
               param: Optional[str] = None,
               code: Optional[str] = None) -> Dict[str, Any]:
    return {"error": {"message": message, "type": etype,
                      "param": param, "code": code}}
