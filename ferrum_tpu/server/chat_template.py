"""Chat template rendering (Jinja2) with HF chat_template compatibility.

TPU-native analog of the reference's minijinja+pycompat template layer
(crates/ferrum-server/src/chat_template.rs:10-50): model-provided
templates from tokenizer_config.json render OpenAI messages (incl. tool
definitions, tool_calls history and the vLLM-compatible
`enable_thinking` kwarg); a per-family fallback covers checkpoints
without templates. `strftime_now` is pinned via an injectable clock so
golden tests are byte-stable.
"""

from __future__ import annotations

import datetime
import json
from typing import Any, Callable, Dict, List, Optional

import jinja2

from ..types import InvalidRequestError


DEFAULT_TEMPLATES: Dict[str, str] = {
    # ChatML (qwen2/qwen3 family default). Newlines emitted via
    # expressions so Jinja block trimming can't eat them.
    "chatml": (
        "{%- for message in messages -%}"
        "{{ '<|im_start|>' + message.role + '\\n' + message.content"
        " + '<|im_end|>\\n' }}"
        "{%- endfor -%}"
        "{%- if add_generation_prompt -%}"
        "{{ '<|im_start|>assistant\\n' }}{%- endif -%}"
    ),
    # Llama-3 instruct
    "llama3": (
        "{{- '<|begin_of_text|>' -}}"
        "{%- for message in messages -%}"
        "{{ '<|start_header_id|>' + message.role + '<|end_header_id|>\\n\\n'"
        " + message.content + '<|eot_id|>' }}"
        "{%- endfor -%}"
        "{%- if add_generation_prompt -%}"
        "{{ '<|start_header_id|>assistant<|end_header_id|>\\n\\n' }}"
        "{%- endif -%}"
    ),
    # Gemma
    "gemma": (
        "{{- '<bos>' -}}"
        "{%- for message in messages -%}"
        "{%- set role = 'model' if message.role == 'assistant' "
        "else message.role -%}"
        "{{ '<start_of_turn>' + role + '\\n' + message.content"
        " + '<end_of_turn>\\n' }}"
        "{%- endfor -%}"
        "{%- if add_generation_prompt -%}"
        "{{ '<start_of_turn>model\\n' }}{%- endif -%}"
    ),
    # Plain fallback
    "plain": (
        "{%- for message in messages -%}"
        "{{ message.role + ': ' + message.content + '\\n' }}"
        "{%- endfor -%}"
        "{%- if add_generation_prompt -%}{{ 'assistant: ' }}{%- endif -%}"
    ),
}

_FAMILY_DEFAULT = {
    "qwen2": "chatml", "qwen3": "chatml", "qwen3_moe": "chatml",
    "llama": "llama3", "mistral": "llama3", "gemma3": "gemma",
}


class ChatTemplateRenderer:
    def __init__(self, template: Optional[str] = None,
                 family: str = "llama",
                 now_fn: Optional[Callable[[], datetime.datetime]] = None):
        self._env = jinja2.Environment(
            loader=jinja2.BaseLoader(), keep_trailing_newline=True,
            trim_blocks=False, lstrip_blocks=False,
            extensions=["jinja2.ext.loopcontrols"])
        now_fn = now_fn or datetime.datetime.now
        # Pinned clock for golden tests (ref: strftime_now pinning).
        self._env.globals["strftime_now"] = \
            lambda fmt: now_fn().strftime(fmt)
        self._env.filters["tojson"] = lambda v, **kw: json.dumps(v, **kw)
        self._env.policies["json.dumps_kwargs"] = {"ensure_ascii": False}
        src = template or DEFAULT_TEMPLATES[
            _FAMILY_DEFAULT.get(family, "plain")]
        try:
            self._template = self._env.from_string(src)
        except jinja2.TemplateError as e:
            raise InvalidRequestError(f"bad chat template: {e}")

    def render(self, messages: List[Dict[str, Any]],
               add_generation_prompt: bool = True,
               tools: Optional[List[Dict[str, Any]]] = None,
               chat_template_kwargs: Optional[Dict[str, Any]] = None,
               bos_token: str = "", eos_token: str = "") -> str:
        """Render normalized messages; `content` must already be a string
        (the server layer flattens content parts and validates roles)."""
        ctx: Dict[str, Any] = {
            "messages": messages,
            "add_generation_prompt": add_generation_prompt,
            "bos_token": bos_token,
            "eos_token": eos_token,
        }
        if tools:
            ctx["tools"] = tools
        if chat_template_kwargs:
            for k, v in chat_template_kwargs.items():
                ctx.setdefault(k, v)
        try:
            return self._template.render(**ctx)
        except jinja2.TemplateError as e:
            raise InvalidRequestError(f"chat template render failed: {e}")
