"""Guided decoding: regex engine, schema→regex, DFA token masking, and
engine-level constrained generation (ref: regex_guided_test.rs,
structured_output_contract.rs)."""

import json

import numpy as np
import pytest

from ferrum_tpu.sampling.guided import (
    JsonModeProcessor, RegexGuidedProcessor, build_guided_processor,
)
from ferrum_tpu.sampling.regex_dfa import compile_regex
from ferrum_tpu.sampling.schema import schema_to_regex, validate_json_against_subset
from ferrum_tpu.types import GuidedOptions, NotSupportedError


class TestRegexEngine:
    @pytest.mark.parametrize("pattern,yes,no", [
        (r"abc", ["abc"], ["ab", "abcd", "abd"]),
        (r"a+b*", ["a", "aab", "abbb"], ["", "b", "ba"]),
        (r"(foo|bar)+", ["foo", "barfoo"], ["fo", "foob"]),
        (r"[a-c]{2,3}", ["ab", "abc"], ["a", "abcd", "xd"]),
        (r"-?\d+(\.\d+)?", ["42", "-3.14", "0"], ["-", "1.", ".5"]),
        (r'"([^"\\]|\\.)*"', ['""', '"hi"', '"a\\"b"'], ['"', '"\\"']),
        (r"a{3}", ["aaa"], ["aa", "aaaa"]),
        (r"x{2,}", ["xx", "xxxx"], ["x"]),
        (r"[^0-9]+", ["abc", "!?"], ["a1", ""]),
        (r"a\.b", ["a.b"], ["axb"]),
    ])
    def test_fullmatch(self, pattern, yes, no):
        dfa = compile_regex(pattern)
        for s in yes:
            assert dfa.fullmatch(s), (pattern, s)
        for s in no:
            assert not dfa.fullmatch(s), (pattern, s)

    def test_unsupported_fails_fast(self):
        with pytest.raises(NotSupportedError):
            compile_regex(r"(?P<name>x)")
        with pytest.raises(NotSupportedError):
            compile_regex(r"a{1,10000}")

    def test_walk_partial(self):
        dfa = compile_regex(r"hello world")
        st = dfa.walk(dfa.start, "hello")
        assert st is not None and not dfa.is_accepting(st)
        st2 = dfa.walk(st, " world")
        assert st2 is not None and dfa.is_accepting(st2)
        assert dfa.walk(dfa.start, "help") is None


class TestSchemaToRegex:
    def test_simple_object(self):
        schema = {"type": "object",
                  "properties": {"name": {"type": "string"},
                                 "age": {"type": "integer"}},
                  "required": ["name", "age"],
                  "additionalProperties": False}
        regex = schema_to_regex(schema)
        dfa = compile_regex(regex)
        assert dfa.fullmatch('{"name": "bob", "age": 42}')
        assert dfa.fullmatch('{ "name" : "x" , "age" : -1 }')
        assert not dfa.fullmatch('{"age": 42, "name": "bob"}')  # fixed order
        assert not dfa.fullmatch('{"name": "bob"}')

    def test_enum_and_bool(self):
        schema = {"type": "object",
                  "properties": {"color": {"enum": ["red", "green"]},
                                 "ok": {"type": "boolean"}},
                  "required": ["color", "ok"]}
        dfa = compile_regex(schema_to_regex(schema))
        assert dfa.fullmatch('{"color": "red", "ok": true}')
        assert not dfa.fullmatch('{"color": "blue", "ok": true}')

    def test_array_items(self):
        schema = {"type": "object",
                  "properties": {"xs": {"type": "array",
                                        "items": {"type": "integer"}}},
                  "required": ["xs"]}
        dfa = compile_regex(schema_to_regex(schema))
        assert dfa.fullmatch('{"xs": [1, 2, 3]}')
        assert dfa.fullmatch('{"xs": []}')
        assert not dfa.fullmatch('{"xs": [1, "a"]}')

    def test_nested_object(self):
        schema = {"type": "object",
                  "properties": {"inner": {
                      "type": "object",
                      "properties": {"v": {"type": "number"}},
                      "required": ["v"]}},
                  "required": ["inner"]}
        dfa = compile_regex(schema_to_regex(schema))
        assert dfa.fullmatch('{"inner": {"v": 1.5}}')

    def test_unsupported_constructs_fail_fast(self):
        for schema in (
            {"type": "object", "properties": {"x": {"type": "string"}},
             "additionalProperties": True},
            {"type": "string"},
            {"type": "object", "properties": {}},
            {"type": "object",
             "properties": {"x": {"oneOf": [{"type": "string"}]}},
             "required": ["x"]},
        ):
            with pytest.raises(NotSupportedError):
                schema_to_regex(schema)

    def test_validate_json_against_subset(self):
        schema = {"type": "object",
                  "properties": {"a": {"type": "integer"}},
                  "required": ["a"]}
        assert validate_json_against_subset('{"a": 3}', schema)
        assert not validate_json_against_subset('{"a": "x"}', schema)


class TestGuidedProcessor:
    def test_mask_allows_only_valid_continuations(self):
        from ferrum_tpu.tokenizer import make_byte_tokenizer
        tok = make_byte_tokenizer()
        proc = RegexGuidedProcessor(compile_regex(r"yes|no"), tok)
        mask = proc.allowed_mask()
        y = tok.encode("y", add_special_tokens=False)[0]
        n = tok.encode("n", add_special_tokens=False)[0]
        x = tok.encode("x", add_special_tokens=False)[0]
        assert mask[y] and mask[n] and not mask[x]
        proc.advance(None, y)
        mask2 = proc.allowed_mask()
        e = tok.encode("e", add_special_tokens=False)[0]
        assert mask2[e] and not mask2[n]
        # complete "yes" → accepting, EOS allowed
        proc.advance(None, e)
        proc.advance(None, tok.encode("s", add_special_tokens=False)[0])
        assert proc.is_complete() or proc.allowed_mask()[257]

    def test_engine_guided_regex_generation(self):
        from tests.test_engine_e2e import tiny_engine
        from ferrum_tpu.types import InferenceRequest, SamplingParams

        eng = tiny_engine()
        try:
            req = InferenceRequest(
                prompt="answer:",
                sampling=SamplingParams(max_tokens=10),
                guided=GuidedOptions(regex=r"(yes|no)"))
            res = eng.infer(req)
            assert res.text in ("yes", "no"), res.text
        finally:
            eng.stop()

    def test_engine_guided_schema_generation(self):
        from tests.test_engine_e2e import tiny_engine
        from ferrum_tpu.types import InferenceRequest, SamplingParams

        eng = tiny_engine()
        try:
            schema = {"type": "object",
                      "properties": {"ok": {"type": "boolean"}},
                      "required": ["ok"]}
            req = InferenceRequest(
                prompt="json:",
                sampling=SamplingParams(max_tokens=60),
                guided=GuidedOptions(json_schema=schema))
            res = eng.infer(req)
            # Every emitted char must stay inside the schema DFA (a
            # random tiny model may legally wander in \s* until the
            # length cap; structure is still enforced).
            regex = schema_to_regex(schema)
            dfa = compile_regex(regex)
            assert dfa.walk(dfa.start, res.text) is not None, res.text
            from ferrum_tpu.types import FinishReason
            if res.finish_reason == FinishReason.STOP:
                obj = json.loads(res.text)
                assert isinstance(obj["ok"], bool)
        finally:
            eng.stop()
