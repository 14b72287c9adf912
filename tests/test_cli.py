"""CLI smoke tests (ref: cli_e2e.rs, chat_smoke.rs)."""

import json
import subprocess
import sys
import os

import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=180):
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from ferrum_tpu.cli import main; import sys;"
         f"sys.exit(main({list(args)!r}))"],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=REPO)


def test_list():
    r = run_cli("list")
    assert r.returncode == 0
    assert "qwen3-30b-a3b" in r.stdout
    assert "moe" in r.stdout


def test_run_one_shot():
    r = run_cli("run", "random:tiny-test", "--prompt", "hello",
                "--max-tokens", "4", "--temperature", "0",
                "--kv-capacity", "64", "--max-model-len", "256",
                "--max-num-seqs", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tok/s" in r.stderr


def test_run_json_output():
    r = run_cli("run", "random:tiny-test", "--prompt", "hi", "--json",
                "--max-tokens", "3", "--temperature", "0",
                "--kv-capacity", "64", "--max-model-len", "256",
                "--max-num-seqs", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    out = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert out and "response" in json.loads(out[-1])


def test_bench_offline():
    r = run_cli("bench", "random:tiny-test", "--concurrency", "2",
                "--num-requests", "4", "--input-len", "8",
                "--output-len", "4", "--kv-capacity", "64",
                "--max-model-len", "256", "--max-num-seqs", "2",
                timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    start = r.stdout.index("{")
    rep = json.loads(r.stdout[start:])
    assert rep["cells"][0]["completed"] == 4
    assert rep["cells"][0]["errors"] == 0
