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


@pytest.mark.slow  # 26s offline bench cells
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


@pytest.mark.slow  # 35s full capture+replay cycle
def test_replay_bundle_roundtrip(tmp_path):
    """Capture a bundle, replay it via the CLI, expect a match (exit 0)
    and a mismatch exit (2) when observed tokens are corrupted."""
    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.types import InferenceRequest, SamplingParams
    from ferrum_tpu.utils.replay import capture_bundle, save_bundle

    req = InferenceRequest(
        prompt="replay me", request_id="r1",
        sampling=SamplingParams(max_tokens=4, temperature=0.0))
    # Observed tokens from a direct run of the same tiny preset.
    r = run_cli("run", "random:tiny-test", "--prompt", "replay me",
                "--max-tokens", "4", "--temperature", "0",
                "--kv-capacity", "64", "--max-model-len", "256",
                "--max-num-seqs", "2", timeout=300)
    assert r.returncode == 0, r.stderr
    bundle = capture_bundle(req, EngineConfig(model="random:tiny-test"),
                            "random:tiny-test",
                            response_token_ids=None)
    path = str(tmp_path / "bundle.json")
    save_bundle(bundle, path)
    r = run_cli("replay", "random:tiny-test", "--bundle", path,
                "--kv-capacity", "64", "--max-model-len", "256",
                "--max-num-seqs", "2", timeout=300)
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout)
    assert rec["matches_observed"] is True
    toks = rec["token_ids"]
    # Corrupt the observed tokens -> replay must detect the mismatch.
    bundle["observed"]["response_token_ids"] = [t + 1 for t in toks]
    save_bundle(bundle, path)
    r = run_cli("replay", "random:tiny-test", "--bundle", path,
                "--kv-capacity", "64", "--max-model-len", "256",
                "--max-num-seqs", "2", timeout=300)
    assert r.returncode == 2, r.stdout + r.stderr
