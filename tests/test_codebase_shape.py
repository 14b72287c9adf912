"""Codebase-shape + governance gates.

Analog of the reference's structural invariants
(crates/ferrum-types/tests/codebase_shape_test.rs) and the env-registry
CI gate (scripts/check_ferrum_env_registry.py): the package keeps its
layered layout, and runtime config is only read through the governed
registry — no stray os.environ reads in model/engine code.
"""

import os
import re

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)), "ferrum_tpu")


def _py_files(sub=""):
    root = os.path.join(PKG, sub)
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def test_package_layout():
    for sub in ("models", "ops", "ops/pallas", "kv", "scheduler", "engine",
                "sampling", "server", "parallel", "bench", "utils"):
        assert os.path.isdir(os.path.join(PKG, sub)), sub
    for mod in ("config.py", "types.py", "tokenizer.py", "cli.py"):
        assert os.path.isfile(os.path.join(PKG, mod)), mod


def test_no_stray_environ_reads():
    """Only config.py, cli.py, hf_download.py and pallas backend probing
    may touch os.environ (the governed-registry rule; ceilings like the
    reference's env-registry gate, ci.yml:73-81)."""
    allowed = {"config.py", "cli.py", "hf_download.py"}
    offenders = []
    for path in _py_files():
        name = os.path.basename(path)
        if name in allowed:
            continue
        src = open(path).read()
        if re.search(r"os\.environ|os\.getenv", src):
            offenders.append(os.path.relpath(path, PKG))
    assert not offenders, f"unregistered env reads in {offenders}"


def test_layering_no_upward_imports():
    """ops/ and models/ must not import from engine/ or server/ (strictly
    downward dependencies, SURVEY §1)."""
    offenders = []
    for sub in ("ops", "models", "kv", "sampling"):
        for path in _py_files(sub):
            src = open(path).read()
            if re.search(r"from \.\.(engine|server)|from ferrum_tpu\.(engine|server)",
                         src):
                offenders.append(os.path.relpath(path, PKG))
    assert not offenders, offenders


def test_every_pallas_kernel_has_reference_oracle():
    """Each Pallas kernel module must reference its jnp parity oracle
    (the `_eq` discipline)."""
    pallas_dir = os.path.join(PKG, "ops", "pallas")
    for f in os.listdir(pallas_dir):
        if f in ("__init__.py",) or not f.endswith(".py"):
            continue
        src = open(os.path.join(pallas_dir, f)).read()
        assert "_ref" in src, f"{f} lacks a reference-oracle fallback"


def test_no_red_gate_artifacts_at_head():
    """A failing gate artifact must block, not linger in git (VERDICT
    r4 #8): every committed gates/**/*.json with a `pass`/`passed`
    field must be green. Red evidence belongs in a fix, not at HEAD."""
    import json
    import subprocess

    repo = os.path.dirname(PKG)
    try:
        files = subprocess.check_output(
            ["git", "ls-files", "gates/"], cwd=repo,
            stderr=subprocess.DEVNULL).decode().split()
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("not a git checkout")
    red = []

    def walk(obj, path, fname):
        if isinstance(obj, dict):
            for k, v in obj.items():
                if k in ("pass", "passed") and v is False:
                    red.append(f"{fname}:{path}/{k}")
                walk(v, f"{path}/{k}", fname)
        elif isinstance(obj, list):
            for i, v in enumerate(obj):
                walk(v, f"{path}[{i}]", fname)

    for f in files:
        if not f.endswith(".json"):
            continue
        with open(os.path.join(repo, f)) as fh:
            walk(json.load(fh), "", f)
    assert not red, f"red gate artifacts committed at HEAD: {red}"


def test_ci_lanes_cover_every_test_file():
    """Every tests/test_*.py must appear in a CI lane (ci.yml matrix or
    an explicit pytest invocation) — new test files must not silently
    drop out of CI (VERDICT r4 weak #7: CI honesty)."""
    repo = os.path.dirname(PKG)
    ci_path = os.path.join(repo, ".github", "workflows", "ci.yml")
    ci = open(ci_path).read()
    missing = []
    for f in sorted(os.listdir(os.path.join(repo, "tests"))):
        if not (f.startswith("test_") and f.endswith(".py")):
            continue
        if f == "test_codebase_shape.py":
            continue  # runs in the governance job
        if f"tests/{f}" not in ci:
            missing.append(f)
    assert not missing, f"test files not in any CI lane: {missing}"


def test_env_registry_covers_engine_config():
    """Every env var maps to a real EngineConfig field."""
    import dataclasses
    from ferrum_tpu.config import ENV_REGISTRY, EngineConfig

    fields = {f.name for f in dataclasses.fields(EngineConfig)}
    for env_name, (field, ty, _) in ENV_REGISTRY.items():
        assert field in fields, f"{env_name} -> unknown field {field}"
        assert env_name.startswith("FERRUM_")
