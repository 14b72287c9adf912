"""Test bootstrap: force an 8-device virtual CPU mesh before jax imports.

Tests never require TPU hardware (the reference's engine-testable-
without-GPU strategy, SURVEY §4): jnp reference ops are the oracle, and
multi-chip sharding is validated on the virtual CPU mesh.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers a remote TPU backend and
# overrides jax_platforms at import time; re-force CPU before any backend
# initializes so tests run hardware-free on the 8-device virtual mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from ferrum_tpu.models.configs import ModelConfig
    return ModelConfig(
        family="qwen3", vocab_size=256, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        rope_theta=10000.0, qk_norm=True, rms_norm_eps=1e-6,
        max_position_embeddings=512, tie_word_embeddings=True,
        bos_token_id=1, eos_token_ids=(2,))
