"""Test configuration: force an 8-virtual-device CPU backend so every mesh /
pjit / collective test runs without TPU hardware (SURVEY.md §4)."""
import os

# NOTE: do not enable JAX_COMPILATION_CACHE_DIR here — the persistent cache
# deadlocked the CPU backend in this environment (jax 0.9.0).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Pin the env var too: CLI mains invoked in-process consult it
# (configure_platform) and skip the wedge-probe subprocess
# (ensure_backend_alive) when the platform is explicitly chosen.
os.environ["GANREVERSER_PLATFORM"] = "cpu"

import jax  # noqa: E402  (import after env setup)

# The session presets JAX_PLATFORMS=axon and the plugin wins over the env
# var; the config update is what actually pins the CPU backend here.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
