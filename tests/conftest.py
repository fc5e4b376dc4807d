"""Test harness configuration.

Mirrors the reference's device-opportunistic CI strategy (SURVEY §4): tests
run on CPU with 8 virtual XLA devices so the sharded/mesh code paths are
exercised without a TPU pod, and fp64 is enabled for parity checks.
"""

import os

# Must run before jax is imported anywhere.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the surrounding session may point JAX_PLATFORMS at a live TPU
# (axon); tests must run on the virtual 8-device CPU platform. Setting
# RLAOPT_TEST_PLATFORM overrides the pin so device-agnostic suites (sparse,
# ops) can be driven on a real accelerator: e.g.
#   RLAOPT_TEST_PLATFORM=tpu,cpu pytest tests/sparse
_platform = os.environ.get("RLAOPT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

# The env var alone is not enough: the axon TPU plugin re-registers itself at
# import time, so force the platform through the config as well.
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)
# f32 matmuls otherwise run at bf16-ish default precision, breaking the
# per-precision tolerance scheme ported from the reference tests.
jax.config.update("jax_default_matmul_precision", "highest")

# Eager per-op dispatch compiles are ~1s each in this environment; the
# persistent cache makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_testcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


# Per-precision tolerances, mirroring tests/kernels/test_standard.py:38-41.
TOLERANCES = {jnp.float32: 1e-4, jnp.float64: 1e-8}


@pytest.fixture(params=[jnp.float32, jnp.float64], ids=["f32", "f64"])
def dtype(request):
    return request.param


@pytest.fixture
def tol(dtype):
    return TOLERANCES[dtype]


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
