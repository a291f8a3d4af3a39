"""Test config: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (the TPU analog of a fake backend; see SURVEY.md section 4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The ambient environment pins JAX at the real TPU (JAX_PLATFORMS=axon) and
# the axon plugin overrides the env var, so force CPU through the config API.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    Two full-suite runs segfaulted inside XLA-CPU's backend_compile (LLVM)
    while compiling the train-loop programs near the end of the suite --
    hundreds of live compiled executables by that point -- yet the same
    module passes in a fresh process.  Bounding the number of live
    executables avoids the crashy regime at a small recompilation cost.
    """
    yield
    jax.clear_caches()
