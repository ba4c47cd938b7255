"""Test configuration: run everything on a virtual 8-device CPU platform.

This exercises the same pjit/mesh/collective code paths as a real TPU
slice (the reference's multi-GPU DataParallel behavior is validated the
same way — see SURVEY.md section 4).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The hosting environment may pin an accelerator platform plugin; the config
# update (unlike the env var) reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-geometry / long-running oracle tests")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="include tests marked slow (the full oracle lane; the "
             "default lane finishes in <10 min on a 1-core host)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    import pytest
    skip = pytest.mark.skip(
        reason="slow oracle lane: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
