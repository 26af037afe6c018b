"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharded
code paths are testable without a TPU pod (SURVEY.md §4).

The environment's sitecustomize force-selects the TPU ("axon") platform
via jax.config, ignoring JAX_PLATFORMS — so we override the config here,
before any backend is initialized. Tests must be fast and reproducible;
the benchmark harness (bench.py) targets the real TPU separately.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the test loop: a fraction of the
# suite's wall is XLA CPU compiles of the SAME executables every run.
# Same dir as utils/jaxcache.py (several tests call
# enable_compilation_cache in-process anyway, and subprocess CLIs
# always do) — platform keys keep CPU and TPU entries apart.
_cache = os.environ.get(
    "VSC2022_TPU_TEST_JAX_CACHE",
    os.environ.get(
        "VSC2022_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/vsc2022_tpu/jax"),
    ),
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multihost pods, serving e2e, "
        "conversion numerics, e2e pipelines) — the full pre-commit / "
        "round gate; the default lane is the fast iteration loop",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (subprocess pods, e2e CLIs, torch "
        "numerics); skipped unless --runslow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow lane: pass --runslow (full gate)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
