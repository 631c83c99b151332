"""Test env: force CPU with 8 virtual devices so multi-device sharding
paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: the axon TPU plugin's sitecustomize imports jax at interpreter
startup with ``JAX_PLATFORMS=axon`` already baked into jax.config — env
vars set later (even before our own ``import jax``) are ignored. The only
reliable override is ``jax.config.update`` after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt-and-braces for fresh interpreters

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# tests are compile-dominated (tiny models, one CPU core): skipping XLA's
# optimization passes cuts suite wall time ~3.5x with unchanged semantics
# (numerical parity tolerances all still hold; see test_convert)
jax.config.update("jax_disable_most_optimizations", True)
# persistent compile cache: on a 1-core host the suite is XLA-compile
# dominated; unchanged tests hit the cache on re-runs (key = HLO, so any
# model/shape change recompiles). Harmless cold, ~big win warm.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {len(jax.devices())}")


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run @pytest.mark.slow tests (full-geometry parity etc.)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (full ViT-B geometry parity); "
                   "off by default, enable with --run-slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow test: pass --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
