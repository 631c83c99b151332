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
#
# The cache is only valid for THIS machine type: XLA:CPU stores AOT code
# keyed partly on host CPU features, and entries written on a different
# machine make every lookup miss (so the suite silently recompiles
# everything, ~2x wall time) while spamming "machine feature not
# supported"/SIGILL-risk warnings from cpu_aot_loader. Fingerprint the host
# and wipe a foreign cache.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")


def _machine_fingerprint() -> str:
    import hashlib
    import platform
    flags = ""
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not flags and line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif line.startswith(("model", "cpu family", "stepping",
                                      "vendor_id")):
                    model += line.strip() + ";"
                if flags and line.startswith("power management"):
                    break
    except OSError:
        pass
    # jaxlib + kernel release matter too: XLA:CPU target features include
    # tuning flags (+prefer-no-gather/-scatter) derived from more than
    # cpuinfo — a cache written under a different kernel/jaxlib poisoned
    # every lookup here once (r3: the whole suite silently ran ~2x slow
    # while cpu_aot_loader spammed feature-mismatch errors)
    import jaxlib
    # model name included: XLA's tuning flags (+prefer-no-gather/-scatter)
    # vary by CPU model even when cpuinfo flags/kernel/jaxlib all match
    # (r4: a foreign cache survived the old fingerprint and poisoned every
    # lookup with feature-mismatch errors)
    raw = (f"{platform.machine()}|{platform.processor()}|{model}|{flags}"
           f"|{jaxlib.__version__}|{platform.release()}")
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def _ensure_cache_machine_match() -> None:
    import shutil
    marker = os.path.join(_CACHE_DIR, ".machine")
    fp = _machine_fingerprint()
    try:
        with open(marker) as f:
            if f.read().strip() == fp:
                return
        shutil.rmtree(_CACHE_DIR, ignore_errors=True)
    except OSError:
        pass  # no marker: first run (or pre-marker cache: wipe it too)
    if os.path.isdir(_CACHE_DIR) and not os.path.exists(marker):
        shutil.rmtree(_CACHE_DIR, ignore_errors=True)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with open(marker, "w") as f:
        f.write(fp)


_ensure_cache_machine_match()
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# --- jit-routed Module.init/apply -----------------------------------------
# Eager flax calls pay per-primitive dispatch + lowering on this 1-core host
# (~10-30 ms x hundreds of ops per model call -> the suite was eager-dispatch
# dominated, 20 min warm). Routing every top-level init/apply through one
# jax.jit turns a model call into a single persistent-cache hit. Array leaves
# (incl. PRNG keys — tests use fixed seeds, so the HLO stays cache-stable)
# become jit arguments; ints/bools/callables (method=, deterministic=,
# mutable=) stay static in the closure. Calls already under a trace, or that
# fail to jit (value-dependent Python control flow etc.), fall back to the
# original eager path. Disable with AIM_TEST_EAGER=1.
if not os.environ.get("AIM_TEST_EAGER"):
    import numpy as _np
    import flax.linen as _nn

    def _jit_route(orig):
        def wrapper(self, *args, **kwargs):
            leaves, treedef = jax.tree_util.tree_flatten(
                (args, kwargs),
                is_leaf=lambda x: isinstance(x, jax.core.Tracer))
            if any(isinstance(l, jax.core.Tracer) for l in leaves):
                return orig(self, *args, **kwargs)
            dyn_idx = [i for i, l in enumerate(leaves)
                       if isinstance(l, (jax.Array, _np.ndarray))]
            if not dyn_idx:
                return orig(self, *args, **kwargs)

            def call(dyn):
                ls = list(leaves)
                for i, v in zip(dyn_idx, dyn):
                    ls[i] = v
                a, kw = jax.tree_util.tree_unflatten(treedef, ls)
                return orig(self, *a, **kw)

            try:
                return jax.jit(call)([leaves[i] for i in dyn_idx])
            except Exception:
                return orig(self, *args, **kwargs)
        return wrapper

    _nn.Module.init = _jit_route(_nn.Module.init)
    _nn.Module.apply = _jit_route(_nn.Module.apply)


def _ensure_cpp_decoder_built() -> None:
    """Build ``csrc/build/libaimdecode.so`` if the toolchain is present.

    Without this the 15 decoder/frame-exactness tests silently skip on a
    fresh checkout (the library only exists after ``csrc/build.sh``). The
    build takes seconds; if g++/ffmpeg headers are genuinely absent the
    tests keep their informative skip reason.
    """
    import shutil
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lib = os.path.join(root, "csrc", "build", "libaimdecode.so")
    script = os.path.join(root, "csrc", "build.sh")
    srcs = [os.path.join(root, "csrc", f) for f in os.listdir(
        os.path.join(root, "csrc")) if f.endswith(".cpp")]
    stale = os.path.exists(lib) and any(
        os.path.getmtime(s) > os.path.getmtime(lib) for s in srcs)
    if (os.path.exists(lib) and not stale) or not os.path.exists(script):
        return
    if shutil.which("g++") is None:
        return
    try:
        subprocess.run(["bash", script], check=True, capture_output=True,
                       timeout=300)
    except (subprocess.SubprocessError, OSError) as e:
        import warnings
        warnings.warn(f"csrc/build.sh failed ({e}); decoder tests will skip")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {len(jax.devices())}")
    _ensure_cpp_decoder_built()


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
