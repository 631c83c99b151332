"""Environment collection + seeding (reference ``tools/train.py:133-150``,
``mmaction/utils/collect_env.py``)."""

from __future__ import annotations

import os
import platform
import random
import sys

import numpy as np


def collect_env() -> str:
    lines = [
        f"python: {sys.version.split()[0]}",
        f"platform: {platform.platform()}",
        f"numpy: {np.__version__}",
    ]
    try:
        import jax
        lines.append(f"jax: {jax.__version__}")
        lines.append(f"devices: {[str(d) for d in jax.devices()]}")
        lines.append(f"process: {jax.process_index()}/{jax.process_count()}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: unavailable ({e})")
    try:
        import flax
        import optax
        lines.append(f"flax: {flax.__version__}  optax: {optax.__version__}")
    except Exception:
        pass
    return "\n".join(lines)


def apply_device_override():
    """Honor ``AIM_DEVICE=cpu[:N]`` before any jax op — needed because the
    axon sitecustomize pins jax_platforms at interpreter startup, making
    plain env vars ineffective. Call first thing in CLI tools.

    Two further knobs for CI subprocess runs (the tool tests spawn fresh
    interpreters, so the conftest's in-process jax.config tuning does not
    reach them):

    * ``AIM_FAST_COMPILE=1`` — skip most XLA optimization passes
      (compile-dominated smoke runs on tiny inputs; semantics unchanged)
    * ``AIM_COMPILE_CACHE=<dir>`` — persistent compilation cache so warm
      test re-runs skip the compiles entirely
    """
    import jax

    if os.environ.get("AIM_FAST_COMPILE"):
        jax.config.update("jax_disable_most_optimizations", True)
    cache = os.environ.get("AIM_COMPILE_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    spec = os.environ.get("AIM_DEVICE")
    if not spec:
        return
    plat, _, n = spec.partition(":")
    jax.config.update("jax_platforms", plat)
    if plat == "cpu" and n:
        jax.config.update("jax_num_cpu_devices", int(n))


def set_global_seed(seed: int):
    """Seed host-side RNGs (JAX keys are explicit everywhere else)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
