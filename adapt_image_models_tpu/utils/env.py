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
    plain env vars ineffective. Call first thing in CLI tools."""
    spec = os.environ.get("AIM_DEVICE")
    if not spec:
        return
    plat, _, n = spec.partition(":")
    import jax
    jax.config.update("jax_platforms", plat)
    if plat == "cpu" and n:
        jax.config.update("jax_num_cpu_devices", int(n))


def set_global_seed(seed: int):
    """Seed host-side RNGs (JAX keys are explicit everywhere else)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
