"""True multi-process distributed execution (VERDICT r4 item 7).

The reference's only distributed mode launches N OS processes
(``tools/dist_train.sh:8`` -> ``torch.distributed.launch``); every other
multi-device test in this repo is single-process over virtual devices. This
spawns 2 real processes (coordinator + worker) on localhost, each owning 2
CPU devices and half the global batch, runs jitted train steps through
``jax.distributed`` + ``make_array_from_process_local_data``
(``parallel/mesh.py:91-97``), and asserts the distributed loss equals the
single-process loss on the same global batch — the DDP-equivalence
contract (reference ``recognizers/base.py:239-242`` mean-reduces losses
across ranks; here XLA's collectives produce the same replicated mean).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
WORKER = os.path.join(REPO, "tests", "test_runtime", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_oracle():
    """Same model/batches/steps on this process's devices (GSPMD only)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from adapt_image_models_tpu.core.train_state import (
        create_train_state, make_train_step,
    )
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.parallel.mesh import shard_batch

    RES, PATCH, D, HEADS, LAYERS, T, CLASSES = 32, 16, 64, 4, 2, 4, 5
    GLOBAL_B, STEPS = 4, 2
    model = build_model(dict(
        type="Recognizer3D",
        backbone=dict(type="AIM", input_resolution=RES, patch_size=PATCH,
                      width=D, layers=LAYERS, heads=HEADS, num_frames=T,
                      drop_path_rate=0.0),
        cls_head=dict(type="I3DHead", num_classes=CLASSES, in_channels=D,
                      dropout_ratio=0.0),
        test_cfg=dict(average_clips=None)))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, T, RES, RES)))["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(-1, 1),
                ("data", "model"))
    step = jax.jit(make_train_step(model, tx))
    rng = jax.random.PRNGKey(7)
    losses = []
    with mesh:
        for s in range(STEPS):
            g = np.random.default_rng(100 + s)
            imgs = g.normal(size=(GLOBAL_B, 1, 3, T, RES, RES)).astype(
                np.float32)
            labels = (np.arange(GLOBAL_B) % CLASSES).astype(np.int32)
            batch = shard_batch(mesh, {"imgs": imgs, "label": labels})
            state, metrics = step(state, batch, rng)
            losses.append(float(jax.device_get(metrics["loss"])))
    return losses


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    out = tmp_path / "dist0.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    # drop any single-process device-count overrides from the parent
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"
    dist_losses = json.loads(out.read_text())["losses"]

    oracle = _single_process_oracle()
    np.testing.assert_allclose(dist_losses, oracle, rtol=2e-5, atol=1e-6)
    # two steps must differ (the optimizer actually advanced)
    assert abs(dist_losses[0] - dist_losses[1]) > 1e-7
