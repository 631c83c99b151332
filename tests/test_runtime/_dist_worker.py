"""Two-process ``jax.distributed`` worker (test_two_process_distributed).

Each process owns 2 virtual CPU devices and HALF of the global batch (the
host-sharded loader contract: ``apis/train.py`` gives every host a
``num_shards=num_hosts`` loader). The global batch array is assembled with
``jax.make_array_from_process_local_data`` (``parallel/mesh.py:96`` —
the multi-process branch of ``shard_batch``), then one jitted train step
runs over the 4-device data mesh; XLA's cross-process collectives produce
the replicated mean loss. This is the reference's
``torch.distributed.launch`` N-process execution mode
(``tools/dist_train.sh:8``) in jax form.

argv: process_id num_processes coordinator_port out_json
"""

import json
import os
import sys

pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from adapt_image_models_tpu.core.train_state import (  # noqa: E402
    create_train_state, make_train_step,
)
from adapt_image_models_tpu.models import build_model  # noqa: E402
from adapt_image_models_tpu.parallel.mesh import shard_batch  # noqa: E402

RES, PATCH, D, HEADS, LAYERS, T, CLASSES = 32, 16, 64, 4, 2, 4, 5
GLOBAL_B, STEPS = 4, 2

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, len(jax.devices())

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

mesh = Mesh(np.asarray(jax.devices()).reshape(-1, 1), ("data", "model"))
step = jax.jit(make_train_step(model, tx))

rng = jax.random.PRNGKey(7)
losses = []
half = GLOBAL_B // nproc
with mesh:
    for s in range(STEPS):
        # deterministic global batch; every process sees the same stream
        # and takes its host shard, exactly like the seeded sharded loader
        g = np.random.default_rng(100 + s)
        imgs_global = g.normal(size=(GLOBAL_B, 1, 3, T, RES, RES)).astype(
            np.float32)
        labels_global = (np.arange(GLOBAL_B) % CLASSES).astype(np.int32)
        local = slice(pid * half, (pid + 1) * half)
        device_batch = shard_batch(mesh, {
            "imgs": imgs_global[local], "label": labels_global[local]})
        state, metrics = step(state, device_batch, rng)
        losses.append(float(jax.device_get(metrics["loss"])))

if pid == 0:
    with open(out_path, "w") as f:
        json.dump({"losses": losses}, f)
jax.distributed.shutdown()
