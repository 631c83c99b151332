#!/usr/bin/env python
"""Checkpoint publishing (reference ``tools/deployment/publish_model.py``):
strip optimizer state, keep params only, stamp a content hash.

    python tools/deployment/publish_model.py <ckpt_dir> <out_dir>
"""

import argparse
import hashlib
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help="orbax checkpoint dir from training")
    p.add_argument("out", help="output dir for the published checkpoint")
    args = p.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    published = {
        "trainable": tree["trainable"],
        "frozen": tree["frozen"],
        "epoch": tree.get("epoch"),
    }
    out = os.path.abspath(args.out)
    if os.path.exists(out):
        shutil.rmtree(out)
    ocp.PyTreeCheckpointer().save(out, published)

    # content hash over the flattened param bytes (reference sha256-stamps
    # the file; orbax ckpts are dirs, so stamp a metadata file instead)
    import jax
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(published):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    digest = h.hexdigest()[:8]
    with open(os.path.join(out, "PUBLISH.json"), "w") as f:
        json.dump({"sha256_prefix": digest,
                   "source": os.path.abspath(args.ckpt)}, f, indent=1)
    print(f"published to {out} (hash {digest})")


if __name__ == "__main__":
    main()
