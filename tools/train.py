#!/usr/bin/env python
"""Training CLI (parity: reference ``tools/train.py:78-206``).

    python tools/train.py configs/recognition/vit/vitclip_base_k400_8frames.py \
        [--work-dir DIR] [--seed N] [--auto-resume] [--no-validate] \
        [--max-steps N] [--cfg-options k=v ...]

Multi-host: run once per host with ``jax.distributed`` env configured; the
mesh spans all chips automatically (no torch.distributed.launch analogue
needed).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adapt_image_models_tpu.utils.env import apply_device_override
apply_device_override()

from adapt_image_models_tpu.config import Config
from adapt_image_models_tpu.utils.logger import get_root_logger
from adapt_image_models_tpu.utils.env import collect_env, set_global_seed


def parse_args():
    p = argparse.ArgumentParser(description="Train a video recognizer")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--max-steps", type=int, default=None,
                   help="stop after N optimizer steps (smoke tests)")
    p.add_argument("--multi-host", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="dot-key overrides, e.g. data.videos_per_gpu=4")
    return p.parse_args()


def main():
    args = parse_args()
    if args.multi_host:
        import jax
        jax.distributed.initialize()

    cfg = Config.fromfile(args.config)
    overrides = {}
    for item in args.cfg_options:
        k, _, v = item.partition("=")
        overrides[k] = v
    cfg.merge_from_dict(overrides)

    work_dir = args.work_dir or cfg.get("work_dir", "./work_dir")
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(log_file=os.path.join(work_dir, "train.log"))
    logger.info("Environment:\n" + collect_env())
    logger.info(f"Config: {args.config}")
    cfg.dump(os.path.join(work_dir, "config_dump.py"))
    set_global_seed(args.seed)

    from adapt_image_models_tpu.apis.train import train_model
    train_model(cfg.to_dict(), work_dir=work_dir,
                validate=not args.no_validate, seed=args.seed,
                auto_resume=args.auto_resume, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
