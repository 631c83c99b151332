#!/usr/bin/env python
"""Print the fully-resolved config (reference ``tools/analysis/print_config.py``).

    python tools/analysis/print_config.py <config> [--cfg-options k=v ...]
"""

import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from adapt_image_models_tpu.config import Config
from adapt_image_models_tpu.config.config import (
    add_cfg_options_arg, apply_cfg_options,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    add_cfg_options_arg(p)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    apply_cfg_options(cfg, args.cfg_options)
    for k, v in cfg.to_dict().items():
        print(f"{k} = {pprint.pformat(v)}")


if __name__ == "__main__":
    main()
