"""Rank-aware root logger (parity: ``mmaction/utils/logger.py:6``).

On multi-host JAX, process 0 logs at the requested level; other processes
log at ERROR only, matching the reference's rank-0-INFO behaviour.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS = {}


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", "0"))


def get_root_logger(log_file: Optional[str] = None, log_level: int = logging.INFO) -> logging.Logger:
    name = "adapt_image_models_tpu"
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None and _process_index() == 0:
        fh = logging.FileHandler(log_file, "a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(log_level if _process_index() == 0 else logging.ERROR)
    _LOGGERS[name] = logger
    return logger
