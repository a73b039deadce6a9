"""Logging: process-0 printing + optional file logger.

Role of the reference's rank0_print / build_logger (llava/utils.py:85-140):
under SPMD, jax runs one python process per host, so "rank 0" is
jax.process_index() == 0.
"""

from __future__ import annotations

import logging
import sys

__all__ = ["rank0_print", "build_logger"]


def rank0_print(*args, **kwargs):
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs)


def build_logger(name: str, filepath: str | None = None, level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s | %(levelname)s | %(name)s | %(message)s")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if filepath:
            fh = logging.FileHandler(filepath)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
