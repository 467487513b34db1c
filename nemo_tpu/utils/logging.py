"""Rank-aware logging.

TPU-native counterpart of the reference's `nemo/utils/nemo_logging.py`:
a singleton logger that prefixes the JAX process index and can add
per-process file handlers (reference: rank-aware handlers, nemo_logging.py).
"""

from __future__ import annotations

import logging as _pylogging
import os
import sys

_LOGGER_NAME = "nemo_tpu"


def _process_index() -> int:
    # Avoid importing jax at module import time (keeps logging usable before
    # jax.distributed.initialize); fall back to env bootstrap variables.
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", "0"))


class _RankFilter(_pylogging.Filter):
    def filter(self, record: _pylogging.LogRecord) -> bool:
        record.rank = _process_index()
        return True


def _build_logger() -> _pylogging.Logger:
    logger = _pylogging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    level = os.environ.get("NEMO_TPU_LOG_LEVEL", "INFO").upper()
    logger.setLevel(level)
    handler = _pylogging.StreamHandler(sys.stderr)
    handler.addFilter(_RankFilter())
    handler.setFormatter(
        _pylogging.Formatter(
            "[nemo_tpu %(levelname)s rank%(rank)s %(asctime)s %(module)s:%(lineno)d] %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


logging = _build_logger()


def add_file_handler(path: str) -> None:
    """Per-process log file (reference: exp_manager rank-aware file logging)."""
    handler = _pylogging.FileHandler(path)
    handler.addFilter(_RankFilter())
    handler.setFormatter(
        _pylogging.Formatter("[%(levelname)s rank%(rank)s %(asctime)s] %(message)s")
    )
    logging.addHandler(handler)
