"""Logging: singleton logger with env-controlled level.

Replaces the reference's Python Logger (logger.py:22-97, TLLM_LOG_LEVEL) and
C++ TLLM_LOG_* macros with TLLM_LOG_FIRST_RANK_ONLY (common/logger.cpp:26-32).
On TPU "rank" is the JAX process index; first-rank-only filtering keeps
multi-host logs readable.
"""

from __future__ import annotations

import logging
import os
import sys

_LEVELS = {
    "verbose": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "internal_error": logging.CRITICAL,
}


class _Logger:
    def __init__(self):
        self._logger = logging.getLogger("trtllm_llama_tpu")
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "[TLLM-TPU][%(levelname)s] %(message)s"))
        self._logger.addHandler(handler)
        self._logger.propagate = False
        level = os.environ.get("TLLM_LOG_LEVEL", "warning").lower()
        self._logger.setLevel(_LEVELS.get(level, logging.WARNING))
        self._first_rank_only = bool(
            os.environ.get("TLLM_LOG_FIRST_RANK_ONLY"))

    def _skip(self) -> bool:
        if not self._first_rank_only:
            return False
        try:
            import jax
            return jax.process_index() != 0
        except Exception:
            return False

    def set_level(self, level: str):
        self._logger.setLevel(_LEVELS[level.lower()])

    def debug(self, msg, *a):
        if not self._skip():
            self._logger.debug(msg, *a)

    def info(self, msg, *a):
        if not self._skip():
            self._logger.info(msg, *a)

    def warning(self, msg, *a):
        if not self._skip():
            self._logger.warning(msg, *a)

    def error(self, msg, *a):
        self._logger.error(msg, *a)


logger = _Logger()
