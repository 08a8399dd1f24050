"""Rank-aware logging for fastgen-tpu.

TPU-native counterpart of the reference's loguru-based logger
(``fastgen/utils/logging_utils.py:22-99``): rank-0 prints at INFO by default,
other processes only log when ``FASTGEN_LOG_ALL_RANKS`` is set or at DEBUG
level. Uses stdlib logging (loguru is not available in this environment).
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "fastgen_tpu"


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _build_logger() -> logging.Logger:
    log = logging.getLogger(_LOGGER_NAME)
    if log.handlers:
        return log
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            fmt="[%(asctime)s|%(levelname)s|%(filename)s:%(lineno)d] %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    log.addHandler(handler)
    level = os.environ.get("FASTGEN_LOG_LEVEL", "INFO").upper()
    log.setLevel(level)
    log.propagate = False
    return log


_logger = _build_logger()


def _should_log() -> bool:
    if os.environ.get("FASTGEN_LOG_ALL_RANKS"):
        return True
    return _process_index() == 0


def debug(msg, *args, **kwargs):
    _logger.debug(msg, *args, stacklevel=2, **kwargs)


def info(msg, *args, **kwargs):
    if _should_log():
        _logger.info(msg, *args, stacklevel=2, **kwargs)


def warning(msg, *args, **kwargs):
    if _should_log():
        _logger.warning(msg, *args, stacklevel=2, **kwargs)


def error(msg, *args, **kwargs):
    _logger.error(msg, *args, stacklevel=2, **kwargs)


def critical(msg, *args, **kwargs):
    _logger.critical(msg, *args, stacklevel=2, **kwargs)


def set_level(level: str) -> None:
    _logger.setLevel(level.upper())
