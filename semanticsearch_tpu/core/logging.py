"""Namespaced loggers with a silent gate.

Mirrors the behavior of the reference's ``Method/semantic_common.py:290-319``
(``init_logger`` / ``log_msg``): stdlib loggers under one namespace with a
boolean silence gate, so library code can log without configuring the root.
"""
from __future__ import annotations

import logging
from typing import Optional

_NAMESPACE = "semsearch"
_configured = False


def _ensure_configured() -> None:
    global _configured
    if _configured:
        return
    logger = logging.getLogger(_NAMESPACE)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    _configured = True


def get_logger(channel: str = "core") -> logging.Logger:
    _ensure_configured()
    return logging.getLogger(f"{_NAMESPACE}.{channel}")


def log_msg(
    silent: bool,
    message: str,
    level: str = "info",
    channel: str = "core",
) -> None:
    """Log unless silenced (reference contract: semantic_common.py:313-319)."""
    if silent:
        return
    logger = get_logger(channel)
    getattr(logger, level.lower(), logger.info)(message)
