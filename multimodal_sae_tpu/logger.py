"""Framework logger: a file-backed logger (reference sae_auto_interp/logger.py
writes `sae_auto_interp.log`).  Level configurable via MMSAE_LOG_LEVEL; the
file destination via MMSAE_LOG_FILE."""

from __future__ import annotations

import logging
import os

_LEVEL = os.environ.get("MMSAE_LOG_LEVEL", "INFO").upper()
_FILE = os.environ.get("MMSAE_LOG_FILE", "multimodal_sae_tpu.log")


def _build_logger() -> logging.Logger:
    log = logging.getLogger("multimodal_sae_tpu")
    log.setLevel(_LEVEL)
    if not log.handlers:
        handler = logging.FileHandler(_FILE)
        handler.setLevel(_LEVEL)
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        log.addHandler(handler)
    return log


logger = _build_logger()
