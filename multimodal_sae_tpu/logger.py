"""File logger (reference sae_auto_interp/logger.py:1-13)."""

import logging

logger = logging.getLogger("multimodal_sae_tpu")
logger.setLevel(logging.INFO)

if not logger.handlers:
    handler = logging.FileHandler("multimodal_sae_tpu.log")
    handler.setLevel(logging.INFO)
    formatter = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    handler.setFormatter(formatter)
    logger.addHandler(handler)
