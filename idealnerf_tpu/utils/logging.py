"""Stdlib logging (reference: utils/log_utils.py:4-8)."""

import logging


def get_logger(name: str = "idealnerf") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False  # avoid double lines via the root logger
    return logger
