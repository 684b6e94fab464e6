"""Structured logging.

Replaces the reference's `show_messages` booleans threaded through every API
(src/minimal.h:131, src/errorMeasure.cpp:98-147) and its rdbuf-swapping
stdout suppression (src/main.cc:260-264) with standard leveled loggers.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"
_CONFIGURED = False


def get_logger(name: str = "rs_sfm_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        level = os.environ.get("RS_SFM_LOG", "INFO").upper()
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root = logging.getLogger("rs_sfm_tpu")
        root.addHandler(handler)
        root.setLevel(level)
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name)
