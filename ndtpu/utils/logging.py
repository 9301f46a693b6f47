"""Logging helpers, including the reference's matrix debug printer
(`core_legacy/src/matrix.c:28-35` / `matrix.h:40`) as a logging util."""
from __future__ import annotations

import logging
import sys


def get_logger(name: str = "ndtpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("[%(name)s] %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def print_matrix(matrix, rows=None, cols=None, file=sys.stdout):
    """Row-major matrix printer (print_matrix, matrix.c:28-35)."""
    import numpy as np

    m = np.asarray(matrix)
    if rows is not None and cols is not None:
        m = m.reshape(rows, cols)
    for row in np.atleast_2d(m):
        print(" ".join(f"{v:f}" for v in row), file=file)
