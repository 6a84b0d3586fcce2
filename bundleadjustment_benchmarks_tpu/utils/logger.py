"""File logger with levels + timestamps, mirroring the reference Logger.

Reference: /root/reference/src/Logger.{h,cpp} — a mutex-guarded singleton
writing ``[HH:MM:SS] LEVEL: message`` lines to a file (default output.log),
plus matrix dump helpers used for offline debugging. Here we wrap Python's
thread-safe ``logging`` with the same message shapes and a singleton access
pattern (create_logger/instance), and numpy-based dump helpers.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional

import numpy as np

INFO = "Info"
WARNING = "Warning"
ERROR = "Error"
DEBUG = "Debug"

_LEVELS = {
    INFO: logging.INFO,
    WARNING: logging.WARNING,
    ERROR: logging.ERROR,
    DEBUG: logging.DEBUG,
}

_instance: Optional["Logger"] = None
_lock = threading.Lock()


class Logger:
    """Timestamped file logger (reference Logger.h:12-19, Logger.cpp:15-33)."""

    def __init__(self, filename: str = "output.log"):
        self.filename = filename
        self._logger = logging.getLogger(f"batpu.{filename}")
        self._logger.setLevel(logging.DEBUG)
        self._logger.propagate = False
        for h in list(self._logger.handlers):
            self._logger.removeHandler(h)
        handler = logging.FileHandler(filename)
        handler.setFormatter(logging.Formatter("[%(asctime)s] %(message)s", "%H:%M:%S"))
        self._logger.addHandler(handler)

    def log(self, level: str, message: str) -> None:
        self._logger.log(_LEVELS.get(level, logging.INFO), f"{level}: {message}")

    # Matrix dump helpers (reference Logger.h:46-94) for offline comparison.
    def log_matrix(self, name: str, mat) -> None:
        arr = np.asarray(mat)
        self.log(DEBUG, f"Matrix {name} ({arr.shape}):\n{np.array2string(arr)}")

    def log_matrix_csv(self, path: str, mat) -> None:
        np.savetxt(path, np.asarray(mat), delimiter=",")

    def log_sparse_matrix(self, name: str, rows, cols, vals) -> None:
        lines = "\n".join(
            f"{int(r)} {int(c)} {v:.17g}" for r, c, v in zip(rows, cols, vals)
        )
        self.log(DEBUG, f"SparseMatrix {name} (triplets):\n{lines}")


def create_logger(filename: str = "output.log") -> Logger:
    """Create/replace the singleton (reference Logger::createLogger, Logger.cpp:35-39)."""
    global _instance
    with _lock:
        _instance = Logger(filename)
    return _instance


def instance() -> Logger:
    """Singleton access with default-file fallback (reference Logger.cpp:42-47)."""
    global _instance
    with _lock:
        if _instance is None:
            _instance = Logger("output.log")
        return _instance
