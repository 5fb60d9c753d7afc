"""Structured console logger.

Provides the same message taxonomy as the reference framework's observability
layer (reference: etude/utils/logger.py — stage/step/substep/info/success/
warn/error/skip/debug plus tqdm-safe progress variants), controlled by the
LOG_LEVEL and NO_COLOR environment variables.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

_LEVELS = {"DEBUG": 10, "INFO": 20, "WARN": 30, "ERROR": 40, "SILENT": 100}


class _Style:
    def __init__(self, enabled: bool):
        if enabled:
            self.bold = "\033[1m"
            self.dim = "\033[2m"
            self.reset = "\033[0m"
            self.cyan = "\033[36m"
            self.green = "\033[32m"
            self.yellow = "\033[33m"
            self.red = "\033[31m"
            self.blue = "\033[34m"
            self.magenta = "\033[35m"
            self.grey = "\033[90m"
        else:
            for k in ("bold", "dim", "reset", "cyan", "green", "yellow",
                      "red", "blue", "magenta", "grey"):
                setattr(self, k, "")


class EtudeLogger:
    """Singleton console logger with a strict message taxonomy."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr
        level_name = os.environ.get("LOG_LEVEL", "INFO").upper()
        self.level = _LEVELS.get(level_name, 20)
        use_color = (
            os.environ.get("NO_COLOR") is None
            and hasattr(self.stream, "isatty")
            and self.stream.isatty()
        )
        self.s = _Style(use_color)
        self._stage_count = 0
        self._t0 = time.time()

    # ---- core emit ----------------------------------------------------
    def _emit(self, msg: str, level: int = 20):
        if level < self.level:
            return
        try:
            import tqdm  # noqa: WPS433 — tqdm-safe write when bars are live

            tqdm.tqdm.write(msg, file=self.stream)
        except Exception:
            print(msg, file=self.stream)

    # ---- taxonomy ------------------------------------------------------
    def stage(self, msg: str):
        self._stage_count += 1
        s = self.s
        self._emit(f"\n{s.bold}{s.cyan}━━ [{self._stage_count}] {msg} ━━{s.reset}")

    def step(self, msg: str):
        self._emit(f"{self.s.blue}▶{self.s.reset} {msg}")

    def substep(self, msg: str):
        self._emit(f"  {self.s.grey}·{self.s.reset} {msg}")

    def info(self, msg: str):
        self._emit(f"  {msg}")

    def success(self, msg: str):
        self._emit(f"{self.s.green}✔{self.s.reset} {msg}")

    def warn(self, msg: str):
        self._emit(f"{self.s.yellow}⚠ {msg}{self.s.reset}", level=30)

    def error(self, msg: str):
        self._emit(f"{self.s.red}✘ {msg}{self.s.reset}", level=40)

    def skip(self, msg: str):
        self._emit(f"{self.s.grey}↷ skip: {msg}{self.s.reset}")

    def debug(self, msg: str):
        self._emit(f"{self.s.dim}{msg}{self.s.reset}", level=10)

    # ---- progress-safe variants ---------------------------------------
    def progress_info(self, msg: str):
        self.info(msg)

    def progress_warn(self, msg: str):
        self.warn(msg)

    def progress_success(self, msg: str):
        self.success(msg)

    def elapsed(self) -> float:
        return time.time() - self._t0


logger = EtudeLogger()
