"""Rank-aware logging — reference `prismatic/overwatch/overwatch.py:47-147`.

In JAX multi-host programs the process index plays the role of torch's rank:
INFO on process 0, ERROR elsewhere, with `rank_zero_only`/`rank_zero_info`
helpers. Single-process (and the CPU mesh) behaves like `PureOverwatch`.
"""

from __future__ import annotations

import functools
import logging
import sys
from typing import Callable, Optional

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s :: %(message)s"


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class Overwatch:
    def __init__(self, name: str):
        self.logger = logging.getLogger(name)
        if not self.logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(logging.Formatter(_FORMAT, "%m/%d %H:%M:%S"))
            self.logger.addHandler(handler)
        self.logger.setLevel(
            logging.INFO if _process_index() == 0 else logging.ERROR)
        self.logger.propagate = False

    def info(self, msg, *args, **kw):
        self.logger.info(msg, *args, **kw)

    def warning(self, msg, *args, **kw):
        self.logger.warning(msg, *args, **kw)

    def error(self, msg, *args, **kw):
        self.logger.error(msg, *args, **kw)

    def debug(self, msg, *args, **kw):
        self.logger.debug(msg, *args, **kw)

    @property
    def rank(self) -> int:
        return _process_index()

    def is_rank_zero(self) -> bool:
        return _process_index() == 0

    def rank_zero_only(self, fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if self.is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper


def initialize_overwatch(name: str) -> Overwatch:
    """Reference `initialize_overwatch` (overwatch.py:146-147)."""
    return Overwatch(name)
