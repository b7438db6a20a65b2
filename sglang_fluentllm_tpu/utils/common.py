"""Small shared utilities (analog of reference srt/utils.py grab-bag)."""

from __future__ import annotations

import logging
import sys
import traceback
from typing import List, Sequence


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def pick_bucket(buckets: Sequence[int], n: int) -> int:
    """Smallest bucket >= n; falls back to round_up to the largest bucket."""
    for b in buckets:
        if b >= n:
            return b
    return round_up(n, buckets[-1])


_LOG_FORMAT = "[%(asctime)s %(name)s %(levelname)s] %(message)s"


def configure_logger(level: str = "info", prefix: str = ""):
    fmt = _LOG_FORMAT
    if prefix:
        fmt = f"[{prefix}] " + fmt
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format=fmt,
        datefmt="%H:%M:%S",
        stream=sys.stdout,
        force=True,
    )


def get_exception_traceback() -> str:
    etype, value, tb = sys.exc_info()
    return "".join(traceback.format_exception(etype, value, tb))
