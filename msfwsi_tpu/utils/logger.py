"""Logging: rank-aware stdout + per-run file logs.

Parity with the reference's detectron2-derived ``setup_logger``
(``src/utils/logger.py:17-69``): process 0 logs to stdout and
``<log_dir>/log.txt``; other processes to ``log.txt.rank{N}``. Cached so
repeat calls return the same logger. Rate-limited helpers
(``log_first_n``/``log_every_n``/``log_every_n_seconds``) mirror
``logger.py:110-176``.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time

__all__ = ["setup_logger", "log_first_n", "log_every_n", "log_every_n_seconds"]

_FORMAT = "[%(asctime)s] %(name)s %(levelname)s: %(message)s"
_DATEFMT = "%m/%d %H:%M:%S"


@functools.lru_cache(maxsize=None)
def setup_logger(
    output: str | None = None,
    distributed_rank: int | None = None,
    *,
    name: str = "MSF-WSI",
    abbrev_name: str | None = None,
) -> logging.Logger:
    if distributed_rank is None:
        try:
            import jax

            distributed_rank = jax.process_index()
        except Exception:
            distributed_rank = 0

    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    fmt = _FORMAT
    if abbrev_name:
        # Reference semantics: abbreviate the logger name in the emitted
        # lines (detectron2-style), e.g. abbrev_name="mw" shortens every
        # record from this logger tree.
        fmt = _FORMAT.replace("%(name)s", abbrev_name)
    formatter = logging.Formatter(fmt, datefmt=_DATEFMT)
    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(formatter)
        logger.addHandler(ch)

    if output is not None:
        filename = os.path.join(output, "log.txt") if not output.endswith(".txt") else output
        if distributed_rank > 0:
            filename = f"{filename}.rank{distributed_rank}"
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        fh = logging.StreamHandler(_cached_log_stream(filename))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)

    return logger


@functools.lru_cache(maxsize=None)
def _cached_log_stream(filename: str):
    return open(filename, "a", buffering=1)


_LOG_COUNTER: dict = {}
_LOG_TIMER: dict = {}


def _caller_key():
    # Reference semantics (src/utils/logger.py:88-103): walk out of this
    # module to the first external frame — keying on the CALL SITE, not the
    # caller's caller (a fixed _getframe depth suppressed distinct calls on
    # different lines of one function and double-counted shared helpers).
    frame = sys._getframe(2)
    here = os.path.join("utils", "logger.")
    while frame:
        code = frame.f_code
        if here not in code.co_filename:
            return (code.co_filename, frame.f_lineno, code.co_name)
        frame = frame.f_back
    return ("<unknown>", 0, "<unknown>")


def log_first_n(lvl, msg, n=1, *, name=None, key="caller"):
    """Reference key semantics (logger.py:110-142): "caller" dedups per
    call site, "message" per message content ALONE (the same warning from
    different sites logs once), ("caller", "message") per pair."""
    if isinstance(key, str):
        key = (key,)
    hash_key = ()
    if "caller" in key:
        hash_key = hash_key + _caller_key()
    if "message" in key:
        hash_key = hash_key + (msg,)
    _LOG_COUNTER[hash_key] = _LOG_COUNTER.get(hash_key, 0) + 1
    if _LOG_COUNTER[hash_key] <= n:
        logging.getLogger(name or "MSF-WSI").log(lvl, msg)


def log_every_n(lvl, msg, n=1, *, name=None):
    caller = _caller_key()
    _LOG_COUNTER[caller] = _LOG_COUNTER.get(caller, 0) + 1
    if (_LOG_COUNTER[caller] - 1) % n == 0:
        logging.getLogger(name or "MSF-WSI").log(lvl, msg)


def log_every_n_seconds(lvl, msg, n=1, *, name=None):
    caller = _caller_key()
    last = _LOG_TIMER.get(caller)
    now = time.time()
    if last is None or now - last >= n:
        logging.getLogger(name or "MSF-WSI").log(lvl, msg)
        _LOG_TIMER[caller] = now
