"""Verbosity-gated logging, mirroring the reference's EVA_VERBOSITY
environment variable (reference: eva/util/logging.h:12-21,
logging.cpp:12-66): numeric or one of silent/info/debug/trace.
log() goes to stdout, warn() to stderr."""

from __future__ import annotations

import os
import sys

SILENT, INFO, DEBUG, TRACE = 0, 1, 2, 3

_NAMES = {"silent": SILENT, "info": INFO, "debug": DEBUG, "trace": TRACE}


def _parse_verbosity() -> int:
    raw = os.environ.get("EVA_VERBOSITY", "").strip().lower()
    if not raw:
        return SILENT
    if raw in _NAMES:
        return _NAMES[raw]
    try:
        return max(SILENT, min(TRACE, int(raw)))
    except ValueError:
        print(f"WARNING: Unknown EVA_VERBOSITY value {raw!r}", file=sys.stderr)
        return SILENT


_verbosity = _parse_verbosity()


def verbosity_at_least(level: int) -> bool:
    return _verbosity >= level


def set_verbosity(level: int) -> None:
    global _verbosity
    _verbosity = level


def log(level: int, msg: str, *args) -> None:
    if _verbosity >= level:
        print(msg % args if args else msg)


def warn(msg: str, *args) -> None:
    print("WARNING: " + (msg % args if args else msg), file=sys.stderr)
