"""Structured per-phase timing (reference: tracing + start_span!, lib.rs:52-60).

The reference wraps every prover phase in an info_span and logs
elapsed_ms; this module provides the same observability with a
contextmanager.  Enable with SPARTAN2_TPU_TRACE=1 (or any non-empty
value); spans print as "span_name: N.N ms" on stderr, nested spans
indent.  Zero overhead when disabled (a no-op contextmanager).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

_ENABLED = bool(os.environ.get("SPARTAN2_TPU_TRACE"))
_depth = 0


@contextlib.contextmanager
def span(name: str, **fields):
    """Time a phase; prints on exit when tracing is enabled."""
    global _depth
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        ms = (time.perf_counter() - t0) * 1e3
        extra = "".join(f" {k}={v}" for k, v in fields.items())
        print(f"{'  ' * _depth}{name}: {ms:.1f} ms{extra}", file=sys.stderr)


def enabled() -> bool:
    return _ENABLED
