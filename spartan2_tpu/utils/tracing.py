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

def _parse_level() -> int:
    v = os.environ.get("SPARTAN2_TPU_TRACE", "")
    if not v:
        return 0
    try:
        return int(v)
    except ValueError:
        return 1


_LEVEL = _parse_level()
_ENABLED = _LEVEL > 0
_depth = 0


class _Span:
    """Handle yielded by span(): lets the body register device values to
    block on at span exit (level >= 2), so async-dispatched kernels are
    attributed to the phase that queued them instead of the next pull."""

    __slots__ = ("_vals",)

    def __init__(self):
        self._vals = []

    def sync(self, *vals):
        if _LEVEL >= 2:
            self._vals.extend(vals)


_NOOP = _Span()


@contextlib.contextmanager
def span(name: str, **fields):
    """Time a phase; prints on exit when tracing is enabled.

    SPARTAN2_TPU_TRACE=1: wall time of the span body (async dispatch —
    queued device work surfaces at the NEXT device_get).
    SPARTAN2_TPU_TRACE=2: spans additionally block on any values passed
    to the yielded handle's .sync(...), attributing device execution to
    the span that dispatched it.
    """
    global _depth
    if not _ENABLED:
        yield _NOOP
        return
    t0 = time.perf_counter()
    _depth += 1
    h = _Span()
    try:
        yield h
    finally:
        if h._vals:
            import jax

            jax.block_until_ready(h._vals)
        _depth -= 1
        ms = (time.perf_counter() - t0) * 1e3
        extra = "".join(f" {k}={v}" for k, v in fields.items())
        print(f"{'  ' * _depth}{name}: {ms:.1f} ms{extra}", file=sys.stderr)


def enabled() -> bool:
    return _ENABLED


def level() -> int:
    return _LEVEL


def lap(name: str, t_prev: float) -> float:
    """Per-kernel lap timing for level >= 2: print elapsed since t_prev
    and return a fresh timestamp.  Callers block_until_ready first."""
    now = time.perf_counter()
    print(f"{'  ' * _depth}  [lap] {name}: {(now - t_prev) * 1e3:.1f} ms",
          file=sys.stderr)
    return now
