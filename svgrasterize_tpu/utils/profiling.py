"""Tracing and profiling instrumentation.

The reference's only instrumentation is one wall-clock print
(svgrasterize.py:3854-3863).  Here every pipeline stage can be traced:

  * `stage(name)` — context manager recording wall time per stage, nested,
    also emitting a `jax.named_scope` so stages show up in XLA profiles
  * `report()` — stage table, printed by the CLI with --profile
  * `trace_to(dir)` — wraps jax.profiler for full device traces
  * `checked(fn)` — jax.experimental.checkify wrapper that surfaces NaN/OOB
    errors from jitted code (the functional answer to sanitizers)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_times: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_enabled = False


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def reset() -> None:
    _times.clear()
    _counts.clear()


@contextlib.contextmanager
def stage(name: str):
    """Record wall time for a pipeline stage (and tag it for XLA profiles)."""
    if not _enabled:
        with jax.named_scope(name):
            yield
        return
    start = time.perf_counter()
    with jax.named_scope(name):
        yield
    _times[name] += time.perf_counter() - start
    _counts[name] += 1


def report() -> str:
    if not _times:
        return "(no stages recorded)"
    width = max(len(k) for k in _times)
    lines = [
        f"{name:<{width}}  {seconds * 1e3:9.1f} ms  x{_counts[name]}"
        for name, seconds in sorted(_times.items(), key=lambda kv: -kv[1])
    ]
    return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a full device profile into log_dir (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked(fn):
    """Wrap a jittable fn so NaN/division/OOB errors raise on host.

    jax.experimental.checkify moves the error into a value; this re-throws.
    """
    from jax.experimental import checkify

    checked_fn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
