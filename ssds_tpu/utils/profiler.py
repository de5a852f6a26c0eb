"""Profiling/tracing helpers.

The reference's observability is a wall-clock Timer (SURVEY.md §5); the
TPU-native upgrade is ``jax.profiler`` traces viewable in TensorBoard's
profile plugin, plus ``block_until_ready``-correct section timing.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block::

        with profiler.trace(cfg.LOG_DIR):
            state, m = train_step(state, batch)
            jax.block_until_ready(m)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, results: dict):
    """Device-correct wall timing: blocks on everything dispatched so far."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        # ensure queued device work is included
        jax.effects_barrier()
        results[name] = results.get(name, 0.0) + time.perf_counter() - t0


def annotate(name: str):
    """Named trace span (shows up in the TensorBoard profile timeline)."""
    return jax.profiler.TraceAnnotation(name)
