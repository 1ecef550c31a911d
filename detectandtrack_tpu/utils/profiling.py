"""Profiling / tracing helpers (SURVEY.md §5 "Tracing / profiling").

The reference had only tic/toc timers; here `trace()` wraps a region in a
jax.profiler TensorBoard trace (inspectable with xprof/tensorboard), and
`device_time()` measures a jitted callable with full output forcing — the
only honest timing method on this runtime (see bench.py notes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_outputs(out) -> None:
    """Fetch one element of every output leaf (forces real execution)."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(out):
        np.asarray(jax.device_get(leaf)).ravel()[:1]


def device_time(fn: Callable, *args, iters: int = 5,
                warmup: int = 1) -> float:
    """Mean seconds per call of `fn(*args)` with forced outputs."""
    for _ in range(warmup):
        force_outputs(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        force_outputs(fn(*args))
    return (time.perf_counter() - t0) / iters
