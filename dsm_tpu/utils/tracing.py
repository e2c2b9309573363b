"""Profiling / tracing utilities.

TPU analogue of the reference's tracing spans + chrome-trace export
(moshi-cli --tracing, moshi-backend --chrome-tracing; SURVEY.md §5):
``jax.profiler`` traces viewable in Perfetto/XProf, plus lightweight named
span timing that degrades to the bench recorders when no trace is active.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

from .bench import recorder


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/dsm-trace"):
    """Capture a device profile for the enclosed block.

    View with Perfetto (trace.json.gz inside the run dir) or XProf.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def span(name: str):
    """Named span: shows up in device traces (TraceAnnotation) and always
    feeds the latency recorders (reference tracing::span equivalent)."""
    import jax

    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        recorder(name).record(time.perf_counter() - t0)


def annotate_fn(name: Optional[str] = None):
    """Decorator variant of :func:`span`."""

    def deco(fn):
        label = name or fn.__qualname__

        def wrapped(*args, **kwargs):
            with span(label):
                return fn(*args, **kwargs)

        return wrapped

    return deco
