"""Profiling and tracing hooks.

The reference's observability is log lines + schedule Debug dumps (SURVEY
§5).  Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace of the device work inside;
* :func:`annotate` — named host-side region inside a trace;
* ``OutputStream.stats()`` (backend/stream.py) — per-buffer render
  latency percentiles against the realtime budget;
* the schedule pretty-printers live in ``utils/viz.py``.
"""

from __future__ import annotations

import contextlib

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device+host profile into ``logdir`` (view with
    TensorBoard's profile plugin or ui.perfetto.dev)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("render-chunk"): ...``"""
    import jax

    return jax.profiler.TraceAnnotation(name)
