"""Trace-time mode flag: Mosaic (Pallas megakernel) vs plain XLA tracing.

A handful of kernel idioms have two semantically-equivalent emissions —
one that XLA prefers and one that the Mosaic TPU kernel compiler can
lower (see ``executor_pallas.py`` module docstring for the probed rules).
The megakernel wraps its trace in :func:`mosaic_trace`; everything else
traces with ``MOSAIC == False``.

Plain module-global (not a contextvar): all tracing rides the engine's
single dispatch thread (CLAUDE.md axon hazard), so thread-local semantics
are unnecessary.
"""

from __future__ import annotations

import contextlib

MOSAIC = False


@contextlib.contextmanager
def mosaic_trace():
    """Trace kernels in their Mosaic-compilable form."""
    global MOSAIC
    prev = MOSAIC
    MOSAIC = True
    try:
        yield
    finally:
        MOSAIC = prev
