"""Utility helpers: WAV IO, schedule visualization, profiling."""

from .wav import read_wav, write_wav
from .viz import ascii_graph, schedule_table, to_dot, to_html
from .profiler import annotate, trace

__all__ = [
    "read_wav",
    "write_wav",
    "ascii_graph",
    "schedule_table",
    "to_dot",
    "to_html",
    "annotate",
    "trace",
]
