"""Utility helpers: WAV IO, schedule visualization, profiling."""

from .wav import read_wav, write_wav
from . import mp3, opus, vorbis
from .resample import resample
from .net_stream import HttpByteSource, HttpWavStreamReader, SegmentCache
from .viz import ascii_graph, schedule_table, to_dot, to_html
from .profiler import annotate, trace

__all__ = [
    "read_wav",
    "mp3",
    "opus",
    "vorbis",
    "resample",
    "write_wav",
    "HttpByteSource",
    "HttpWavStreamReader",
    "SegmentCache",
    "ascii_graph",
    "schedule_table",
    "to_dot",
    "to_html",
    "annotate",
    "trace",
]
