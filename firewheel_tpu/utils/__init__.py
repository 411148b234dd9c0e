"""Utility helpers: WAV IO, MIDI, schedule visualization, profiling."""

from .wav import read_wav, write_wav
from . import mp3, opus, vorbis
from .midi import Instrument, MidiNote, MidiSequencer, MidiSong, parse_midi
from .resample import resample
from .net_stream import HttpByteSource, HttpWavStreamReader, SegmentCache
from .viz import ascii_graph, schedule_table, to_dot, to_html
from .profiler import annotate, trace

__all__ = [
    "read_wav",
    "mp3",
    "opus",
    "vorbis",
    "Instrument",
    "MidiNote",
    "MidiSequencer",
    "MidiSong",
    "parse_midi",
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
