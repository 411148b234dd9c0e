"""Standard MIDI File playback onto a :class:`~firewheel_tpu.voice_pool.
VoicePool`.

The reference excludes MIDI *on the audio-graph level* but explicitly
promises the capability one layer up: "It will still be possible to
create a custom sampler/synthesizer that reads a MIDI file as input"
(``/root/reference/DESIGN_DOC.md:42``).  This module is that layer,
engine-idiomatic: a dependency-free SMF (Standard MIDI File) parser
producing absolute-time note events, and a :class:`MidiSequencer` that
schedules them onto the pool's sample-accurate trigger timeline
(``VoicePool.play(when=)``) — so the notes land on their exact stream
samples regardless of the host's ``update()`` cadence, the same
look-ahead scheme the music transport uses.

Mapping (classic sampler semantics):

* pitch — ``rate = 2**((note - root_note)/12)`` on the instrument's clip
  (coupled resampling, i.e. a *sampler* instrument; for stretched pads
  route a :class:`~firewheel_tpu.nodes.granular.GranularSamplerNode`
  yourself);
* velocity — amplitude ``velocity/127`` (``-inf..0 dB``), optionally
  squared (``velocity_curve="square"``) for a more played-in feel;
* sustain — one-shot clips simply ring; ``Instrument(sustain=True)``
  loops the clip and schedules the note-off as a sample-accurate
  ``stop(at_sample=)`` (declick release applies).

Scope: note on/off, tempo map (set-tempo metas, PPQ and SMPTE
divisions), program changes (selectable per-instrument), formats 0/1/2,
running status.  Controllers/pitch-bend/aftertouch are parsed past, not
interpreted — game jukebox scope, not a DAW.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

__all__ = [
    "MidiNote",
    "MidiSong",
    "parse_midi",
    "Instrument",
    "MidiSequencer",
]

_DEFAULT_US_PER_QN = 500_000  # 120 bpm, the SMF default


@dataclass(frozen=True)
class MidiNote:
    """One note, in absolute seconds (tempo map already applied)."""

    time_secs: float
    duration_secs: float
    note: int  # 0..127, 60 = middle C
    velocity: int  # 1..127
    channel: int  # 0..15 (9 = GM percussion)
    program: int  # GM program active at note-on (0 when never set)
    track: int


@dataclass
class MidiSong:
    notes: "list[MidiNote]"  # sorted by time_secs
    duration_secs: float
    ticks_per_quarter: Optional[int]  # None for SMPTE division
    tempo_changes: "list[tuple[float, float]]"  # (secs, bpm)
    format: int
    num_tracks: int


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.d):
            raise ValueError("truncated MIDI data")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.bytes(1)[0]

    def u16(self) -> int:
        b = self.bytes(2)
        return (b[0] << 8) | b[1]

    def u32(self) -> int:
        b = self.bytes(4)
        return (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]

    def varlen(self) -> int:
        v = 0
        for _ in range(4):
            b = self.u8()
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                return v
        raise ValueError("variable-length quantity longer than 4 bytes")

    @property
    def eof(self) -> bool:
        return self.pos >= len(self.d)


def _tick_to_secs(tick: int, tempo_map: "list[tuple[int, int]]",
                  tpq: int) -> float:
    """Piecewise-linear tick→seconds under a sorted (tick, us_per_qn)
    tempo map whose first entry is (0, default)."""
    secs = 0.0
    for i, (t0, us) in enumerate(tempo_map):
        t1 = tempo_map[i + 1][0] if i + 1 < len(tempo_map) else None
        if t1 is not None and tick >= t1:
            secs += (t1 - t0) * us * 1e-6 / tpq
        else:
            secs += (tick - t0) * us * 1e-6 / tpq
            break
    return secs


def parse_midi(src) -> MidiSong:
    """Parse an SMF from a path or ``bytes`` into absolute-time notes.

    Raises ``ValueError`` on malformed data.  Zero-velocity note-ons are
    note-offs (running-status idiom); a note left hanging at track end
    closes there.
    """
    if isinstance(src, (bytes, bytearray)):
        data = bytes(src)
    else:
        with open(src, "rb") as f:
            data = f.read()
    r = _Reader(data)
    if r.bytes(4) != b"MThd":
        raise ValueError("not a MIDI file (missing MThd)")
    hlen = r.u32()
    if hlen < 6:
        raise ValueError("bad MThd length")
    fmt = r.u16()
    ntrks = r.u16()
    division = r.u16()
    r.bytes(hlen - 6)  # spec: ignore header extensions

    smpte = bool(division & 0x8000)
    if smpte:
        fps = 256 - (division >> 8)  # two's complement of the high byte
        tpf = division & 0xFF
        if fps not in (24, 25, 29, 30) or tpf == 0:
            raise ValueError(f"bad SMPTE division 0x{division:04x}")
        tick_secs = 1.0 / (fps * tpf)
        tpq = None
    else:
        tpq = division
        if tpq == 0:
            raise ValueError("ticks-per-quarter of zero")

    # pass 1: split into per-track event lists at absolute ticks, and
    # gather the tempo map (all tracks — format 0/1 keep it in track 0
    # by convention, but files in the wild scatter it)
    tracks: "list[list[tuple[int, int, bytes]]]" = []  # (tick,status,data)
    tempo_ticks: "list[tuple[int, int]]" = []
    while not r.eof:
        tag = r.bytes(4)
        length = r.u32()
        body = _Reader(r.bytes(length))
        if tag != b"MTrk":
            continue  # alien chunk: spec says skip
        events: "list[tuple[int, int, bytes]]" = []
        tick = 0
        status = 0
        while not body.eof:
            tick += body.varlen()
            b0 = body.u8()
            if b0 == 0xFF:  # meta
                mtype = body.u8()
                mlen = body.varlen()
                mdata = body.bytes(mlen)
                if mtype == 0x51 and mlen == 3:
                    us = (mdata[0] << 16) | (mdata[1] << 8) | mdata[2]
                    tempo_ticks.append((tick, us))
                if mtype == 0x2F:
                    break  # end of track
                continue
            if b0 in (0xF0, 0xF7):  # sysex: skip payload
                body.bytes(body.varlen())
                status = 0  # sysex cancels running status
                continue
            if b0 & 0x80:
                status = b0
                d0 = body.u8()
            else:  # running status
                if not status & 0x80:
                    raise ValueError("data byte with no running status")
                d0 = b0
            kind = status & 0xF0
            if kind in (0xC0, 0xD0):  # program change / channel pressure
                events.append((tick, status, bytes([d0])))
            else:  # two-data-byte channel messages
                events.append((tick, status, bytes([d0, body.u8()])))
        tracks.append(events)

    if not smpte:
        tempo_map = sorted(set(tempo_ticks))
        if not tempo_map or tempo_map[0][0] != 0:
            tempo_map.insert(0, (0, _DEFAULT_US_PER_QN))

        def to_secs(tick: int) -> float:
            return _tick_to_secs(tick, tempo_map, tpq)

        tempo_changes = [
            (to_secs(t), 60_000_000.0 / us) for t, us in tempo_map
        ]
    else:
        def to_secs(tick: int) -> float:
            return tick * tick_secs

        tempo_changes = []

    # pass 2: pair note on/off per track (FIFO per channel+note), track
    # program changes chronologically
    notes: "list[MidiNote]" = []
    for ti, events in enumerate(tracks):
        open_notes: "dict[tuple[int, int], list]" = {}
        program = [0] * 16
        end_tick = events[-1][0] if events else 0
        for tick, status, d in events:
            kind, ch = status & 0xF0, status & 0x0F
            if kind == 0xC0:
                program[ch] = d[0]
            elif kind == 0x90 and d[1] > 0:  # note on
                open_notes.setdefault((ch, d[0]), []).append(
                    (tick, d[1], program[ch])
                )
            elif kind == 0x80 or (kind == 0x90 and d[1] == 0):  # note off
                stack = open_notes.get((ch, d[0]))
                if stack:
                    t_on, vel, prog = stack.pop(0)
                    notes.append(MidiNote(
                        to_secs(t_on),
                        max(to_secs(tick) - to_secs(t_on), 0.0),
                        d[0], vel, ch, prog, ti,
                    ))
        for (ch, note), stack in open_notes.items():  # hanging notes
            for t_on, vel, prog in stack:
                notes.append(MidiNote(
                    to_secs(t_on),
                    max(to_secs(end_tick) - to_secs(t_on), 0.0),
                    note, vel, ch, prog, ti,
                ))
    notes.sort(key=lambda n: (n.time_secs, n.channel, n.note))
    duration = max(
        (n.time_secs + n.duration_secs for n in notes), default=0.0
    )
    return MidiSong(notes, duration, tpq, tempo_changes, fmt, ntrks)


@dataclass
class Instrument:
    """A clip played at ``rate = 2**((note-root_note)/12)``.

    ``sustain=True`` loops the clip for the note's written duration and
    stops sample-accurately at note-off (pad/organ semantics); one-shots
    (default) ring their natural length (piano/drum semantics).
    ``velocity_curve``: ``"linear"`` (amplitude ∝ vel/127), ``"square"``
    (∝ (vel/127)²), or ``None`` (ignore velocity).
    """

    clip: object  # SampleResource
    root_note: int = 60
    gain_db: float = 0.0
    pan: float = 0.0
    sustain: bool = False
    velocity_curve: Optional[str] = "linear"
    priority: int = 0

    def velocity_db(self, velocity: int) -> float:
        if self.velocity_curve is None:
            return 0.0
        a = max(int(velocity), 1) / 127.0
        if self.velocity_curve == "square":
            a *= a
        return 20.0 * math.log10(a)


class MidiSequencer:
    """Schedules a :class:`MidiSong` onto a :class:`VoicePool` with
    sample-accurate note starts.

    ::

        pool = VoicePool(g, num_voices=32,
                         clock=lambda: cx.stream.frames_rendered)
        seq = MidiSequencer(pool, parse_midi("level_theme.mid"), {
            0: Instrument(piano_c4, root_note=60),
            9: {36: Instrument(kick), 38: Instrument(snare)},
        })
        seq.start()
        while seq.update():   # call at game-frame cadence
            cx.update(); ...

    Instrument lookup per note: ``instruments[channel][note]`` (a dict
    maps a percussion channel per-key) → ``instruments[channel]`` →
    ``default``; notes with no instrument are skipped (counted in
    ``skipped_notes``).  When an instrument map value is itself keyed by
    *program* (``{(channel, program): ...}``) the note's program-at-on
    selects it.

    ``update()`` schedules every note starting within ``horizon_secs``
    of the pool clock, so any call cadence faster than the horizon is
    sample-exact; it returns False once the song (and its longest ring)
    has fully passed.  ``transpose`` is in semitones; ``speed`` scales
    musical time (1.0 = as written).
    """

    def __init__(
        self,
        pool,
        song: MidiSong,
        instruments: dict,
        *,
        default: Optional[Instrument] = None,
        sample_rate: Optional[float] = None,
        horizon_secs: float = 0.25,
        gain_db: float = 0.0,
        transpose: float = 0.0,
        speed: float = 1.0,
        clock: Optional[Callable[[], int]] = None,
    ):
        if speed <= 0.0:
            raise ValueError("speed must be positive")
        self.pool = pool
        self.song = song
        self.instruments = instruments
        self.default = default
        self.horizon_secs = float(horizon_secs)
        self.gain_db = float(gain_db)
        self.transpose = float(transpose)
        self.speed = float(speed)
        self.skipped_notes = 0
        self.dropped_notes = 0  # pool was full at trigger time
        self._clock = clock if clock is not None else pool._clock
        if self._clock is None:
            raise ValueError(
                "MidiSequencer needs a stream clock: bind the pool's "
                "clock= or pass clock= here"
            )
        sr = sample_rate
        if sr is None:
            sr = getattr(pool, "sample_rate", None)
        self._sr = float(sr) if sr else 48000.0
        self._start_sample: Optional[int] = None
        self._next = 0  # index of the first unscheduled note
        self._handles: "list[tuple[object, int]]" = []
        self._end_sample = 0

    # -- control ----------------------------------------------------------------
    def start(self, at_sample: Optional[int] = None) -> None:
        """Arm playback; note 0 lands at ``at_sample`` (default: one
        horizon ahead of the clock, so the first notes schedule with
        full look-ahead rather than clamping to the render head)."""
        if at_sample is None:
            at_sample = int(self._clock()) + int(
                self.horizon_secs * self._sr
            )
        self._start_sample = int(at_sample)
        self._next = 0
        self._end_sample = self._start_sample
        self.skipped_notes = self.dropped_notes = 0

    def stop(self) -> None:
        """Cancel unscheduled notes and stop sounding sustained ones."""
        self._next = len(self.song.notes)
        now = int(self._clock())
        for h, _ in self._handles:
            if h.alive:
                h.stop(at_sample=now)
        self._handles.clear()
        self._end_sample = min(self._end_sample, now)

    @property
    def playing(self) -> bool:
        return (
            self._start_sample is not None
            and (self._next < len(self.song.notes)
                 or int(self._clock()) < self._end_sample)
        )

    # -- per-frame pump -----------------------------------------------------------
    def _resolve(self, n: MidiNote) -> Optional[Instrument]:
        inst = self.instruments.get((n.channel, n.program))
        if inst is None:
            inst = self.instruments.get(n.channel)
        if isinstance(inst, dict):
            inst = inst.get(n.note)
        if inst is None:
            inst = self.default
        return inst

    def update(self) -> bool:
        """Schedule notes due within the horizon.  Returns True while
        the song is still playing or ringing."""
        if self._start_sample is None:
            return False
        now = int(self._clock())
        horizon = now + int(self.horizon_secs * self._sr)
        notes = self.song.notes
        while self._next < len(notes):
            n = notes[self._next]
            when = self._start_sample + int(
                round(n.time_secs / self.speed * self._sr)
            )
            if when > horizon:
                break
            self._next += 1
            inst = self._resolve(n)
            if inst is None:
                self.skipped_notes += 1
                continue
            rate = 2.0 ** (
                (n.note + self.transpose - inst.root_note) / 12.0
            )
            h = self.pool.play(
                inst.clip,
                gain_db=self.gain_db + inst.gain_db
                + inst.velocity_db(n.velocity),
                pan=inst.pan,
                rate=rate,
                loop=inst.sustain,
                priority=inst.priority,
                when=max(when, now),
            )
            if h is None:
                self.dropped_notes += 1
                continue
            dur = int(round(n.duration_secs / self.speed * self._sr))
            note_end = max(when, now) + max(dur, 1)
            if inst.sustain:
                h.stop(at_sample=note_end)
                self._end_sample = max(self._end_sample, note_end)
            else:
                clip_sr = inst.clip.sample_rate or self._sr
                ring = int(math.ceil(
                    inst.clip.len_frames * (self._sr / clip_sr) / rate
                ))
                self._end_sample = max(
                    self._end_sample, max(when, now) + ring
                )
            self._handles.append((h, note_end))
        # drop dead handles so long songs don't accumulate them
        if len(self._handles) > 4 * self.pool.num_voices:
            self._handles = [
                (h, e) for h, e in self._handles
                if e > now and h.alive
            ]
        return self.playing
