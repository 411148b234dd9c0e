"""SMF parsing + MidiSequencer scheduling (utils/midi.py).

The parser is pinned against hand-assembled SMF bytes (the spec's own
examples for varlen/running-status); the sequencer against a recording
fake pool, and end-to-end through a real VoicePool render.
"""

import math

import numpy as np
import pytest

from firewheel_tpu import (
    ArraySink,
    AudioGraphConfig,
    FirewheelCtx,
    StreamConfig,
)
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.utils.midi import (
    Instrument,
    MidiNote,
    MidiSequencer,
    MidiSong,
    parse_midi,
)
from firewheel_tpu.voice_pool import VoicePool

SR, F = 48000, 128


# -- SMF builder (test-side, independent of the parser) ---------------------

def varlen(v):
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


def track(events):
    """events: list of (delta, bytes) pairs; EOT appended."""
    body = b"".join(varlen(d) + e for d, e in events)
    body += varlen(0) + bytes([0xFF, 0x2F, 0x00])
    return b"MTrk" + len(body).to_bytes(4, "big") + body


def smf(tracks, fmt=1, division=480):
    head = b"MThd" + (6).to_bytes(4, "big") + fmt.to_bytes(2, "big") \
        + len(tracks).to_bytes(2, "big") + division.to_bytes(2, "big")
    return head + b"".join(tracks)


def tempo_meta(us_per_qn):
    return bytes([0xFF, 0x51, 0x03]) + us_per_qn.to_bytes(3, "big")


def on(ch, note, vel):
    return bytes([0x90 | ch, note, vel])


def off(ch, note):
    return bytes([0x80 | ch, note, 0])


# -- parser -------------------------------------------------------------------

def test_notes_and_tempo_map():
    """120 bpm default, tempo doubles at beat 2: a note per beat lands at
    0.0, 0.5, 1.0 (beat 2 = 2 qn at 120), then beat 3 only 0.25 s later."""
    tempo_track = track([(2 * 480, tempo_meta(250_000))])  # 240 bpm at qn 2
    note_track = track([
        (0, on(0, 60, 100)), (240, off(0, 60)),
        (240, on(0, 62, 100)), (240, off(0, 62)),
        (240, on(0, 64, 100)), (240, off(0, 64)),
        (240, on(0, 65, 100)), (240, off(0, 65)),
    ])
    song = parse_midi(smf([tempo_track, note_track]))
    assert song.format == 1 and song.num_tracks == 2
    times = [n.time_secs for n in song.notes]
    np.testing.assert_allclose(times, [0.0, 0.5, 1.0, 1.25], atol=1e-9)
    # durations: half a beat each, at the tempo in force
    durs = [n.duration_secs for n in song.notes]
    np.testing.assert_allclose(durs, [0.25, 0.25, 0.125, 0.125], atol=1e-9)
    assert song.tempo_changes[0][1] == pytest.approx(120.0)
    assert song.tempo_changes[-1][1] == pytest.approx(240.0)
    assert song.duration_secs == pytest.approx(1.375)


def test_running_status_and_vel0_noteoff():
    """Running status (status omitted on repeat) and 0x90 vel=0 as
    note-off — both mandatory SMF idioms."""
    body = [
        (0, on(3, 60, 90)),
        (120, bytes([62, 80])),      # running status: note-on ch3
        (120, bytes([60, 0])),       # running status: vel-0 = off
        (120, bytes([62, 0])),
    ]
    song = parse_midi(smf([track(body)], fmt=0, division=240))
    assert len(song.notes) == 2
    a, b = song.notes
    assert (a.note, a.channel, a.velocity) == (60, 3, 90)
    assert a.duration_secs == pytest.approx(0.5)  # 240 ticks @ 240 tpq
    assert b.time_secs == pytest.approx(0.25)


def test_program_change_tagging_and_hanging_note():
    body = [
        (0, bytes([0xC0 | 2, 42])),   # program 42 on channel 2
        (0, on(2, 70, 64)),           # never released
        (480, on(2, 71, 64)), (480, off(2, 71)),
    ]
    song = parse_midi(smf([track(body)], fmt=0))
    hang = [n for n in song.notes if n.note == 70][0]
    assert hang.program == 42
    # hanging note closes at end-of-track tick
    assert hang.duration_secs == pytest.approx(1.0)


def test_smpte_division():
    # 25 fps, 40 ticks/frame → 1 ms ticks, tempo metas ignored
    division = ((256 - 25) << 8) | 40
    body = [(0, on(0, 60, 100)), (500, off(0, 60))]
    song = parse_midi(smf([track(body)], fmt=0, division=division))
    assert song.ticks_per_quarter is None
    assert song.notes[0].duration_secs == pytest.approx(0.5)


def test_malformed_rejected():
    with pytest.raises(ValueError, match="MThd"):
        parse_midi(b"RIFFxxxx")
    with pytest.raises(ValueError, match="truncated"):
        parse_midi(smf([track([(0, on(0, 60, 1))])])[:-4])


# -- sequencer ----------------------------------------------------------------

class FakePool:
    """Records play() calls; hands out live handle stubs."""

    num_voices = 8
    sample_rate = SR

    def __init__(self):
        self.calls = []
        self.stops = []
        self._clock = None

    def play(self, clip, **kw):
        self.calls.append((clip, kw))

        class H:
            @property
            def alive(self_h):
                return True

            def stop(self_h, at_sample=None):
                self.stops.append(at_sample)

        return H()


def two_note_song():
    return MidiSong(
        notes=[
            MidiNote(0.0, 0.5, 72, 127, 0, 0, 0),
            MidiNote(1.0, 0.5, 48, 64, 0, 0, 0),
        ],
        duration_secs=1.5, ticks_per_quarter=480,
        tempo_changes=[(0.0, 120.0)], format=0, num_tracks=1,
    )


def test_sequencer_schedules_sample_accurately_within_horizon():
    pool = FakePool()
    clip = SampleResource(np.ones((1, 64), np.float32), sample_rate=SR)
    t = [0]
    seq = MidiSequencer(
        pool, two_note_song(), {0: Instrument(clip, root_note=60)},
        clock=lambda: t[0], horizon_secs=0.25,
    )
    seq.start(at_sample=1000)
    assert seq.update() is True
    # only the t=0 note is inside the 0.25 s horizon
    assert len(pool.calls) == 1
    _, kw = pool.calls[0]
    assert kw["when"] == 1000
    assert kw["rate"] == pytest.approx(2.0)       # note 72, root 60
    assert kw["gain_db"] == pytest.approx(0.0)    # vel 127 → 0 dB
    t[0] = int(0.9 * SR)
    seq.update()
    assert len(pool.calls) == 2
    _, kw = pool.calls[1]
    assert kw["when"] == 1000 + SR                # t=1.0 s exactly
    assert kw["rate"] == pytest.approx(0.5)       # note 48
    assert kw["gain_db"] == pytest.approx(20 * math.log10(64 / 127))
    # still ringing → playing; after the ring passes → done
    assert seq.update() is True
    t[0] = 1000 + SR + 2 * SR
    assert seq.update() is False


def test_sustain_schedules_noteoff_stop():
    pool = FakePool()
    clip = SampleResource(np.ones((1, 64), np.float32), sample_rate=SR)
    t = [0]
    seq = MidiSequencer(
        pool, two_note_song(),
        {0: Instrument(clip, sustain=True)},
        clock=lambda: t[0], horizon_secs=5.0,
    )
    seq.start(at_sample=0)
    seq.update()
    assert len(pool.calls) == 2
    assert all(kw["loop"] for _, kw in pool.calls)
    assert pool.stops == [int(0.5 * SR), int(1.5 * SR)]


def test_drum_map_and_skip_counting():
    pool = FakePool()
    kick = SampleResource(np.ones((1, 8), np.float32), sample_rate=SR)
    song = MidiSong(
        notes=[
            MidiNote(0.0, 0.1, 36, 100, 9, 0, 0),   # mapped
            MidiNote(0.1, 0.1, 38, 100, 9, 0, 0),   # unmapped drum
            MidiNote(0.2, 0.1, 60, 100, 5, 0, 0),   # unmapped channel
        ],
        duration_secs=0.3, ticks_per_quarter=480,
        tempo_changes=[], format=0, num_tracks=1,
    )
    seq = MidiSequencer(
        pool, song, {9: {36: Instrument(kick, root_note=36)}},
        clock=lambda: 0, horizon_secs=10.0,
    )
    seq.start(at_sample=0)
    seq.update()
    assert len(pool.calls) == 1
    assert pool.calls[0][1]["rate"] == pytest.approx(1.0)
    assert seq.skipped_notes == 2


def test_speed_and_transpose():
    pool = FakePool()
    clip = SampleResource(np.ones((1, 8), np.float32), sample_rate=SR)
    seq = MidiSequencer(
        pool, two_note_song(), {0: Instrument(clip, root_note=60)},
        clock=lambda: 0, horizon_secs=10.0, speed=2.0, transpose=-12.0,
    )
    seq.start(at_sample=0)
    seq.update()
    assert pool.calls[1][1]["when"] == SR // 2    # 1.0 s at 2x speed
    assert pool.calls[0][1]["rate"] == pytest.approx(1.0)  # 72 - 12 st


def test_requires_a_clock():
    pool = FakePool()
    with pytest.raises(ValueError, match="clock"):
        MidiSequencer(pool, two_note_song(), {})


# -- end to end ---------------------------------------------------------------

def test_end_to_end_render():
    """A two-note SMF renders through a real VoicePool: each note's tone
    appears at its scheduled sample at the right frequency."""
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    pool = VoicePool(cx.graph, num_voices=4, max_clip_frames=4096,
                     declick_secs=0.0)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False),
        sink=sink,
    )

    n = 4096
    tt = np.arange(n) / SR
    c4 = SampleResource(
        (0.5 * np.sin(2 * np.pi * 261.63 * tt))
        .astype(np.float32)[None, :],
        sample_rate=SR,
    )
    data = smf([track([
        (0, on(0, 60, 127)), (480, off(0, 60)),       # C4 at 0.0
        (480, on(0, 72, 127)), (480, off(0, 72)),     # C5 at 1.0 s
    ])])
    song = parse_midi(data)
    seq = MidiSequencer(
        pool, song, {0: Instrument(c4, root_note=60)},
        clock=lambda: cx.stream.frames_rendered, horizon_secs=10.0,
    )
    start = 2 * F
    seq.start(at_sample=start)
    assert seq.update() is True   # whole song inside the horizon
    cx.render_offline(1.6)
    cx.deactivate()

    L = sink.audio(2)[0]
    assert np.abs(L[:start]).max() == 0.0

    def peak(x):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        return np.fft.rfftfreq(len(x), 1 / SR)[int(np.argmax(spec))]

    assert peak(L[start : start + 4096]) == pytest.approx(261.63, abs=15)
    second = start + SR
    assert peak(L[second : second + 2048]) == pytest.approx(
        523.25, abs=30
    )


# -- pitch bend + CC7/CC11 (round-4 verdict #7) --------------------------------

def bend(ch, value14):
    """Pitch bend, value14 in 0..16383 (8192 = center)."""
    return bytes([0xE0 | ch, value14 & 0x7F, (value14 >> 7) & 0x7F])


def cc(ch, num, val):
    return bytes([0xB0 | ch, num, val])


def test_parse_pitch_bend_default_and_rpn_range():
    body = [
        (0, bend(0, 8192 + 4096)),        # +0.5 of the default ±2 range
        (480, cc(0, 101, 0)), (0, cc(0, 100, 0)), (0, cc(0, 6, 12)),
        (0, bend(0, 8192 + 4096)),        # same wheel, now ±12 → +6 st
        (480, bend(1, 0)),                # full down on ch1, default ±2
        (0, on(0, 60, 100)), (480, off(0, 60)),
    ]
    song = parse_midi(smf([track(body)], fmt=0))
    assert len(song.bend_changes) == 3
    t0, ch0, s0 = song.bend_changes[0]
    assert (t0, ch0) == (0.0, 0) and s0 == pytest.approx(1.0)
    t1, ch1, s1 = song.bend_changes[1]
    assert (t1, ch1) == (pytest.approx(0.5), 0)
    assert s1 == pytest.approx(6.0)
    t2, ch2, s2 = song.bend_changes[2]
    assert ch2 == 1 and s2 == pytest.approx(-2.0)


def test_parse_cc_volume_and_expression():
    body = [
        (0, cc(2, 7, 100)),
        (480, cc(2, 11, 64)),
        (0, cc(2, 1, 33)),                # mod wheel: parsed past
        (0, on(2, 60, 100)), (480, off(2, 60)),
    ]
    song = parse_midi(smf([track(body)], fmt=0))
    assert song.cc_changes == [
        (0.0, 2, 7, 100), (pytest.approx(0.5), 2, 11, 64)
    ]


class LiveFakePool:
    """FakePool whose handles record live set_rate/set_gain_db calls."""

    num_voices = 8
    sample_rate = SR

    def __init__(self):
        self.calls = []
        self.live = []  # (handle_index, "rate"|"gain", value)
        self._clock = None

    def play(self, clip, **kw):
        idx = len(self.calls)
        self.calls.append((clip, kw))
        rec = self.live

        class H:
            alive = True

            def stop(self_h, at_sample=None):
                pass

            def set_rate(self_h, rate):
                rec.append((idx, "rate", rate))

            def set_gain_db(self_h, db):
                rec.append((idx, "gain", db))

        return H()


def _song_with_ctrl(notes, bends=(), ccs=()):
    return MidiSong(
        notes=list(notes), duration_secs=2.0, ticks_per_quarter=480,
        tempo_changes=[(0.0, 120.0)], format=0, num_tracks=1,
        bend_changes=list(bends), cc_changes=list(ccs),
    )


def test_bend_and_cc_apply_at_note_on():
    pool = LiveFakePool()
    clip = SampleResource(np.ones((1, 64), np.float32), sample_rate=SR)
    song = _song_with_ctrl(
        [MidiNote(0.5, 0.25, 72, 127, 0, 0, 0)],
        bends=[(0.25, 0, 2.0)],           # +2 st before the note
        ccs=[(0.0, 0, 7, 64)],            # channel volume 64
    )
    seq = MidiSequencer(
        pool, song, {0: Instrument(clip, root_note=60)},
        clock=lambda: 0, horizon_secs=10.0,
    )
    seq.start(at_sample=0)
    seq.update()
    _, kw = pool.calls[0]
    assert kw["rate"] == pytest.approx(2.0 ** (14.0 / 12.0))
    assert kw["gain_db"] == pytest.approx(40 * math.log10(64 / 127))


def test_live_bend_updates_sounding_notes():
    """A bend event DURING a sounding note re-rates it at update()
    cadence; an unaffected channel's voice is untouched."""
    pool = LiveFakePool()
    clip = SampleResource(np.ones((1, 64), np.float32), sample_rate=SR)
    song = _song_with_ctrl(
        [MidiNote(0.0, 1.5, 60, 127, 0, 0, 0),
         MidiNote(0.0, 1.5, 60, 127, 3, 0, 0)],
        bends=[(0.5, 0, 1.0)],            # ch0 bends +1 st at 0.5 s
        ccs=[(0.75, 0, 11, 64)],          # then expression drops
    )
    t = [0]
    seq = MidiSequencer(
        pool, song,
        {0: Instrument(clip, sustain=True),
         3: Instrument(clip, sustain=True)},
        clock=lambda: t[0], horizon_secs=0.2,
    )
    seq.start(at_sample=0)
    seq.update()
    assert len(pool.calls) == 2 and pool.live == []
    t[0] = int(0.5 * SR)                  # bend now in force
    seq.update()
    assert ("rate" in [x[1] for x in pool.live])
    rates = [(i, v) for i, k, v in pool.live if k == "rate"]
    assert rates[0][0] == 0               # only the ch0 voice (call 0)
    assert rates[0][1] == pytest.approx(2.0 ** (1.0 / 12.0))
    assert all(i == 0 for i, _ in rates)
    n_live = len(pool.live)
    seq.update()                          # unchanged controls: no spam
    assert len(pool.live) == n_live
    t[0] = int(0.75 * SR)                 # expression change
    seq.update()
    gains = [(i, v) for i, k, v in pool.live[n_live:] if k == "gain"]
    assert gains and gains[0][1] == pytest.approx(40 * math.log10(64 / 127))


def test_end_to_end_bent_note_lands_on_frequency():
    """GOLDEN (round-4 verdict #7): a note played under a +6 st bend
    (RPN range 12) must sound at root · 2^(6/12)."""
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    pool = VoicePool(cx.graph, num_voices=4, max_clip_frames=8192,
                     declick_secs=0.0)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False),
        sink=sink,
    )
    n = 8192
    tt = np.arange(n) / SR
    c4 = SampleResource(
        (0.5 * np.sin(2 * np.pi * 261.63 * tt))
        .astype(np.float32)[None, :],
        sample_rate=SR,
    )
    data = smf([track([
        (0, cc(0, 101, 0)), (0, cc(0, 100, 0)), (0, cc(0, 6, 12)),
        (0, bend(0, 8192 + 4096)),                 # +6 st
        (0, on(0, 60, 127)), (480, off(0, 60)),
    ])])
    song = parse_midi(data)
    assert song.bend_changes[-1][2] == pytest.approx(6.0)
    seq = MidiSequencer(
        pool, song, {0: Instrument(c4, root_note=60)},
        clock=lambda: cx.stream.frames_rendered, horizon_secs=10.0,
    )
    start = 2 * F
    seq.start(at_sample=start)
    assert seq.update() is True
    cx.render_offline(0.5)
    cx.deactivate()
    L = sink.audio(2)[0]

    seg = L[start : start + 4096]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1 / SR)[int(np.argmax(spec))]
    assert f == pytest.approx(261.63 * 2 ** 0.5, abs=15)
