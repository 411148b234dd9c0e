"""MusicPlayer: gapless queueing, crossfades, loops over streaming decks
(music.py — the game-engine music layer built on scheduled transport
timelines + device finish events)."""

import numpy as np
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, MusicPlayer, StreamConfig
from firewheel_tpu.nodes.streaming_sampler import CallbackStreamReader

SR = 48000
F = 128


def const_reader(level, frames, channels=2):
    def read_fn(start, n):
        out = np.zeros((channels, n), np.float32)
        avail = max(0, min(frames - start, n))
        if avail > 0:
            out[:, :avail] = level
        return out

    return CallbackStreamReader(read_fn, channels, frames, SR)


def build(clock=True):
    cx = FirewheelCtx()
    holder = {}
    player = MusicPlayer(
        cx.graph_mut(),
        clock=(lambda: cx.stream.frames_rendered) if clock else None,
    )
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    holder["cx"], holder["player"], holder["sink"] = cx, player, sink
    return cx, player, sink


def test_gapless_queue_no_gap():
    cx, player, sink = build()
    a = const_reader(0.3, 2400)  # 50 ms
    b = const_reader(0.6, 4800)
    player.play(a)
    player.queue(b)
    cx.render_offline(0.15)
    cx.deactivate()
    L = sink.audio(2)[0]
    # track A's body, then track B's body
    assert abs(L[1000] - 0.3) < 1e-3
    assert abs(L[4000] - 0.6) < 1e-3
    # the join is block-aligned: B starts at the top of A's end block
    # (2400 // 128 = block 18 → sample 2304), so the signal never drops
    # out — no silent gap anywhere across the transition
    assert np.abs(L[100:4700]).min() > 0.25
    # ...and after B ends (2304 + 4800 = 7104, block-aligned), silence
    assert np.abs(L[7300:]).max() < 1e-6


def test_crossfade_constant_power():
    cx, player, sink = build()
    a = const_reader(0.5, SR)  # 1 s
    b = const_reader(0.5, SR)
    player.play(a)
    cx.render_offline(0.2)
    player.crossfade_to(b, 0.2)
    cx.render_offline(0.4)
    cx.deactivate()
    L = sink.audio(2)[0]
    # before the fade: A alone
    assert abs(L[int(0.1 * SR)] - 0.5) < 1e-3
    # mid-fade: both decks audible; equal-power sum stays in a sane band
    mid = L[int(0.3 * SR)]
    assert 0.45 < mid < 0.75, mid
    # after the fade: B alone at full level
    assert abs(L[int(0.5 * SR)] - 0.5) < 2e-3
    # the old deck is silent: level never exceeds the crossfade hump
    assert np.abs(L[int(0.45 * SR):]).max() < 0.71


def test_loop_is_gapless():
    cx, player, sink = build()
    a = const_reader(0.4, 2400)  # 50 ms loop bed
    player.play(a, loop=True)
    for _ in range(4):
        cx.render_offline(0.05)
        player.update()
    cx.render_offline(0.05)
    cx.deactivate()
    L = sink.audio(2)[0]
    # ≥4 loop iterations with no dropout at any join
    n = len(L)
    assert n >= int(0.2 * SR)
    assert np.abs(L[100 : int(0.2 * SR)]).min() > 0.35
    assert abs(L[int(0.18 * SR)] - 0.4) < 1e-2


def test_queue_depth_promotes_host_side():
    cx, player, sink = build()
    t1 = const_reader(0.2, 2400)
    t2 = const_reader(0.4, 2400)
    t3 = const_reader(0.6, 2400)
    player.play(t1)
    player.queue(t2)
    player.queue(t3)  # deeper than the device can arm — waits host-side
    for _ in range(4):
        cx.render_offline(0.05)
        player.update()
    cx.deactivate()
    L = sink.audio(2)[0]
    assert abs(L[1000] - 0.2) < 1e-3
    assert abs(L[2304 + 1000] - 0.4) < 1e-3  # t2 at t1's end block
    assert abs(L[4608 + 1000] - 0.6) < 1e-3  # t3 promoted then armed
    # no gaps across both joins
    assert np.abs(L[100 : 4608 + 2000]).min() > 0.15


def test_loop_phase_continuity_sample_exact():
    """The strongest gapless invariant: a looped 22-cycle sine whose
    length (2400) is NOT a block multiple must render as a CONTINUOUS
    sine — any block rounding at the joins would break phase.  (Also
    verified on the real chip: max error 2.7e-14.)"""
    cx, player, sink = build()
    LEN = 2400

    def read_fn(start, n):
        t = (np.arange(start, start + n) % LEN) / SR
        out = np.sin(2 * np.pi * 440.0 * t).astype(np.float32) * 0.5
        out[np.arange(start, start + n) >= LEN] = 0.0
        return np.stack([out, out])

    player.play(CallbackStreamReader(read_fn, 2, LEN, SR), loop=True)
    for _ in range(4):
        cx.render_offline(0.05)
        player.update()
    cx.render_offline(0.05)
    cx.deactivate()
    L = sink.audio(2)[0]
    n = 4 * LEN
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * np.arange(n) / SR)
    assert np.abs(L[:n] - ref.astype(np.float32)).max() < 1e-5


def test_poll_reports_finished_track():
    cx, player, sink = build()
    a = const_reader(0.3, 2400)
    player.play(a)
    cx.render_offline(0.1)
    done = player.poll(cx.poll_events())
    cx.deactivate()
    assert ("finished", a) in done


def test_stop_with_fade_silences():
    cx, player, sink = build()
    a = const_reader(0.5, SR)
    player.play(a)
    cx.render_offline(0.1)
    player.stop(fade_secs=0.05)
    cx.render_offline(0.15)
    cx.deactivate()
    L = sink.audio(2)[0]
    assert abs(L[int(0.05 * SR)] - 0.5) < 1e-3
    # well after the fade: silence (smoother tail decays below -80 dB)
    assert np.abs(L[int(0.22 * SR):]).max() < 1e-4
    assert player.current_reader() is None


def test_quantized_crossfade_lands_on_bar():
    """crossfade_to(quantize="bar") snaps the incoming track's start to
    the next bar boundary of the set_tempo grid — sample-exact."""
    cx, player, sink = build()
    a = const_reader(0.5, SR)
    b = const_reader(0.25, SR)
    player.play(a)
    # 120 bpm, 4/4: bar = 2.0 s of beats... at 48k: beat 24000, bar 96000
    player.set_tempo(120.0, beats_per_bar=4, origin_sample=0)
    cx.render_offline(0.3)
    player.crossfade_to(b, 0.05, quantize="beat")  # next beat: 24000
    # before the boundary the OLD deck stays current (transport calls act
    # on what the player hears); update() flips once the beat passes
    assert player.decks[player._current].reader is a
    cx.render_offline(0.4)
    player.update()  # clock is bound: flips current to the armed deck
    cx.deactivate()
    assert player.decks[player._current].start_sample == 24000
    assert player.current_reader() is b
    L = sink.audio(2)[0]
    # before the beat: only a; after beat + fade: b level plus a's tail
    assert abs(L[20000] - 0.5) < 1e-3
    assert abs(np.median(np.abs(L[30000:32000])) - 0.25) < 0.02


def test_quantize_requires_tempo():
    cx, player, sink = build()
    player.play(const_reader(0.5, SR))
    with pytest.raises(ValueError, match="set_tempo"):
        player.crossfade_to(const_reader(0.25, SR), 0.1, quantize="bar")
    cx.deactivate()


def test_stinger_fires_on_the_bar_over_music():
    """stinger(): a one-shot overlay lands on the quantized grid point
    ON TOP of the playing bed."""
    from firewheel_tpu.core.sample_resource import SampleResource

    cx, player, sink = build()
    player.play(const_reader(0.3, SR))
    player.set_tempo(150.0, beats_per_bar=2, origin_sample=0)  # bar 38400
    clip = SampleResource(np.full((2, 512), 0.4, np.float32), sample_rate=SR)
    cx.render_offline(0.2)
    at = player.stinger(clip, quantize="bar")
    assert at == 38400
    cx.render_offline(0.8)
    cx.deactivate()
    L = sink.audio(2)[0]
    # before the bar: bed alone; on the bar: bed + stinger; after: bed
    assert abs(L[at - 1000] - 0.3) < 1e-3
    assert abs(L[at + 100] - 0.7) < 1e-2
    assert abs(L[at + 1000] - 0.3) < 1e-2


def test_stop_fades_audible_deck_during_quantized_transition():
    """Regression: stop(fade) issued while a quantized crossfade is armed
    but before its boundary must FADE the audibly-playing old track, not
    hard-cut it (the armed deck is not current until it starts)."""
    cx, player, sink = build()
    a = const_reader(0.5, SR)
    b = const_reader(0.25, SR)
    player.play(a)
    player.set_tempo(30.0, beats_per_bar=4, origin_sample=0)  # beat 96000
    cx.render_offline(0.1)
    player.crossfade_to(b, 0.5, quantize="beat")  # armed for t=96000
    t_stop = cx.stream.frames_rendered
    player.stop(fade_secs=0.2)  # well before the beat boundary
    cx.render_offline(0.4)
    cx.deactivate()
    L = sink.audio(2)[0]
    # mid-fade: still audible (the old code dropped 0.5 -> 0 in one block)
    mid = np.abs(L[t_stop + int(0.08 * SR): t_stop + int(0.12 * SR)])
    assert mid.max() > 0.05
    # after the fade (and before the cancelled boundary): silence
    assert np.abs(L[t_stop + int(0.3 * SR):]).max() < 1e-3
    # the armed transition was cancelled — nothing starts at the beat
    assert player.current_reader() is None


def test_stop_twice_hard_cuts_the_fade():
    """Regression: a second stop() during a stop-fade must actually
    silence the fading deck (cancelling the fade also cancels its pause —
    without a replacement pause the deck sounded forever)."""
    cx, player, sink = build()
    player.play(const_reader(0.5, SR * 2))
    cx.render_offline(0.1)
    player.stop(fade_secs=0.5)
    cx.render_offline(0.05)
    t_cut = cx.stream.frames_rendered
    player.stop()  # hard stop mid-fade
    cx.render_offline(0.2)
    cx.deactivate()
    L = sink.audio(2)[0]
    assert np.abs(L[t_cut - 1500] ).max() > 0.05  # fade was audible
    # shortly after the hard stop (smoother tail < 10 ms): silence
    assert np.abs(L[t_cut + int(0.05 * SR):]).max() < 1e-3


def test_stinger_retrigger_waits_for_active_overlay():
    """Regression: a quantized stinger staged while the previous overlay
    is still sounding must let it play out, then fire on its boundary."""
    from firewheel_tpu.core.sample_resource import SampleResource

    cx, player, sink = build()
    player.play(const_reader(0.3, SR * 2))
    player.set_tempo(75.0, beats_per_bar=1, origin_sample=0)  # bar 38400
    clip_a = SampleResource(np.full((2, 9600), 0.4, np.float32), sample_rate=SR)
    clip_b = SampleResource(np.full((2, 4800), 0.5, np.float32), sample_rate=SR)
    cx.render_offline(0.1)
    at_a = player.stinger(clip_a)          # fires now, ends ~ at_a + 9600
    cx.render_offline(0.02)
    at_b = player.stinger(clip_b, quantize="bar")
    assert at_b == 38400
    # pump host updates while rendering (game-frame cadence)
    for _ in range(16):
        cx.render_offline(0.05)
        player.update()
    cx.deactivate()
    L = sink.audio(2)[0]
    # overlay A keeps sounding after B was staged (old code silenced it)
    assert abs(L[at_a + 8000] - 0.7) < 2e-2
    # between A's end and the bar: bed alone
    assert abs(L[30000] - 0.3) < 2e-2
    # B fires on the bar
    assert abs(L[at_b + 2000] - 0.8) < 2e-2


def test_stinger_second_lane_overlaps_sample_accurately():
    """Two stinger lanes (round 4): a retrigger while the first overlay
    still sounds fires on the FREE lane immediately — both overlays sound
    at once with no host-cadence wait.  A THIRD stinger while both lanes
    sound stages host-side and fires on its grid boundary once a lane
    frees (the two-lane trade-off)."""
    from firewheel_tpu.core.sample_resource import SampleResource

    cx, player, sink = build()
    player.play(const_reader(0.1, SR * 2))
    player.set_tempo(75.0, beats_per_bar=1, origin_sample=0)  # bar 38400
    clip_a = SampleResource(
        np.full((2, 19200), 0.2, np.float32), sample_rate=SR)
    clip_b = SampleResource(
        np.full((2, 24000), 0.3, np.float32), sample_rate=SR)
    clip_c = SampleResource(
        np.full((2, 4800), 0.25, np.float32), sample_rate=SR)
    cx.render_offline(0.1)
    at_a = player.stinger(clip_a)  # lane 0; ends at_a + 19200
    cx.render_offline(0.05)
    at_b = player.stinger(clip_b)  # lane 1 is free: fires NOW, no staging
    assert at_b > at_a
    assert player._pending_stinger is None  # not staged — second lane
    cx.render_offline(0.05)
    at_c = player.stinger(clip_c, quantize="bar")  # both busy: staged
    assert at_c == 38400
    assert player._pending_stinger is not None
    for _ in range(16):
        cx.render_offline(0.06)
        player.update()
    cx.deactivate()
    L = sink.audio(2)[0]
    # A and B overlap: bed + A + B right after at_b
    assert abs(L[at_b + 500] - 0.6) < 2e-2
    # A ended, B still sounding
    assert abs(L[at_a + 19200 + 1000] - 0.4) < 2e-2
    # between B's end and the bar: bed alone
    assert abs(L[at_b + 24000 + 1000] - 0.1) < 2e-2
    # C fires exactly on the bar (sample-accurate despite staging)
    assert abs(L[at_c - 8] - 0.1) < 2e-2
    assert abs(L[at_c + 8] - 0.35) < 2e-2


def test_stinger_accepts_pathlike(tmp_path):
    """stinger(Path(...)) decodes like stinger('x.wav') — the path
    convenience is PathLike-consistent with play/queue/crossfade_to."""
    import pathlib

    from firewheel_tpu.utils.wav import write_wav

    cx, player, sink = build()
    p = tmp_path / "hit.wav"
    write_wav(str(p), np.full((2, 512), 0.4, np.float32), SR)
    player.play(const_reader(0.3, SR))
    cx.render_offline(0.1)
    at = player.stinger(pathlib.Path(p))
    cx.render_offline(0.2)
    cx.deactivate()
    L = sink.audio(2)[0]
    assert abs(L[at + 100] - 0.7) < 1e-2
