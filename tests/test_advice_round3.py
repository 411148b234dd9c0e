"""Regression tests for the round-3 advisor findings (ADVICE.md):
inactive-context latency queries, 'current = audible deck' coherence for
transitions armed from the stopped state, and stop() dropping staged
stingers."""

import numpy as np
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, MusicPlayer, StreamConfig
from firewheel_tpu.nodes.streaming_sampler import CallbackStreamReader

SR = 48000


def const_reader(level, frames, channels=2):
    def read_fn(start, n):
        out = np.zeros((channels, n), np.float32)
        avail = max(0, min(frames - start, n))
        if avail > 0:
            out[:, :avail] = level
        return out

    return CallbackStreamReader(read_fn, channels, frames, SR)


def build():
    cx = FirewheelCtx()
    player = MusicPlayer(
        cx.graph_mut(), clock=lambda: cx.stream.frames_rendered
    )
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    return cx, player, sink


class TestInactiveLatencyQuery:
    """ADVICE #1: output_latency_frames must work pre-activation when the
    caller supplies the rate it plans to use, and the error must say so."""

    def test_inactive_with_rate(self):
        cx = FirewheelCtx()
        assert cx.output_latency_frames(sample_rate=SR) == 0

    def test_inactive_without_rate_raises(self):
        cx = FirewheelCtx()
        with pytest.raises(RuntimeError, match="sample_rate"):
            cx.output_latency_frames()

    def test_active_uses_stream_rate(self):
        cx = FirewheelCtx()
        cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=ArraySink())
        try:
            # sample_rate is ignored when active — same answer either way
            assert cx.output_latency_frames() == cx.output_latency_frames(
                sample_rate=8000
            )
        finally:
            cx.deactivate()


class TestArmedFromStoppedIsNotCurrent:
    """ADVICE #2: a quantized crossfade_to from the stopped state arms a
    deck for a FUTURE boundary; 'current = audible deck' means
    current_reader() stays None until the boundary, and the supersede
    paths (play/crossfade over a not-yet-started armed deck) are live."""

    def test_current_flips_at_the_boundary(self):
        cx, player, sink = build()
        player.set_tempo(60.0, beats_per_bar=1, origin_sample=0)  # 48000
        b = const_reader(0.4, SR)
        cx.render_offline(0.1)
        player.crossfade_to(b, 0.05, quantize="bar")  # armed for t=48000
        assert player.current_reader() is None  # not audible yet
        cx.render_offline(1.2)
        player.update()
        assert player.current_reader() is b
        cx.deactivate()
        L = sink.audio(2)[0]
        assert np.abs(L[:47000]).max() < 1e-6  # silent until the bar
        assert abs(L[int(1.2 * SR)] - 0.4) < 2e-3

    def test_play_supersedes_the_armed_deck(self):
        cx, player, sink = build()
        player.set_tempo(60.0, beats_per_bar=1, origin_sample=0)
        armed = const_reader(0.5, SR)
        cx.render_offline(0.1)
        player.crossfade_to(armed, 0.05, quantize="bar")  # t=48000
        player.play(const_reader(0.2, SR // 2))  # supersedes, starts now
        cx.render_offline(1.3)
        cx.deactivate()
        L = sink.audio(2)[0]
        t0 = int(0.15 * SR)
        assert abs(L[t0] - 0.2) < 1e-3
        # the armed 0.5 track never sounds — in particular not at its
        # cancelled bar boundary
        assert L.max() < 0.25

    def test_queue_from_armed_stopped_state_waits_its_turn(self):
        cx, player, sink = build()
        player.set_tempo(60.0, beats_per_bar=1, origin_sample=0)
        first = const_reader(0.3, SR // 2)   # 0.5 s from t=48000
        second = const_reader(0.6, SR // 2)
        cx.render_offline(0.1)
        player.crossfade_to(first, 0.01, quantize="bar")  # armed t=48000
        player.queue(second)  # must FOLLOW first, not replace it
        for _ in range(24):  # pump host updates at game-frame cadence
            cx.render_offline(0.1)
            player.update()
        cx.deactivate()
        L = sink.audio(2)[0]
        assert abs(L[int(1.3 * SR)] - 0.3) < 1e-3   # first's body
        assert abs(L[int(1.8 * SR)] - 0.6) < 1e-3   # second follows


def test_stop_drops_staged_stinger_but_not_the_sounding_one():
    """ADVICE #3: stop() clears a host-staged (quantized) stinger so it
    cannot fire over silence; the already-sounding overlay plays out."""
    from firewheel_tpu.core.sample_resource import SampleResource

    cx, player, sink = build()
    player.play(const_reader(0.1, SR * 2))
    player.set_tempo(75.0, beats_per_bar=1, origin_sample=0)  # bar 38400
    clip_a = SampleResource(np.full((2, 9600), 0.3, np.float32),
                            sample_rate=SR)
    clip_b = SampleResource(np.full((2, 4800), 0.5, np.float32),
                            sample_rate=SR)
    cx.render_offline(0.1)
    at_a = player.stinger(clip_a)               # sounding now
    cx.render_offline(0.02)
    at_b = player.stinger(clip_b, quantize="bar")  # staged for 38400
    assert at_b == 38400
    player.stop()  # hard-stop the bed; the staged stinger must die too
    for _ in range(16):
        cx.render_offline(0.05)
    cx.deactivate()
    L = sink.audio(2)[0]
    # the sounding overlay finished its clip
    assert abs(L[at_a + 5000] - 0.3) < 2e-2
    # nothing fires at the staged boundary — silence after overlay A ends
    assert np.abs(L[at_a + 9600 + 256:]).max() < 1e-6
