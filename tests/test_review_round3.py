"""Regression tests for the round-3 review findings (events/music/
transport surface)."""

import numpy as np
import pytest

from firewheel_tpu import (
    ArraySink, AudioGraphConfig, FirewheelCtx, MusicPlayer, SampleResource,
    StreamConfig, VoicePool,
)
from firewheel_tpu.nodes.streaming_sampler import CallbackStreamReader

SR, F = 48000, 128


def const_reader(level, frames, channels=2):
    def read_fn(start, n):
        out = np.zeros((channels, n), np.float32)
        avail = max(0, min(frames - start, n))
        if avail > 0:
            out[:, :avail] = level
        return out

    return CallbackStreamReader(read_fn, channels, frames, SR)


def test_pack_state_does_not_advance_prefetch_clock():
    """Finding 1: ScheduleProgram.pack_state must be side-effect-free —
    a deferred live edit (which packs state) while music streams must
    not push the prefetch shadow clock ahead of the device playhead."""
    import firewheel_tpu as fw
    from firewheel_tpu.nodes.streaming_sampler import StreamingSamplerNode

    g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
    s = StreamingSamplerNode()
    s.set_reader(const_reader(0.5, SR))
    sid = g.add_node(0, 2, s)
    g.connect(sid, 0, g.graph_out_node(), 0)
    g.connect(sid, 1, g.graph_out_node(), 1)
    s.play()
    pkg = g.compile(SR, F)
    prog = fw.ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    state = prog.init_state()
    proc = next(p for p in prog._procs.values()
                if isinstance(p, type(s.activate(SR, F, 0, 2))))
    est0 = proc._est_playhead
    for _ in range(5):
        prog.pack_state(state)
    assert proc._est_playhead == est0


def test_stale_handle_stop_does_not_fire_into_new_shot():
    """Finding 2: a handle's far-future scheduled stop must not survive a
    voice re-target and silence the NEW sound."""
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    pool = VoicePool(cx.graph, num_voices=1, max_clip_frames=512,
                     declick_secs=0.0)
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=F), sink=sink)
    clip = SampleResource(np.full((1, 256), 0.5, np.float32), sample_rate=SR)
    h1 = pool.play(clip, when=0, now=0)
    # schedule a stop far in the future, then let the shot finish
    h1.stop(at_sample=6 * F)
    # voice is free by then; fire a NEW shot before the stale stop time
    h2 = pool.play(clip, when=4 * F, now=4 * F)
    assert h2 is not None
    cx.render_offline(10 * F / SR)
    cx.deactivate()
    L = sink.audio(2)[0]
    # the new shot must play its FULL 256 samples — the stale stop at
    # 6*F (= 768, i.e. 256 samples into the new shot... past it) and any
    # other leftover command must not cut or restart it
    body = L[4 * F : 4 * F + 256]
    assert np.abs(body).min() > 0.3, "new shot was cut by a stale command"


def test_queue_defers_while_crossfade_tail_audible():
    """Finding 3: queue() during a crossfade must not hard-cut the
    outgoing fade — it defers host-side until the deck is idle."""
    cx = FirewheelCtx()
    player = MusicPlayer(cx.graph_mut(),
                         clock=lambda: cx.stream.frames_rendered)
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    a = const_reader(0.5, SR)
    b = const_reader(0.5, SR)
    c = const_reader(0.25, SR)
    player.play(a)
    cx.render_offline(0.1)
    player.crossfade_to(b, 0.3)  # outgoing fade runs 0.3 s
    player.queue(c)  # must NOT cut a's fade
    assert len(player._pending) == 1  # deferred host-side
    cx.render_offline(0.2)
    cx.deactivate()
    L = sink.audio(2)[0]
    # mid-fade (0.15 s into it): a's tail must still be audible, summed
    # with b's ramp-in — if queue() had cut it, only b's partial ramp
    # would sound; with both, level stays near full
    mid = np.abs(L[int(0.25 * SR) : int(0.27 * SR)]).mean()
    assert mid > 0.4, mid


def test_streaming_restore_resumes_audio(tmp_path):
    """Finding 4: restoring a checkpoint taken mid-track must keep the
    prefetch window in lockstep with the restored playhead — the resumed
    deck renders audio, not silence."""
    from firewheel_tpu.nodes.streaming_sampler import StreamingSamplerNode

    ckpt = str(tmp_path / "ck")

    def build():
        cx = FirewheelCtx()
        g = cx.graph_mut()
        s = StreamingSamplerNode()
        s.set_reader(const_reader(0.5, SR))  # 1 s of 0.5
        sid = g.add_node(0, 2, s)
        g.connect(sid, 0, g.graph_out_node(), 0)
        g.connect(sid, 1, g.graph_out_node(), 1)
        return cx, s

    cx1, s1 = build()
    sink1 = ArraySink()
    cx1.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink1)
    s1.play()
    cx1.render_offline(0.3)
    cx1.save_checkpoint(ckpt)
    cx1.deactivate()

    cx2, s2 = build()
    sink2 = ArraySink()
    cx2.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink2)
    cx2.load_checkpoint(ckpt)
    s2.play()  # host resumes playback; device playhead restored at 0.3 s
    cx2.render_offline(0.3)
    cx2.deactivate()
    L = sink2.audio(2)[0]
    # the resumed render covers clip region [0.3, 0.6] — still inside
    # the 1 s track, so it must be audible, not a desynced-window blank
    assert np.abs(L[: int(0.25 * SR)]).max() > 0.4


def test_play_after_fading_stop_uses_idle_deck():
    """Finding 5: stop(fade) marks the deck busy until the fade end; an
    immediate play() must grab the OTHER (idle) deck, not cut the fade."""
    cx = FirewheelCtx()
    player = MusicPlayer(cx.graph_mut(),
                         clock=lambda: cx.stream.frames_rendered)
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    a = const_reader(0.5, SR)
    player.play(a)
    cx.render_offline(0.1)
    fading_deck = player._current
    player.stop(fade_secs=0.3)
    assert player.decks[fading_deck].end_sample > cx.stream.frames_rendered
    player.play(const_reader(0.25, SR))
    assert player._current == 1 - fading_deck
    cx.render_offline(0.1)
    cx.deactivate()


def test_crossfaded_queue_still_reports_finished():
    """Finding 6: the crossfade path's safety pause lands after the EOF
    block, so the outgoing track's device `finished` event still fires
    even when the track length is not block-aligned."""
    cx = FirewheelCtx()
    player = MusicPlayer(cx.graph_mut(),
                         clock=lambda: cx.stream.frames_rendered)
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    a = const_reader(0.5, 13000)  # NOT a multiple of 512
    b = const_reader(0.5, SR)
    player.play(a)
    player.queue(b, crossfade_secs=0.1)
    finished = []
    for _ in range(3):
        cx.render_offline(0.15)
        finished += player.poll(cx.poll_events())
    cx.deactivate()
    assert any(r is a for kind, r in finished), finished
