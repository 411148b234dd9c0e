"""Node event notifications (core/events.py): device-side monotonic
counters diffed at host poll time — the TPU-native answer to the
reference's TODO'd "Notify node that sample has finished"
(sampler.rs:496,513)."""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import LoopRange, SamplerNode

SR = 48000
F = 128
INFO = BlockInfo.make()
RNG = np.random.default_rng(11)


def make_clip(frames, channels=2):
    data = RNG.standard_normal((channels, frames)).astype(np.float32) * 0.1
    return SampleResource(data, device=False), data


def build_ctx(clip):
    cx = FirewheelCtx()
    g = cx.graph_mut()
    s = SamplerNode(100.0)
    s.set_sample(clip)
    samp = g.add_node(0, 2, s)
    g.connect(samp, 0, g.graph_out_node(), 0)
    g.connect(samp, 1, g.graph_out_node(), 1)
    return cx, s, samp


def activate(cx):
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    return sink


# -- ctx-level polling --------------------------------------------------------

def test_oneshot_finish_event():
    clip, _ = make_clip(2400)  # 0.05 s
    cx, s, samp = build_ctx(clip)
    activate(cx)
    s.play()
    cx.render_offline(0.2)
    events = cx.poll_events()
    cx.deactivate()
    fins = [e for e in events if e.name == "finished"]
    assert len(fins) == 1
    e = fins[0]
    assert e.node_id == samp
    assert e.count == 1 and e.total == 1 and e.lane is None
    # drained: nothing new on the next poll
    assert cx.poll_events() == []


def test_idle_graph_emits_nothing():
    clip, _ = make_clip(2400)
    cx, s, _ = build_ctx(clip)
    activate(cx)
    cx.render_offline(0.1)
    assert cx.poll_events() == []
    cx.deactivate()


def test_loop_crossings_counted_exactly():
    clip, _ = make_clip(4800)  # 0.1 s loop
    cx, s, samp = build_ctx(clip)
    s.set_loop_range(LoopRange.FULL)
    activate(cx)
    s.play()
    cx.render_offline(0.35)  # crosses the join at 0.1, 0.2, 0.3 s
    events = {e.name: e for e in cx.poll_events()}
    cx.deactivate()
    assert "finished" not in events  # looping never finishes
    assert events["loop"].count == 3
    assert events["loop"].total == 3


def test_retrigger_aggregates_between_polls():
    clip, _ = make_clip(1200)  # 25 ms
    cx, s, _ = build_ctx(clip)
    activate(cx)
    s.play()
    cx.render_offline(0.1)
    s.play()  # re-trigger after the first finish
    cx.render_offline(0.1)
    events = [e for e in cx.poll_events() if e.name == "finished"]
    cx.deactivate()
    assert len(events) == 1
    assert events[0].count == 2 and events[0].total == 2


def test_events_survive_live_topology_edit():
    from firewheel_tpu.nodes import VolumeNode

    clip, _ = make_clip(2400)
    cx, s, samp = build_ctx(clip)
    activate(cx)
    s.play()
    cx.render_offline(0.1)  # finishes before the edit
    # live edit: splice a volume node into a fresh parallel path — the
    # schedule recompiles and state (incl. event counters) migrates
    g = cx.graph_mut()
    vol = g.add_node(2, 2, VolumeNode(50.0))
    g.connect(samp, 0, vol, 0)
    cx.render_offline(0.1)  # pumps update() → swap installs
    events = [e for e in cx.poll_events() if e.name == "finished"]
    cx.deactivate()
    assert len(events) == 1 and events[0].total == 1


def test_checkpoint_restore_does_not_replay_events(tmp_path):
    ckpt = str(tmp_path / "ck")
    clip, _ = make_clip(2400)
    cx, s, _ = build_ctx(clip)
    activate(cx)
    s.play()
    cx.render_offline(0.2)
    assert any(e.name == "finished" for e in cx.poll_events())
    cx.save_checkpoint(ckpt)
    cx.deactivate()

    clip2 = SampleResource(np.asarray(clip.data), device=False)
    cx2, s2, _ = build_ctx(clip2)
    activate(cx2)
    cx2.load_checkpoint(ckpt)
    # the restored counter total is 1, but restore re-baselines: the
    # pre-checkpoint finish must NOT fire again
    assert cx2.poll_events() == []
    s2.play()
    cx2.render_offline(0.2)
    events = [e for e in cx2.poll_events() if e.name == "finished"]
    cx2.deactivate()
    assert len(events) == 1
    assert events[0].count == 1 and events[0].total == 2  # monotonic total


def test_hard_clip_counts_clipped_samples():
    from firewheel_tpu.nodes import BeepTestNode, HardClipNode

    cx = FirewheelCtx()
    g = cx.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))  # peak ~0.251
    clip_node = g.add_node(2, 2, HardClipNode(-20.0))  # threshold 0.1
    for ch in range(2):
        g.connect(beep, ch, clip_node, ch)
        g.connect(clip_node, ch, g.graph_out_node(), ch)
    activate(cx)
    cx.render_offline(0.1)
    events = [e for e in cx.poll_events() if e.name == "clipped"]
    assert len(events) == 1 and events[0].node_id == clip_node
    # a -12 dB sine over a -20 dB threshold clips most of each cycle on
    # both channels: thousands of samples in 0.1 s
    assert events[0].count > 2000
    # threshold above the peak → no further clip events
    total = events[0].total
    cx.deactivate()
    assert total == events[0].count


# -- serving path: per-instance fleet events ----------------------------------

def test_batch_renderer_per_instance_events():
    import firewheel_tpu as fw
    from firewheel_tpu.parallel.mesh import BatchRenderer

    clip, _ = make_clip(256)
    g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
    s = SamplerNode(100.0)
    s.set_sample(clip)
    samp = g.add_node(0, 2, s)
    g.connect(samp, 0, g.graph_out_node(), 0)
    g.connect(samp, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = fw.ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    br = BatchRenderer(prog, batch=4)
    # per-instance params: instances 1 and 3 play, 0 and 2 stay idle
    plist = []
    for b in range(4):
        if b in (1, 3):
            s.play()
        else:
            s.pause()
        plist.append(prog.collect_params())
    params = br.stack_params(plist)
    state = br.init_state()
    out, om, state = br.render_chunk(params, state, num_blocks=8)
    events = br.poll_events(state)
    fins = sorted(
        (e.instance for e in events if e.name == "finished")
    )
    assert fins == [1, 3]
    for e in events:
        assert e.node_id == samp and e.count == 1 and e.total == 1
    # drained
    assert br.poll_events(state) == []


def test_fleet_restore_rebaselines_events(tmp_path):
    """A restored BatchRenderer fleet must not replay pre-checkpoint
    events, and post-restore totals stay monotonic."""
    import firewheel_tpu as fw
    from firewheel_tpu.parallel.mesh import BatchRenderer

    clip, _ = make_clip(256)
    g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
    s = SamplerNode(100.0)
    s.set_sample(clip)
    samp = g.add_node(0, 2, s)
    g.connect(samp, 0, g.graph_out_node(), 0)
    g.connect(samp, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = fw.ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    br = BatchRenderer(prog, batch=2)
    s.play()
    params = br.stack_params([prog.collect_params()] * 2)
    state = br.init_state()
    out, om, state = br.render_chunk(params, state, num_blocks=8)
    assert len(br.poll_events(state)) == 2  # both instances finished
    ck = str(tmp_path / "fleet")
    br.save_checkpoint(ck, state)

    br2 = BatchRenderer(prog, batch=2)
    state2, meta = br2.restore_checkpoint(ck)
    # restored totals are 1 per instance, but nothing NEW happened
    assert br2.poll_events(state2) == []
    # re-trigger and the monotonic totals continue from the restore
    s.play()
    params2 = br2.stack_params([prog.collect_params()] * 2)
    out, om, state2 = br2.render_chunk(params2, state2, num_blocks=8)
    events = [e for e in br2.poll_events(state2) if e.name == "finished"]
    assert sorted(e.instance for e in events) == [0, 1]
    assert all(e.count == 1 and e.total == 2 for e in events)


def test_voice_pool_finished_handles():
    from firewheel_tpu import AudioGraphConfig, VoicePool
    from firewheel_tpu.executor import clear_program_cache

    clear_program_cache()
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    pool = VoicePool(
        cx.graph, num_voices=4, max_clip_frames=512, declick_secs=0.0
    )
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=F), sink=sink)
    clip = SampleResource(
        np.full((1, 256), 0.5, np.float32), sample_rate=SR
    )
    h1 = pool.play(clip, when=0, now=0)
    h2 = pool.play(clip, when=0, now=0)
    assert h1 is not None and h2 is not None
    cx.render_offline(8 * F / SR)
    done = pool.finished_handles(cx.poll_events())
    cx.deactivate()
    assert {h._index for h in done} == {h1._index, h2._index}
    assert len(done) == 2
    clear_program_cache()


# -- kernel-level: counting + finish/release interaction ----------------------

def run_blocks(proc, state, n_blocks, collect):
    outs = []
    empty = jnp.zeros((0, F), jnp.float32)
    emask = jnp.zeros((0,), bool)
    for _ in range(n_blocks):
        out, state, om = proc.kernel(collect(), state, empty, emask, INFO)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1), state


def test_finished_voice_release_tail_is_silent():
    """A finished one-shot must NOT audibly replay the clip head during
    its release fade (the playhead rewinds to 0 at finish; `ended` gates
    validity)."""
    clip, _ = make_clip(300)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.set_envelope(0.0, 0.02)  # 20 ms release
    node.play()
    proc = node.activate(SR, F, 0, 2)
    state = proc.init_state()
    audio, state = run_blocks(proc, state, 10, proc.collect_params)
    # clip is 300 frames; everything after (plus interp edge) must be 0
    assert np.abs(audio[:, 304:]).max() == 0.0
    assert int(state["finish_count"]) == 1
    # the frozen voice never re-fires
    audio2, state = run_blocks(proc, state, 10, proc.collect_params)
    assert np.abs(audio2).max() == 0.0
    assert int(state["finish_count"]) == 1


def test_streaming_sampler_finish_counter():
    from firewheel_tpu.nodes.streaming_sampler import (
        CallbackStreamReader,
        StreamingSamplerNode,
    )

    frames = 700
    data = RNG.standard_normal((1, frames)).astype(np.float32)

    def read_fn(start, n):
        out = np.zeros((1, n), np.float32)
        avail = max(0, min(frames - start, n))
        if avail > 0:
            out[:, :avail] = data[:, start : start + avail]
        return out

    node = StreamingSamplerNode()
    node.set_reader(CallbackStreamReader(read_fn, 1, frames, SR))
    node.play()
    proc = node.activate(SR, F, 0, 2)
    assert proc.event_counters() == {"finished": "finish_count"}
    state = proc.init_state()
    empty = jnp.zeros((0, F), jnp.float32)
    emask = jnp.zeros((0,), bool)
    for _ in range(10):
        out, state, om = proc.kernel(
            proc.collect_params(), state, empty, emask, INFO
        )
    assert int(state["finish_count"]) == 1
