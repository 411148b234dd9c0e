"""The 2^32 stream-clock epoch boundary (~24.8 h @ 48 kHz).

Host clocks are unbounded Python ints; the device stream clock is
modular uint32 (`core.node.wrap_stream_sample`).  A long-lived serving
fleet crosses the boundary on day two: dispatches must not overflow,
and `at_sample=` scheduled commands (consumed host-side into PerBlock
timelines) must land on their exact blocks across the epoch."""

import numpy as np
import jax.numpy as jnp
import pytest

import firewheel_tpu as fw
from firewheel_tpu import SessionServer
from firewheel_tpu.core.node import wrap_stream_sample, STREAM_SAMPLE_PERIOD
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import BeepTestNode, SamplerNode, SumNode, VolumeNode

SR, F = 48000, 128
WRAP = STREAM_SAMPLE_PERIOD  # 2**32


def make_program():
    """beep -> volume, plus a one-shot sampler, summed to graph_out."""
    g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
    tone = BeepTestNode(440.0, -12.0, True)
    vol = VolumeNode(100.0)
    sfx = SamplerNode(100.0)
    clip = (np.random.default_rng(7).standard_normal((2, 200)) * 0.2
            ).astype(np.float32)
    sfx.set_sample(SampleResource(clip, device=False))
    tid = g.add_node(0, 2, tone)
    vid = g.add_node(2, 2, vol)
    sid = g.add_node(0, 2, sfx)
    mix = g.add_node(4, 2, SumNode())
    g.connect(tid, 0, vid, 0); g.connect(tid, 1, vid, 1)
    g.connect(vid, 0, mix, 0); g.connect(vid, 1, mix, 1)
    g.connect(sid, 0, mix, 2); g.connect(sid, 1, mix, 3)
    g.connect(mix, 0, g.graph_out_node(), 0)
    g.connect(mix, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = fw.ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    return prog, vol, sfx


def render_window(prog, vol, sfx, epoch, k=8):
    """Render k blocks starting at `epoch`, with a volume set scheduled
    3 blocks in and a sampler play() 5 blocks in — both via absolute
    `at_sample=` values that may exceed 2^32."""
    vol.set_percent_volume(25.0, at_sample=epoch + 3 * F)
    sfx.play(at_sample=epoch + 5 * F)
    params = prog.collect_params(blocks=k, start_sample=epoch)
    packed = prog.pack_state(prog.init_state())
    outs, oms, _ = prog.render_packed(
        params, packed,
        np.zeros((k, 0, F), np.float32), np.ones((k, 0), bool),
        epoch, blocks=k,
    )
    return np.asarray(outs)


def test_wrap_stream_sample_rebases_unbounded_ints():
    assert int(wrap_stream_sample(0)) == 0
    assert int(wrap_stream_sample(WRAP)) == 0
    assert int(wrap_stream_sample(WRAP + 12345)) == 12345
    assert int(wrap_stream_sample(3 * WRAP + 7)) == 7
    # arrays rebase modularly too
    a = wrap_stream_sample(np.asarray([WRAP - 1, WRAP, WRAP + 1], np.int64))
    np.testing.assert_array_equal(np.asarray(a), [WRAP - 1, 0, 1])


def test_dispatch_past_the_boundary_does_not_overflow():
    """Before the fix, jnp.asarray(start_sample, uint32) raised
    OverflowError on the first dispatch past 2^32."""
    prog, vol, sfx = make_program()
    out = render_window(prog, vol, sfx, WRAP + 4 * F)
    assert np.isfinite(out).all() and np.abs(out).max() > 0.01


def test_scheduled_commands_land_exactly_across_the_boundary():
    """A volume set and a play(at_sample=) scheduled ACROSS 2^32 land on
    the same blocks as the identical schedule in a small epoch — the
    beep/volume/sampler kernels key on per-block deltas, so the renders
    must match bit-exactly."""
    # window starts 4 blocks before the boundary; the volume set lands
    # 1 block before it, the sampler trigger 1 block after it
    prog_a, vol_a, sfx_a = make_program()
    big = render_window(prog_a, vol_a, sfx_a, WRAP - 4 * F)
    prog_b, vol_b, sfx_b = make_program()
    small = render_window(prog_b, vol_b, sfx_b, WRAP * 0 + 64 * F)
    np.testing.assert_array_equal(big, small)
    # and the schedule visibly changed the audio on its exact blocks:
    # the clip's first sample appears exactly at block 5
    assert np.abs(big[:5, :, :]).max() < 0.3   # tone at -12dB, then 25%
    assert not np.array_equal(big[2], big[3])  # volume step at block 3


def test_session_server_crosses_the_boundary_mid_stream():
    """A serving fleet's `sample` clock is an unbounded int; rendering
    continues seamlessly across the device epoch."""
    prog, vol, sfx = make_program()
    srv = SessionServer(prog, capacity=2, chunk_blocks=4)
    h = srv.connect(lambda: vol.set_percent_volume(100.0))
    # park the fleet clock one chunk before the boundary (day 2 of a
    # long-lived server)
    srv.sample = WRAP - 4 * F
    a = np.asarray(srv.render())   # ends exactly ON the boundary
    b = np.asarray(srv.render())   # first chunk of the new epoch
    assert srv.sample == WRAP + 4 * F
    for out in (a, b):
        assert np.isfinite(out).all()
        assert np.abs(out[h.slot]).max() > 0.05
    # the tone stays phase-continuous across the epoch: no sample-scale
    # discontinuity between the last pre-wrap and first post-wrap frame
    last = a[h.slot, -1, 0, -1]
    first = b[h.slot, 0, 0, 0]
    assert abs(float(first) - float(last)) < 0.05  # 440 Hz slope bound


def test_crossfade_shaped_ramps_across_the_boundary():
    """The music-layer primitive under a crossfade — two opposed
    scheduled volume ramps — lands sample-exactly when the fade spans
    2^32 (same PerBlock machinery as MusicPlayer's device timelines)."""
    def render(epoch):
        g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
        a, b = BeepTestNode(440.0, -12.0, True), BeepTestNode(220.0, -12.0, True)
        va, vb = VolumeNode(100.0), VolumeNode(0.0)
        mix = g.add_node(4, 2, SumNode())
        ida, idva = g.add_node(0, 2, a), g.add_node(2, 2, va)
        idb, idvb = g.add_node(0, 2, b), g.add_node(2, 2, vb)
        for src, vid_, base in ((ida, idva, 0), (idb, idvb, 2)):
            g.connect(src, 0, vid_, 0); g.connect(src, 1, vid_, 1)
            g.connect(vid_, 0, mix, base); g.connect(vid_, 1, mix, base + 1)
        g.connect(mix, 0, g.graph_out_node(), 0)
        g.connect(mix, 1, g.graph_out_node(), 1)
        pkg = g.compile(SR, F)
        prog = fw.ScheduleProgram(
            pkg.schedule, dict(pkg.new_node_processors), SR)
        # fade out A / in B across the epoch boundary (block 4 of 8)
        va.set_percent_volume(0.0, at_sample=epoch + 4 * F)
        vb.set_percent_volume(100.0, at_sample=epoch + 4 * F)
        params = prog.collect_params(blocks=8, start_sample=epoch)
        outs, _, _ = prog.render_packed(
            params, prog.pack_state(prog.init_state()),
            np.zeros((8, 0, F), np.float32), np.ones((8, 0), bool),
            epoch, blocks=8,
        )
        return np.asarray(outs)

    big, small = render(WRAP - 4 * F), render(1024 * F)
    np.testing.assert_array_equal(big, small)
    assert not np.array_equal(big[3], big[4])  # the fade engages at block 4
