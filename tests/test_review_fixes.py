"""Regression tests for the second code-review findings: packer leaf
classification, uint32 clamping, chunk-size normalization, exact-duration
renders, split-precision stream time, and the streaming WavSink."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.backend.stream import OutputStream, WavSink
from firewheel_tpu.core.node import BlockInfo, stream_time_from_sample
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import BeepTestNode, LoopRange, SamplerNode
from firewheel_tpu.packing import Packer
from firewheel_tpu.utils.wav import read_wav

SR = 48000
F = 128
INFO = BlockInfo.make()


def _clip(frames=200):
    t = np.arange(frames, dtype=np.float32)
    return SampleResource(
        np.stack([np.sin(0.1 * t), np.cos(0.1 * t)]).astype(np.float32),
        device=False,
    )


def _sampler_ctx(with_sample: bool):
    cx = FirewheelCtx()
    node = SamplerNode(100.0)
    if with_sample:
        node.set_sample(_clip())
    g = cx.graph
    nid = g.add_node(0, 2, node)
    g.connect(nid, 0, g.graph_out_node(), 0)
    g.connect(nid, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F), sink=sink, duration_secs=10.0
    )
    return cx, node, sink


def _pump(cx, n=4):
    for _ in range(n):
        cx.update()


def test_set_sample_after_activation_packed_path():
    # review finding #1: the packer froze passthrough-vs-grouped
    # classification from the example params; loading a sample AFTER
    # activation changed the sample leaf\'s shape and crashed pack()
    cx, node, sink = _sampler_ctx(with_sample=False)
    _pump(cx)
    assert np.all(sink.audio(2) == 0.0)
    node.set_sample(_clip())
    node.play()
    _pump(cx)
    cx.deactivate()
    assert np.any(sink.audio(2) != 0.0)


def test_negative_playhead_does_not_overflow():
    # review finding #2: np.uint32(negative) raises OverflowError on
    # NumPy >= 2; negative seeks must clamp to 0 (and huge ones to 2^32-1)
    cx, node, sink = _sampler_ctx(with_sample=True)
    node.play()
    node.set_playhead(-0.1)
    _pump(cx)
    node.set_playhead(2.0**40 / SR)
    _pump(cx)
    cx.deactivate()
    assert np.all(np.isfinite(sink.audio(2)))


def test_negative_loop_range_clamps():
    cx, node, sink = _sampler_ctx(with_sample=True)
    node.set_loop_range(LoopRange.range_secs(-1.0, -0.5))
    node.play()
    _pump(cx)
    cx.deactivate()
    assert np.all(np.isfinite(sink.audio(2)))


def test_loop_range_past_clip_end():
    # review finding #6: a loop entirely past the clip end must collapse to
    # the clip tail, not gather-repeat the final frame as a DC value
    cx, node, sink = _sampler_ctx(with_sample=True)
    node.set_loop_range(LoopRange.range_secs(10.0, 20.0))  # clip: 200 fr
    node.play()
    _pump(cx, 8)
    cx.deactivate()
    audio = sink.audio(2)
    assert np.all(np.isfinite(audio))
    # the tail must not be a non-zero DC plateau (the repeated-last-frame
    # failure mode); either silence or real looping audio is acceptable
    tail = audio[:, -F:]
    if np.any(tail != 0.0):
        assert tail.std() > 1e-6


def test_non_pow2_chunk_blocks_normalized():
    # review finding #3: chunk_buffers=6 used to warm a 6-block program the
    # pow2 dispatch path never used, silently disabling chunking
    cx = FirewheelCtx()
    g = cx.graph
    nid = g.add_node(0, 2, BeepTestNode(440.0, -12.0, enabled=True))
    g.connect(nid, 0, g.graph_out_node(), 0)
    g.connect(nid, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F, chunk_buffers=6),
        sink=sink,
        duration_secs=1.0,
    )
    proc = cx._active.stream._processor
    assert proc.chunk_blocks == 4  # floored to a power of two
    assert 4 in proc._warmed_sizes  # and the warmed size matches dispatch
    cx.deactivate()


def test_packer_treedef_validation():
    # review finding #5: leaf-count-only validation silently misroutes
    pk = Packer({"a": np.float32(1.0), "b": np.float32(2.0)})
    # a hard ValueError (not an assert) so it survives `python -O`
    with pytest.raises(ValueError):
        pk.pack({"a": np.float32(1.0), "c": np.float32(2.0)})


def test_packer_device_leaves_always_passthrough():
    ex = {"scalar": np.float32(1.0), "buf": jnp.zeros((1,), jnp.float32)}
    pk = Packer(ex)
    # shape change on a device leaf must not crash (it is passthrough)
    groups, passthrough = pk.pack(
        {"scalar": np.float32(2.0), "buf": jnp.zeros((100,), jnp.float32)}
    )
    assert len(passthrough) == 1 and passthrough[0].shape == (100,)


def test_stream_time_split_precision():
    # review finding #8: direct uint32->f32 cast quantizes to 64-sample
    # steps past 2^30; the split form stays within ~1 ulp of exact
    for sample in [2**30 + 12345, 2**31 + 7, 0xFFFF_FF00]:
        got = float(stream_time_from_sample(np.uint32(sample), SR))
        exact = sample / SR
        assert abs(got - exact) <= 2.0 * np.spacing(np.float32(exact)), (
            sample, got, exact,
        )


def test_wav_sink_streams_to_disk(tmp_path):
    # review finding #10: WavSink buffered everything in RAM until close()
    path = str(tmp_path / "out.wav")
    sink = WavSink(path, SR, 2)
    total = 0
    for _ in range(5):
        sink.write(np.full(256 * 2, 0.25, np.float32), 2)
        total += 256
        sink._f.flush()
        # bytes hit the file as we go, not only at close
        assert os.path.getsize(path) >= 44 + total * 2 * 4
    sink.close()
    audio, sr = read_wav(path)
    assert sr == SR and audio.shape == (2, total)
    assert np.allclose(audio, 0.25)
    sink.close()  # idempotent


def test_fixed_duration_render_exact():
    # review finding #4: fixed-duration renders used to round the final
    # dispatch up to whole stream buffers, overshooting the requested length
    cx = FirewheelCtx()
    g = cx.graph
    nid = g.add_node(0, 2, BeepTestNode(440.0, -12.0, enabled=True))
    g.connect(nid, 0, g.graph_out_node(), 0)
    g.connect(nid, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    want = 1000  # not a multiple of buffer_frames=256
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=256),
        sink=sink,
        duration_secs=want / SR,
    )
    stream = cx._active.stream
    while not stream.finished:
        assert stream.error is None
        cx.update()
    cx.deactivate()
    assert stream.frames_rendered == want
    assert sink.audio(2).shape == (2, want)


def test_reverb_partial_block_stream():
    # third-review finding: reverb's fixed-hop FDL crashed on partial
    # blocks (exact-duration tails); the zero-latency any-hop engine must
    # render them sample-exactly
    from firewheel_tpu import FirewheelCtx
    from firewheel_tpu.nodes import ConvolutionReverbNode

    rng = np.random.default_rng(3)
    ir = (rng.standard_normal(300) * 0.2).astype(np.float32)

    def render(duration_frames):
        cx = FirewheelCtx()
        g = cx.graph
        b = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        rv = g.add_node(2, 2, ConvolutionReverbNode(ir, wet=0.5, dry=1.0))
        g.connect(b, 0, rv, 0)
        g.connect(b, 1, rv, 1)
        g.connect(rv, 0, g.graph_out_node(), 0)
        g.connect(rv, 1, g.graph_out_node(), 1)
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=128),
            sink=sink,
            duration_secs=duration_frames / SR,
        )
        stream = cx._active.stream
        while not stream.finished:
            assert stream.error is None, stream.error
            cx.update()
        cx.deactivate()
        return sink.audio(2)

    # 1000 = 7 full 128-blocks + a 104-frame partial tail (used to crash)
    partial = render(1000)
    full = render(1024)
    assert partial.shape == (2, 1000)
    # identical engine state history → bit-close prefix
    np.testing.assert_allclose(partial, full[:, :1000], atol=1e-6)


def test_automation_setter_may_mutate_lanes():
    # third-review finding: a lane setter that chains automation mutated
    # the dict mid-iteration
    from firewheel_tpu.core.automation import AutomationCurve, Keyframe, ParamAutomator

    auto = ParamAutomator()
    curve = AutomationCurve([Keyframe(0.0, 0.0), Keyframe(0.1, 1.0)])
    fired = []

    def chaining_setter(v):
        fired.append(v)
        if len(fired) == 1:
            auto.add("second", lambda v2: None, curve)  # mutate mid-tick

    auto.add("first", chaining_setter, curve)
    auto.tick(0.05)  # must not raise RuntimeError
    assert fired


def test_checkpoint_block_size_mismatch_rejected(tmp_path):
    from firewheel_tpu import FirewheelCtx
    from firewheel_tpu.checkpoint import restore_into, save_checkpoint

    def make(frames):
        cx = FirewheelCtx()
        g = cx.graph
        b = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        g.connect(b, 0, g.graph_out_node(), 0)
        g.connect(b, 1, g.graph_out_node(), 1)
        cx.activate(StreamConfig(SR, 2, buffer_frames=frames), sink=ArraySink())
        return cx

    cx = make(256)
    save_checkpoint(str(tmp_path / "ck"), cx._active.stream._processor)
    cx.deactivate()
    cx2 = make(128)
    with pytest.raises(ValueError, match="max_block_frames"):
        restore_into(str(tmp_path / "ck"), cx2._active.stream._processor)
    cx2.deactivate()


def test_batch_renderer_honors_custom_mask_with_default_inputs():
    import firewheel_tpu as fw
    from firewheel_tpu.parallel import BatchRenderer

    g = fw.AudioGraph(fw.AudioGraphConfig(2, 2))
    from firewheel_tpu.nodes import HardClipNode

    c = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(g.graph_in_node(), 0, c, 0)
    g.connect(g.graph_in_node(), 1, c, 1)
    g.connect(c, 0, g.graph_out_node(), 0)
    g.connect(c, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, 64)
    prog = fw.ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    br = BatchRenderer(prog, batch=2)
    params, state = br.stack_params(), br.init_state()
    my_mask = jnp.zeros((2, 3, 2), bool)  # NOT silent
    out, om, state = br.render_chunk(
        params, state, graph_in=None, in_mask=my_mask, num_blocks=3
    )
    # mask flows through the passthrough graph: outputs marked not-silent
    assert not bool(jnp.any(om))
    # and the default path still reports silence
    out, om2, state = br.render_chunk(params, state, num_blocks=3)
    assert bool(jnp.all(om2))
