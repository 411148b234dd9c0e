"""Checkpoint/resume tests: sample-exact state restoration across engine
instances (SURVEY §5 aux subsystem)."""

import numpy as np
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.nodes import BeepTestNode, VolumeNode

SR = 48000


def build(cx):
    g = cx.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    return beep, vol


def test_checkpoint_resume_sample_exact(tmp_path):
    ckpt = str(tmp_path / "ck")

    # session 1: render 0.2 s, checkpoint
    cx1 = FirewheelCtx()
    build(cx1)
    sink1 = ArraySink()
    cx1.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink1)
    cx1.render_offline(0.2)
    frames1 = cx1.stream.frames_rendered
    cx1.save_checkpoint(ckpt)
    # continue rendering in session 1 (the "ground truth" continuation)
    cx1.render_offline(0.2)
    cx1.deactivate()
    truth = sink1.audio(2)

    # session 2: fresh engine, same topology, restore, continue
    cx2 = FirewheelCtx()
    build(cx2)
    sink2 = ArraySink()
    cx2.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink2)
    meta = cx2.load_checkpoint(ckpt)
    assert meta["frames_rendered"] == frames1
    assert cx2.stream.frames_rendered == frames1
    cx2.render_offline(0.2)
    cx2.deactivate()
    resumed = sink2.audio(2)

    # the resumed audio must continue exactly where session 1 left off
    n = min(resumed.shape[1], truth.shape[1] - frames1)
    np.testing.assert_allclose(
        resumed[:, :n], truth[:, frames1 : frames1 + n], atol=1e-6
    )


def test_checkpoint_graph_mismatch_rejected(tmp_path):
    ckpt = str(tmp_path / "ck")
    cx1 = FirewheelCtx()
    build(cx1)
    cx1.activate(StreamConfig(SR, 2), sink=ArraySink())
    cx1.render_offline(0.05)
    cx1.save_checkpoint(ckpt)
    cx1.deactivate()

    cx2 = FirewheelCtx()
    g = cx2.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    g.connect(beep, 0, g.graph_out_node(), 0)  # different topology
    cx2.activate(StreamConfig(SR, 2), sink=ArraySink())
    with pytest.raises(ValueError, match="mismatch"):
        cx2.load_checkpoint(ckpt)
    cx2.deactivate()


def test_checkpoint_sample_rate_mismatch_rejected(tmp_path):
    ckpt = str(tmp_path / "ck")
    cx1 = FirewheelCtx()
    build(cx1)
    cx1.activate(StreamConfig(SR, 2), sink=ArraySink())
    cx1.save_checkpoint(ckpt)
    cx1.deactivate()

    cx2 = FirewheelCtx()
    build(cx2)
    cx2.activate(StreamConfig(44100, 2), sink=ArraySink())
    with pytest.raises(ValueError, match="sample-rate"):
        cx2.load_checkpoint(ckpt)
    cx2.deactivate()


class TestShardedFleetCheckpoint:
    """VERDICT r2 item 5: a dp-sharded BatchRenderer fleet snapshots and
    resumes bit-exactly via per-process shard files (no global gather).
    Single-process here (4-device virtual dp mesh); the real two-process
    DCN path runs in tests/test_multiprocess.py."""

    def _program(self):
        from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
        from firewheel_tpu.nodes import EchoNode

        g = AudioGraph(AudioGraphConfig(0, 2))
        b = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        e = g.add_node(2, 2, EchoNode(0.05, 0.4))
        g.connect(b, 0, e, 0); g.connect(b, 1, e, 1)
        g.connect(e, 0, g.graph_out_node(), 0)
        g.connect(e, 1, g.graph_out_node(), 1)
        pkg = g.compile(SR, 64)
        return ScheduleProgram(
            pkg.schedule, dict(pkg.new_node_processors), SR
        )

    def test_sharded_save_restore_bit_exact(self, tmp_path):
        from firewheel_tpu.parallel import BatchRenderer, make_mesh

        prog = self._program()
        mesh = make_mesh({"dp": 4})
        br = BatchRenderer(prog, batch=8, mesh=mesh, axis="dp")
        params, state = br.stack_params(), br.init_state()
        out1, _, state = br.render_chunk(params, state, num_blocks=4)

        ck = str(tmp_path / "fleet_ck")
        br.save_checkpoint(ck, state, extra_meta={"app": {"tick": 17}})
        # ground truth: uninterrupted continuation
        truth, _, _ = br.render_chunk(params, state, num_blocks=4)

        # fresh fleet (new renderer, new program instance), restore, resume
        br2 = BatchRenderer(self._program(), batch=8, mesh=mesh, axis="dp")
        state2, meta = br2.restore_checkpoint(ck)
        assert meta["app"] == {"tick": 17}
        assert meta["batch"] == 8
        out2, _, _ = br2.render_chunk(br2.stack_params(), state2, num_blocks=4)
        np.testing.assert_array_equal(np.asarray(truth), np.asarray(out2))

    def test_sharded_restore_validates(self, tmp_path):
        from firewheel_tpu.parallel import BatchRenderer, make_mesh

        prog = self._program()
        mesh = make_mesh({"dp": 4})
        br = BatchRenderer(prog, batch=8, mesh=mesh, axis="dp")
        state = br.init_state()
        ck = str(tmp_path / "fleet_ck2")
        br.save_checkpoint(ck, state)
        wrong = BatchRenderer(self._program(), batch=16, mesh=mesh, axis="dp")
        with pytest.raises(ValueError, match="batch mismatch"):
            wrong.restore_checkpoint(ck)

    def test_unsharded_renderer_roundtrip(self, tmp_path):
        """No mesh at all: degenerates to one rank file, same API."""
        from firewheel_tpu.parallel import BatchRenderer

        prog = self._program()
        br = BatchRenderer(prog, batch=4)
        params, state = br.stack_params(), br.init_state()
        _, _, state = br.render_chunk(params, state, num_blocks=2)
        ck = str(tmp_path / "solo_ck")
        br.save_checkpoint(ck, state)
        truth, _, _ = br.render_chunk(params, state, num_blocks=2)
        state2, _ = br.restore_checkpoint(ck)
        out2, _, _ = br.render_chunk(params, state2, num_blocks=2)
        np.testing.assert_array_equal(np.asarray(truth), np.asarray(out2))
