"""DSP node tests: pan, width, filter, delays, reverb, spatializer, meter —
behavior through the node kernel contract and through full graphs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    BlockInfo,
    ScheduleProgram,
)
from firewheel_tpu.core.node import NodeActivationError
from firewheel_tpu.nodes import (
    BeepTestNode,
    ConvolutionReverbNode,
    DbMeterNode,
    DelayCompNode,
    EchoNode,
    FilterNode,
    FilterType,
    Spatializer3DNode,
    StereoPanNode,
    StereoWidthNode,
)

SR = 48000
F = 128
RNG = np.random.default_rng(11)
INFO = BlockInfo.make()


def rand(ch, frames=F):
    return RNG.standard_normal((ch, frames)).astype(np.float32)


def run_node(node, num_in, num_out, blocks, inputs=None, mask=None):
    proc = node.activate(SR, F, num_in, num_out)
    state = proc.init_state()
    outs = []
    for b in range(blocks):
        x = inputs[b] if inputs is not None else jnp.zeros((num_in, F), jnp.float32)
        m = mask if mask is not None else jnp.zeros((num_in,), bool)
        out, state, om = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.asarray(m), INFO
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1), state, proc


class TestPan:
    def test_center_is_equal_power(self):
        x = rand(2)
        node = StereoPanNode(0.0)
        out, _, _ = run_node(node, 2, 2, 1, [x])
        mid = (x[0] + x[1]) * 0.5
        g = np.float32(np.cos(np.pi / 4))
        np.testing.assert_allclose(out[0], mid * g, atol=1e-6)
        np.testing.assert_allclose(out[1], mid * g, atol=1e-6)

    def test_hard_left(self):
        x = rand(1)
        node = StereoPanNode(-1.0)
        out, _, _ = run_node(node, 1, 2, 1, [x])
        np.testing.assert_allclose(out[0], x[0], atol=1e-6)
        np.testing.assert_allclose(out[1], 0.0, atol=1e-6)

    def test_pan_change_smooths(self):
        x = np.ones((1, F), np.float32)
        node = StereoPanNode(-1.0)
        proc = node.activate(SR, F, 1, 2)
        state = proc.init_state()
        out, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        node.set_pan(1.0)
        out2, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        out2 = np.asarray(out2)
        # ramping: right channel grows monotonically, no jump
        assert out2[1, 0] < 0.1
        assert np.all(np.diff(out2[1]) >= -1e-6)

    def test_bad_ports(self):
        with pytest.raises(NodeActivationError):
            StereoPanNode(0.0).activate(SR, F, 2, 1)


class TestWidth:
    def test_width_zero_collapses_to_mono(self):
        x = rand(2)
        node = StereoWidthNode(0.0)
        out, _, _ = run_node(node, 2, 2, 1, [x])
        mid = (x[0] + x[1]) * np.float32(0.5)
        np.testing.assert_allclose(out[0], mid, atol=1e-6)
        np.testing.assert_allclose(out[1], mid, atol=1e-6)

    def test_width_one_is_identity(self):
        x = rand(2)
        out, _, _ = run_node(StereoWidthNode(1.0), 2, 2, 1, [x])
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestFilterNode:
    def test_lowpass_graph(self):
        g = AudioGraph(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
        filt = g.add_node(
            2, 2, FilterNode(FilterType.LOWPASS, frequency_hz=500.0)
        )
        g.connect(g.graph_in_node(), 0, filt, 0)
        g.connect(g.graph_in_node(), 1, filt, 1)
        g.connect(filt, 0, g.graph_out_node(), 0)
        g.connect(filt, 1, g.graph_out_node(), 1)
        pkg = g.compile(SR, F)
        prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
        state = prog.init_state()
        t = np.arange(F * 16, dtype=np.float32)
        hi = np.sin(2 * np.pi * 8000 / SR * t).astype(np.float32)
        outs = []
        for i in range(16):
            x = np.stack([hi[i * F : (i + 1) * F]] * 2)
            out, om, state = prog.render_block(
                prog.collect_params(), state, jnp.asarray(x),
                jnp.zeros(2, bool), INFO,
            )
            outs.append(np.asarray(out))
        tail = np.concatenate(outs, axis=1)[:, -512:]
        assert np.abs(tail).max() < 0.05  # 8 kHz killed by 500 Hz lowpass

    def test_silent_with_ringing_state_keeps_output(self):
        node = FilterNode(FilterType.LOWPASS, 200.0, q=2.0)
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        x = np.zeros((1, F), np.float32)
        x[0, 0] = 1.0  # impulse
        out, state, om = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        # now silent input but state is ringing → output NOT silent
        out2, state, om2 = proc.kernel(
            proc.collect_params(), state,
            jnp.zeros((1, F), jnp.float32), jnp.ones(1, bool), INFO,
        )
        assert not bool(np.asarray(om2)[0])
        assert np.abs(np.asarray(out2)).max() > 1e-4


class TestDelayNodes:
    def test_delay_comp(self):
        x = rand(2, F)
        node = DelayCompNode(delay_frames=37)
        proc = node.activate(SR, F, 2, 2)
        state = proc.init_state()
        out, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(2, bool), INFO
        )
        out = np.asarray(out)
        assert (out[:, :37] == 0).all()
        np.testing.assert_array_equal(out[:, 37:], x[:, : F - 37])

    def test_delay_comp_secs(self):
        node = DelayCompNode(delay_secs=0.001)
        proc = node.activate(SR, F, 1, 1)
        assert proc.delay_frames == 48

    def test_echo_impulse_response(self):
        d = 2 * F  # 256-frame echo
        node = EchoNode(delay_secs=d / SR, feedback=0.5, wet=1.0, dry=1.0)
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        outs = []
        for i in range(8):
            x = np.zeros((1, F), np.float32)
            if i == 0:
                x[0, 0] = 1.0
            out, state, _ = proc.kernel(
                proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
            )
            outs.append(np.asarray(out))
        y = np.concatenate(outs, axis=1)[0]
        # dry impulse at 0; echoes at d, 2d, 3d with gains 1, .5, .25
        assert y[0] == 1.0
        assert abs(y[d] - 1.0) < 1e-6
        assert abs(y[2 * d] - 0.5) < 1e-6
        assert abs(y[3 * d] - 0.25) < 1e-6

    def test_echo_min_delay_enforced(self):
        with pytest.raises(NodeActivationError):
            EchoNode(delay_secs=0.0001).activate(SR, F, 1, 1)


class TestReverb:
    def test_matches_direct_convolution(self):
        ir = (RNG.standard_normal(400) * np.exp(-np.arange(400) / 80)).astype(
            np.float32
        )
        node = ConvolutionReverbNode(ir, wet=1.0, dry=0.0)
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        x = RNG.standard_normal((1, 6 * F)).astype(np.float32)
        outs = []
        for i in range(6):
            out, state, _ = proc.kernel(
                proc.collect_params(), state,
                jnp.asarray(x[:, i * F : (i + 1) * F]), jnp.zeros(1, bool), INFO,
            )
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)[0]
        ref = np.convolve(x[0].astype(np.float64), ir.astype(np.float64))[: 6 * F]
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_tail_rings_after_silence(self):
        ir = np.zeros(300, np.float32)
        ir[250] = 0.7
        node = ConvolutionReverbNode(ir, wet=1.0, dry=0.0)
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        x = np.zeros((1, F), np.float32)
        x[0, 10] = 1.0
        out, state, om = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        out2, state, om2 = proc.kernel(
            proc.collect_params(), state,
            jnp.zeros((1, F), jnp.float32), jnp.ones(1, bool), INFO,
        )
        out3, state, om3 = proc.kernel(
            proc.collect_params(), state,
            jnp.zeros((1, F), jnp.float32), jnp.ones(1, bool), INFO,
        )
        y = np.concatenate([np.asarray(o)[0] for o in (out, out2, out3)])
        assert abs(y[260] - 0.7) < 1e-4  # impulse at 10 + IR tap at 250
        assert not bool(np.asarray(om2)[0])  # tail still flagged live


class TestSpatializer:
    def test_front_center(self):
        node = Spatializer3DNode(position=(0.0, 0.0, -1.0))
        x = np.ones((1, F), np.float32) * 0.5
        out, _, _ = run_node(node, 1, 2, 1, [x])
        # centered: both channels equal
        np.testing.assert_allclose(out[0], out[1], atol=1e-6)

    def test_right_side_pans_right(self):
        node = Spatializer3DNode(position=(2.0, 0.0, 0.0))
        x = np.ones((1, F), np.float32) * 0.5
        out, _, _ = run_node(node, 1, 2, 4, [x, x, x, x])
        assert np.abs(out[1, -F:]).mean() > 5 * np.abs(out[0, -F:]).mean()

    def test_distance_attenuates(self):
        near = Spatializer3DNode(position=(0.0, 0.0, -1.0))
        far = Spatializer3DNode(position=(0.0, 0.0, -20.0))
        x = np.ones((1, F), np.float32)
        near_out, _, _ = run_node(near, 1, 2, 4, [x] * 4)
        far_out, _, _ = run_node(far, 1, 2, 4, [x] * 4)
        assert np.abs(far_out[:, -F:]).max() < 0.2 * np.abs(near_out[:, -F:]).max()

    def test_move_is_smooth(self):
        node = Spatializer3DNode(position=(0.0, 0.0, -1.0))
        proc = node.activate(SR, F, 1, 2)
        state = proc.init_state()
        x = np.ones((1, F), np.float32)
        out, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        node.set_position((3.0, 0.0, 0.0))  # jump to hard right
        out2, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        out2 = np.asarray(out2)
        deltas = np.abs(np.diff(out2[0]))
        assert deltas.max() < 0.05  # no zipper jump


class TestMeter:
    def test_passthrough_and_levels(self):
        node = DbMeterNode()
        proc = node.activate(SR, F, 2, 2)
        state = proc.init_state()
        import jax

        n_blocks = 400  # ~1.07 s ≫ the 125 ms RMS window
        t = np.arange(F * n_blocks, dtype=np.float32)
        sine = (0.5 * np.sin(2 * np.pi * 1000 / SR * t)).astype(np.float32)
        kernel = jax.jit(proc.kernel)  # compile once; 400 eager traces are slow
        params = proc.collect_params()
        for i in range(n_blocks):
            x = np.stack([sine[i * F : (i + 1) * F]] * 2)
            out, state, _ = kernel(
                params, state, jnp.asarray(x), jnp.zeros(2, bool), INFO
            )
        np.testing.assert_array_equal(np.asarray(out), x)  # passthrough
        reading = DbMeterNode.read(
            {"peak": state["peak"], "rms_sq": state["rms_sq"]}
        )
        # 0.5 peak = -6.02 dB; sine RMS = 0.3536 = -9.03 dB
        assert abs(reading["peak_db"][0] - (-6.02)) < 0.1
        assert abs(reading["rms_db"][0] - (-9.03)) < 0.3

    def test_silence_reads_floor(self):
        node = DbMeterNode()
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        reading = DbMeterNode.read(state)
        assert reading["peak_db"][0] == -100.0

    def test_sink_mode(self):
        node = DbMeterNode()
        proc = node.activate(SR, F, 2, 0)
        state = proc.init_state()
        x = rand(2)
        out, state, om = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(2, bool), INFO
        )
        assert np.asarray(out).shape == (0, F)
        assert float(np.asarray(state["peak"]).max()) > 0
