"""Golden-output tests: every node kernel vs the scalar CPU reference
(``reference_dsp.py``), on random inputs and silence-mask combinations.
Tolerance: 1e-6 absolute (the engine's numeric contract, BASELINE.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.nodes import (
    BeepTestNode,
    HardClipNode,
    MonoToStereoNode,
    StereoToMonoNode,
    SumNode,
    VolumeNode,
)
from firewheel_tpu.nodes.beep_test import phase_inc_fixed
import reference_dsp as ref

SR = 48000
F = 128
RNG = np.random.default_rng(42)
INFO = BlockInfo.make()


def rand_inputs(ch, frames=F, mask=None):
    x = RNG.standard_normal((ch, frames)).astype(np.float32)
    if mask is None:
        mask = np.zeros(ch, bool)
    x[mask] = 0.0
    return x, np.asarray(mask, bool)


class TestBeep:
    def test_tone_matches_golden(self):
        node = BeepTestNode(440.0, -12.0, True)
        proc = node.activate(SR, F, 0, 2)
        state = proc.init_state()
        phase_q = 0
        empty = jnp.zeros((0, F), jnp.float32)
        emask = jnp.zeros((0,), bool)
        for blk in range(4):
            out, state, om = proc.kernel(
                proc.collect_params(), state, empty, emask, INFO
            )
            rout, phase_q, rom = ref.ref_beep(
                phase_q, True, proc._node.gain, phase_inc_fixed(proc._node.freq_hz, SR), 2, F
            )
            np.testing.assert_allclose(np.asarray(out), rout, atol=1e-6, rtol=0)
            assert int(state["phase"]) == phase_q
            assert not np.asarray(om).any()

    def test_disabled_is_silent(self):
        node = BeepTestNode(440.0, -12.0, False)
        proc = node.activate(SR, F, 0, 2)
        state = proc.init_state()
        out, state2, om = proc.kernel(
            proc.collect_params(),
            state,
            jnp.zeros((0, F), jnp.float32),
            jnp.zeros((0,), bool),
            INFO,
        )
        assert (np.asarray(out) == 0).all()
        assert np.asarray(om).all()
        # phasor frozen while disabled
        assert int(state2["phase"]) == int(state["phase"])

    def test_clamps(self):
        # beep_test.rs:16-17
        n = BeepTestNode(5.0, 12.0)
        assert n.freq_hz == 20.0 and n.gain == 1.0
        n = BeepTestNode(99999.0, -200.0)
        assert n.freq_hz == 20000.0 and n.gain == 0.0


class TestVolume:
    def run_both(self, percent, inputs, mask, blocks=3):
        node = VolumeNode(percent)
        proc = node.activate(SR, F, 2, 2)
        state = proc.init_state()
        rstate = ref.ref_smoother_init(node.raw_gain())
        outs, routs = [], []
        for _ in range(blocks):
            p = proc.collect_params()
            out, state, om = proc.kernel(
                p, state, jnp.asarray(inputs), jnp.asarray(mask), INFO
            )
            rout, rstate, rom = ref.ref_volume(
                rstate, node.raw_gain(), inputs, mask, SR
            )
            outs.append((np.asarray(out), np.asarray(om)))
            routs.append((rout, rom))
        return outs, routs, node, proc, state, rstate

    def test_unity_passthrough(self):
        x, m = rand_inputs(2)
        outs, routs, *_ = self.run_both(100.0, x, m)
        for (o, om), (r, rom) in zip(outs, routs):
            np.testing.assert_allclose(o, r, atol=1e-6, rtol=0)
            np.testing.assert_array_equal(om, rom)
        np.testing.assert_allclose(outs[-1][0], x, atol=1e-6, rtol=0)

    def test_gain_change_ramps(self):
        x, m = rand_inputs(2)
        node = VolumeNode(100.0)
        proc = node.activate(SR, F, 2, 2)
        state = proc.init_state()
        rstate = ref.ref_smoother_init(node.raw_gain())
        for blk in range(6):
            if blk == 2:
                node.set_percent_volume(50.0)
            p = proc.collect_params()
            out, state, om = proc.kernel(
                p, state, jnp.asarray(x), jnp.asarray(m), INFO
            )
            rout, rstate, rom = ref.ref_volume(rstate, node.raw_gain(), x, m, SR)
            np.testing.assert_allclose(
                np.asarray(out), rout, atol=1e-6, rtol=0, err_msg=f"block {blk}"
            )

    def test_all_silent_resets_smoother(self):
        x = np.zeros((2, F), np.float32)
        m = np.ones(2, bool)
        node = VolumeNode(100.0)
        proc = node.activate(SR, F, 2, 2)
        state = proc.init_state()
        node.set_percent_volume(10.0)
        out, state, om = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.asarray(m), INFO
        )
        assert (np.asarray(out) == 0).all()
        assert np.asarray(om).all()
        # smoother was reset to the new gain: no ramp on the next loud block
        x2, m2 = rand_inputs(2)
        out2, state, om2 = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x2), jnp.asarray(m2), INFO
        )
        expected = x2 * np.float32(node.raw_gain())
        np.testing.assert_allclose(np.asarray(out2), expected, atol=1e-6, rtol=0)

    def test_muted_outputs_silence(self):
        x, m = rand_inputs(2)
        outs, routs, *_ = self.run_both(0.0, x, m)
        for (o, om), (r, rom) in zip(outs, routs):
            assert (o == 0).all()
            assert om.all()
            np.testing.assert_array_equal(o, r)

    def test_per_channel_silence(self):
        m = np.array([True, False])
        x, m = rand_inputs(2, mask=m)
        outs, routs, *_ = self.run_both(75.0, x, m)
        for (o, om), (r, rom) in zip(outs, routs):
            np.testing.assert_allclose(o, r, atol=1e-6, rtol=0)
            np.testing.assert_array_equal(om, rom)
            assert (o[0] == 0).all()


class TestSum:
    @pytest.mark.parametrize("n,m", [(2, 2), (4, 2), (6, 2), (8, 2), (3, 1), (8, 4)])
    def test_matches_golden(self, n, m):
        mask = RNG.random(n) < 0.3
        x, mask = rand_inputs(n, mask=mask)
        proc = SumNode().activate(SR, F, n, m)
        out, _, om = proc.kernel((), (), jnp.asarray(x), jnp.asarray(mask), INFO)
        rout, rom = ref.ref_sum(x, mask, m)
        np.testing.assert_allclose(np.asarray(out), rout, atol=1e-6, rtol=0)
        np.testing.assert_array_equal(np.asarray(om), rom)

    def test_all_silent(self):
        x = np.zeros((4, F), np.float32)
        mask = np.ones(4, bool)
        proc = SumNode().activate(SR, F, 4, 2)
        out, _, om = proc.kernel((), (), jnp.asarray(x), jnp.asarray(mask), INFO)
        assert (np.asarray(out) == 0).all() and np.asarray(om).all()

    def test_invalid_ratio_fails(self):
        from firewheel_tpu.core.node import NodeActivationError

        with pytest.raises(NodeActivationError):
            SumNode().activate(SR, F, 3, 2)


class TestHardClip:
    def test_matches_golden(self):
        node = HardClipNode(-6.0)
        proc = node.activate(SR, F, 2, 2)
        x, m = rand_inputs(2, mask=np.array([False, True]))
        x = (x * 3).astype(np.float32)
        out, st, om = proc.kernel(
            proc.collect_params(), proc.init_state(), jnp.asarray(x),
            jnp.asarray(m), INFO
        )
        rout, rom = ref.ref_hard_clip(x, m, node.threshold_gain)
        # the clip counter saw only the audible channel's clipped samples
        expected_clips = int(np.sum(np.abs(x[0]) > node.threshold_gain))
        assert int(st["clip_count"]) == expected_clips
        np.testing.assert_allclose(np.asarray(out), rout, atol=1e-6, rtol=0)
        np.testing.assert_array_equal(np.asarray(om), rom)
        assert np.abs(np.asarray(out)).max() <= node.threshold_gain


class TestChannelAdapters:
    def test_mono_to_stereo(self):
        proc = MonoToStereoNode().activate(SR, F, 1, 2)
        x, m = rand_inputs(1)
        out, _, om = proc.kernel((), (), jnp.asarray(x), jnp.asarray(m), INFO)
        rout, rom = ref.ref_mono_to_stereo(x, m)
        np.testing.assert_array_equal(np.asarray(out), rout)
        np.testing.assert_array_equal(np.asarray(om), rom)

    def test_mono_to_stereo_silent(self):
        proc = MonoToStereoNode().activate(SR, F, 1, 2)
        x = np.zeros((1, F), np.float32)
        m = np.ones(1, bool)
        out, _, om = proc.kernel((), (), jnp.asarray(x), jnp.asarray(m), INFO)
        assert (np.asarray(out) == 0).all() and np.asarray(om).all()

    def test_stereo_to_mono(self):
        proc = StereoToMonoNode().activate(SR, F, 2, 1)
        x, m = rand_inputs(2)
        out, _, om = proc.kernel((), (), jnp.asarray(x), jnp.asarray(m), INFO)
        rout, rom = ref.ref_stereo_to_mono(x, m)
        np.testing.assert_allclose(np.asarray(out), rout, atol=1e-6, rtol=0)
        np.testing.assert_array_equal(np.asarray(om), rom)
