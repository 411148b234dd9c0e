"""Tests for the round-3 modulation/EQ/waveshaper node family:
WaveshaperNode, ParametricEQNode, ModDelayNode (chorus/flanger/vibrato),
TremoloNode — golden vs NumPy/scipy float64 references, chunk invariance,
silence-mask semantics, activation validation.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal

from firewheel_tpu.core.node import BlockInfo, NodeActivationError
from firewheel_tpu.nodes import (
    EQBand,
    FilterType,
    ModDelayNode,
    ParametricEQNode,
    TremoloNode,
    WaveshaperNode,
)

SR = 48000
F = 128
RNG = np.random.default_rng(31)
INFO = BlockInfo.make()


def rand(ch, frames):
    return (0.5 * RNG.standard_normal((ch, frames))).astype(np.float32)


def run_blocks(node, x, block, num_ch=None, sr=SR):
    """Stream x [ch, N] through the node kernel in `block`-frame blocks."""
    ch = x.shape[0] if num_ch is None else num_ch
    proc = node.activate(sr, block, ch, ch)
    state = proc.init_state()
    outs = []
    n = x.shape[1]
    assert n % block == 0
    for b in range(n // block):
        xb = jnp.asarray(x[:, b * block : (b + 1) * block])
        out, state, mask = proc.kernel(
            proc.collect_params(), state, xb, jnp.zeros((ch,), bool), INFO
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1), state


# ---------------------------------------------------------------------------
# Waveshaper
# ---------------------------------------------------------------------------


class TestWaveshaper:
    def _ref(self, curve, x):
        x = x.astype(np.float64)
        if curve == "tanh":
            return np.tanh(x)
        if curve == "atan":
            return (2.0 / np.pi) * np.arctan(x)
        if curve == "soft":
            t = np.clip(x, -1, 1)
            return 1.5 * t - 0.5 * t**3
        if curve == "hard":
            return np.clip(x, -1, 1)
        if curve == "fold":
            return np.abs(np.mod(x - 1.0, 4.0) - 2.0) - 1.0

    @pytest.mark.parametrize("curve", ["tanh", "atan", "soft", "hard", "fold"])
    def test_golden_all_curves(self, curve):
        x = 2.0 * rand(2, F)
        node = WaveshaperNode(curve, drive_db=12.0, output_db=-3.0, mix=0.7)
        out, _ = run_blocks(node, x, F)
        drive = 10.0 ** (12.0 / 20.0)
        og = 10.0 ** (-3.0 / 20.0)
        shaped = self._ref(curve, x * np.float32(drive))
        ref = (x + 0.7 * (shaped - x)) * og
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_fold_identity_inside_unit(self):
        x = np.linspace(-1, 1, F, dtype=np.float32)[None, :]
        node = WaveshaperNode("fold", mix=1.0)
        out, _ = run_blocks(node, x, F)
        np.testing.assert_allclose(out[0], x[0], atol=1e-6)

    def test_fold_reflects(self):
        x = np.array([[1.5, 2.0, 3.0, -1.5]], np.float32)
        x = np.pad(x, ((0, 0), (0, F - 4)))
        node = WaveshaperNode("fold", mix=1.0)
        out, _ = run_blocks(node, x, F)
        np.testing.assert_allclose(out[0, :4], [0.5, 0.0, -1.0, -0.5], atol=1e-6)

    def test_dc_block_removes_offset(self):
        # hard asymmetric drive on a biased input leaves DC; the blocker
        # must drain it (one-pole HP at ~20 Hz: settle a second)
        x = np.full((1, SR), 0.5, np.float32)
        node = WaveshaperNode("tanh", drive_db=18.0, dc_block=True)
        out, state = run_blocks(node, x, F)
        assert abs(out[0, -F:].mean()) < 2e-2
        # without the blocker the DC stays put
        node2 = WaveshaperNode("tanh", drive_db=18.0)
        out2, _ = run_blocks(node2, x, F)
        assert abs(out2[0, -F:].mean()) > 0.9

    def test_dc_block_matches_scalar_reference(self):
        x = rand(2, 4 * F)
        node = WaveshaperNode("soft", drive_db=6.0, dc_block=True)
        out, _ = run_blocks(node, x, F)
        # float64 scalar: shaped -> y[n] = dx[n] + R*y[n-1]
        drive = np.float32(10.0 ** (6.0 / 20.0))
        t = np.clip(x.astype(np.float64) * drive, -1, 1)
        shaped = 1.5 * t - 0.5 * t**3
        r = np.exp(-2 * np.pi * 20.0 / SR)
        ref = np.zeros_like(shaped)
        for c in range(2):
            xp = yp = 0.0
            for n in range(shaped.shape[1]):
                yp = shaped[c, n] - xp + r * yp
                xp = shaped[c, n]
                ref[c, n] = yp
        np.testing.assert_allclose(out, ref, atol=5e-5)

    def test_silence_passthrough_and_pruning_flag(self):
        node = WaveshaperNode("tanh")
        assert node.silence_transparent
        assert not WaveshaperNode("tanh", dc_block=True).silence_transparent
        proc = node.activate(SR, F, 2, 2)
        out, _, mask = proc.kernel(
            proc.collect_params(),
            proc.init_state(),
            jnp.ones((2, F)),
            jnp.ones((2,), bool),
            INFO,
        )
        assert bool(np.all(mask))
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_port_mismatch_rejected(self):
        with pytest.raises(NodeActivationError):
            WaveshaperNode().activate(SR, F, 2, 1)


# ---------------------------------------------------------------------------
# Parametric EQ
# ---------------------------------------------------------------------------


def _coeff_arrays(node, proc):
    """The f32 coefficient set the kernel uses, as float64 sos rows."""
    from firewheel_tpu.nodes.filter import _BUILDERS

    rows = []
    for b in node._bands:
        c = _BUILDERS[b.band_type](b.frequency_hz, b.q, b.gain_db, SR)
        b0, b1, b2, a1, a2 = (np.float64(np.asarray(v, np.float32)) for v in c)
        rows.append([b0, b1, b2, 1.0, a1, a2])
    return np.asarray(rows)


class TestParametricEQ:
    def test_golden_vs_sosfilt(self):
        node = ParametricEQNode(
            [
                EQBand(FilterType.LOW_SHELF, 150.0, 0.8, 4.0),
                EQBand(FilterType.PEAKING, 900.0, 1.5, -6.0),
                EQBand(FilterType.PEAKING, 3200.0, 2.0, 3.0),
                EQBand(FilterType.HIGH_SHELF, 9000.0, 0.7, -2.5),
            ]
        )
        x = rand(2, 8 * F)
        out, _ = run_blocks(node, x, F)
        proc = node.activate(SR, F, 2, 2)
        sos = _coeff_arrays(node, proc)
        ref = scipy.signal.sosfilt(sos, x.astype(np.float64), axis=1)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_default_strip_runs(self):
        node = ParametricEQNode()
        assert node.num_bands() == 4
        x = rand(2, 2 * F)
        out, _ = run_blocks(node, x, F)
        assert np.isfinite(out).all()

    def test_all_disabled_is_identity(self):
        node = ParametricEQNode()
        for i in range(node.num_bands()):
            node.set_enabled(i, False)
        x = rand(2, 2 * F)
        out, _ = run_blocks(node, x, F)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_disabled_band_matches_missing_band(self):
        bands = [
            EQBand(FilterType.PEAKING, 500.0, 1.0, 6.0),
            EQBand(FilterType.PEAKING, 2000.0, 1.0, -9.0),
        ]
        full = ParametricEQNode([EQBand(**vars(b)) for b in bands])
        full.set_enabled(1, False)
        solo = ParametricEQNode([EQBand(**vars(bands[0]))])
        x = rand(1, 4 * F)
        out_full, _ = run_blocks(full, x, F)
        out_solo, _ = run_blocks(solo, x, F)
        np.testing.assert_allclose(out_full, out_solo, atol=1e-6)

    def test_live_param_sweep_no_reset(self):
        node = ParametricEQNode([EQBand(FilterType.PEAKING, 1000.0, 1.0, 0.0)])
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        x = rand(1, F)
        out0, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        node.set_band(0, gain_db=12.0, frequency_hz=800.0, q=2.0)
        out1, state, _ = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x), jnp.zeros(1, bool), INFO
        )
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_peak_boost_amplifies_tone(self):
        node = ParametricEQNode([EQBand(FilterType.PEAKING, 1000.0, 1.0, 12.0)])
        t = np.arange(SR // 2) / SR
        x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None, :]
        x = x[:, : (x.shape[1] // F) * F]
        out, _ = run_blocks(node, x, F)
        tail = out[0, -4 * F :]
        gain = np.abs(tail).max()
        assert 3.5 < gain < 4.5  # +12 dB ~ 3.98x

    def test_chunk_invariance(self):
        node = ParametricEQNode()
        node.set_band(0, gain_db=5.0)
        node.set_band(3, gain_db=-4.0)
        x = rand(2, 4 * F)
        a, _ = run_blocks(node, x, F)
        b, _ = run_blocks(node, x, F // 2)
        # different block sizes build different associative-scan
        # composition trees; f32 rounding differs by ~1e-5 per section,
        # amplified through the 4-band cascade (same class as the
        # single-section 1e-5 in test_dsp_ops block-splitting)
        np.testing.assert_allclose(a, b, atol=2e-4)

    def test_silence_gate(self):
        node = ParametricEQNode()
        proc = node.activate(SR, F, 2, 2)
        out, _, mask = proc.kernel(
            proc.collect_params(),
            proc.init_state(),
            jnp.zeros((2, F)),
            jnp.ones((2,), bool),
            INFO,
        )
        assert bool(np.all(mask))
        np.testing.assert_array_equal(np.asarray(out), 0.0)


# ---------------------------------------------------------------------------
# ModDelay: chorus / flanger / vibrato
# ---------------------------------------------------------------------------


class TestModDelay:
    def test_zero_depth_is_pure_delay(self):
        d = 64
        node = ModDelayNode(
            rate_hz=1.0,
            base_delay_secs=d / SR,
            depth_secs=0.0,
            mix=1.0,
            phase_spread=0.0,
        )
        x = rand(2, 4 * F)
        out, _ = run_blocks(node, x, F)
        np.testing.assert_allclose(out[:, d:], x[:, :-d], atol=1e-6)
        np.testing.assert_allclose(out[:, :d], 0.0, atol=1e-6)

    def test_chunk_invariance_no_feedback(self):
        node_a = ModDelayNode.chorus()
        node_b = ModDelayNode.chorus()
        x = rand(2, 8 * F)
        a, _ = run_blocks(node_a, x, F)
        b, _ = run_blocks(node_b, x, F // 4)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_chunk_invariance_feedback(self):
        mk = lambda: ModDelayNode.flanger(feedback=0.6)
        x = rand(2, 8 * F)
        a, _ = run_blocks(mk(), x, F)
        b, _ = run_blocks(mk(), x, F // 2)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_tiny_line_feedback_stays_exact(self):
        """Regression (round-3 review): a feedback node whose requested
        max delay is shorter than the SUB+1 exactness floor must grow its
        line rather than silently inverting the base clamp (np.clip with
        lo > hi returns hi) and tapping out of bounds."""
        mk = lambda: ModDelayNode(
            rate_hz=0.5, base_delay_secs=0.0004, depth_secs=0.0,
            mix=0.7, phase_spread=0.0, feedback=0.5,
            max_delay_secs=0.0005,
        )
        # the clamp must be well-ordered: base in [SUB+1, w-2]
        proc = mk().activate(SR, F, 1, 1)
        p = proc.collect_params()
        assert 33.0 <= float(p["base"]) <= proc._window - 2
        x = rand(1, 8 * F)
        a, _ = run_blocks(mk(), x, F)
        b, _ = run_blocks(mk(), x, F // 2)
        assert np.all(np.isfinite(a))
        np.testing.assert_allclose(a, b, atol=1e-5)  # still chunk-exact

    def test_feedback_matches_scalar_reference(self):
        # depth 0: fixed integer delay D with recirculation
        # w[n] = x[n] + fb*w[n-D]; y = x + mix*(w[n-D] - x)
        D, fb, mix = 48, 0.5, 0.8
        node = ModDelayNode(
            rate_hz=0.0,
            base_delay_secs=D / SR,
            depth_secs=0.0,
            mix=mix,
            phase_spread=0.0,
            feedback=fb,
        )
        x = rand(1, 8 * F)
        out, _ = run_blocks(node, x, F)
        n = x.shape[1]
        w = np.zeros(n, np.float64)
        xd = x[0].astype(np.float64)
        for i in range(n):
            w[i] = xd[i] + fb * (w[i - D] if i >= D else 0.0)
        tap = np.concatenate([np.zeros(D), w[:-D]])
        ref = xd + mix * (tap - xd)
        np.testing.assert_allclose(out[0], ref, atol=1e-4)

    def test_vibrato_preserves_rms(self):
        # vibrato is 100% wet resampled audio: long-run RMS is preserved
        node = ModDelayNode.vibrato(rate_hz=5.0, depth_secs=0.002)
        t = np.arange(SR // 2) / SR
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None, :]
        x = x[:, : (x.shape[1] // F) * F]
        out, _ = run_blocks(node, x, F)
        settle = 4096
        rms_in = np.sqrt(np.mean(x[0, settle:] ** 2))
        rms_out = np.sqrt(np.mean(out[0, settle:] ** 2))
        assert abs(rms_out - rms_in) / rms_in < 0.05

    def test_chorus_detunes(self):
        # a swept tap frequency-modulates: the output spectrum of a pure
        # tone grows sidebands (energy off the carrier bin)
        node = ModDelayNode.chorus(rate_hz=2.0, depth_secs=0.004, mix=1.0)
        t = np.arange(SR) / SR
        x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None, :]
        x = x[:, : (x.shape[1] // F) * F]
        out, _ = run_blocks(node, x, F)
        seg = out[0, -SR // 2 :]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        freqs = np.fft.rfftfreq(len(seg), 1 / SR)
        carrier = spec[np.argmin(np.abs(freqs - 1000.0))]
        off = (np.abs(freqs - 1000.0) > 20.0) & (np.abs(freqs - 1000.0) < 200.0)
        assert spec[off].max() > 0.01 * carrier

    def test_feedback_setter_gating(self):
        node = ModDelayNode.chorus()
        with pytest.raises(ValueError):
            node.set_feedback(0.3)
        f = ModDelayNode.flanger()
        f.set_feedback(-0.4)
        assert f._feedback == pytest.approx(-0.4)

    def test_silence_with_quiet_line(self):
        node = ModDelayNode.chorus()
        proc = node.activate(SR, F, 2, 2)
        out, state, mask = proc.kernel(
            proc.collect_params(),
            proc.init_state(),
            jnp.zeros((2, F)),
            jnp.ones((2,), bool),
            INFO,
        )
        assert bool(np.all(mask))
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_tail_drains_after_input_stops(self):
        node = ModDelayNode.chorus(mix=1.0)
        proc = node.activate(SR, F, 1, 1)
        state = proc.init_state()
        x = jnp.asarray(rand(1, F))
        _, state, _ = proc.kernel(
            proc.collect_params(), state, x, jnp.zeros(1, bool), INFO
        )
        # input goes silent but the line still holds audio: not silent
        out, state, mask = proc.kernel(
            proc.collect_params(), state, jnp.zeros((1, F)), jnp.ones(1, bool), INFO
        )
        assert not bool(np.all(mask))

    def test_port_mismatch_rejected(self):
        with pytest.raises(NodeActivationError):
            ModDelayNode.chorus().activate(SR, F, 2, 1)


# ---------------------------------------------------------------------------
# Tremolo / ring mod
# ---------------------------------------------------------------------------


class TestTremolo:
    def _phases(self, n, rate, ch, spread):
        t = np.arange(1, n + 1, dtype=np.float64) * (rate / SR)
        offs = spread * np.arange(ch) / max(ch, 1)
        return np.mod(t[None, :] + offs[:, None], 1.0)

    def test_golden_unipolar(self):
        node = TremoloNode(rate_hz=6.0, depth=0.7, phase_spread=0.5)
        x = rand(2, 4 * F)
        out, _ = run_blocks(node, x, F)
        ph = self._phases(x.shape[1], 6.0, 2, 0.5)
        g = 1.0 - 0.7 * (0.5 - 0.5 * np.cos(2 * np.pi * ph))
        np.testing.assert_allclose(out, x * g, atol=1e-4)

    def test_ring_mod_full_depth(self):
        node = TremoloNode(rate_hz=200.0, depth=1.0, bipolar=True)
        x = rand(1, 4 * F)
        out, _ = run_blocks(node, x, F)
        ph = self._phases(x.shape[1], 200.0, 1, 0.0)
        np.testing.assert_allclose(out, x * np.cos(2 * np.pi * ph), atol=1e-4)

    def test_chunk_invariance(self):
        x = rand(2, 4 * F)
        a, _ = run_blocks(TremoloNode(rate_hz=3.0, depth=0.9), x, F)
        b, _ = run_blocks(TremoloNode(rate_hz=3.0, depth=0.9), x, F // 4)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_silence_transparent(self):
        assert TremoloNode.silence_transparent
