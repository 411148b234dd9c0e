"""MXU direct-convolution engine + FIR node golden tests.

Covers ``ops/direct_conv.py`` (streaming time-domain convolution — the
MXU-path alternative to the partitioned-FFT engine) and ``nodes/fir.py``
(arbitrary-taps FIR node + windowed-sinc designs), plus the
``ConvolutionReverbNode(method=...)`` engine selection.

Golden semantics: the exact FIR sum ``y[t] = Σ_k h[k]·x[t-k]`` evaluated
by ``np.convolve`` in float64, truncated to f32 — the direct engine is the
literal sum, so tolerances are tight (1e-6); the FFT engine carries
transform round-off (~1e-5 on long IRs).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.nodes import ConvolutionReverbNode, FirFilterNode
from firewheel_tpu.nodes.fir import design_windowed_sinc
from firewheel_tpu.ops.direct_conv import (
    DIRECT_CONV_MAX_TAPS,
    direct_conv_step,
    direct_hist_init,
)

RNG = np.random.default_rng(42)


def np_streaming_conv(x, ir):
    """float64 reference: full convolution truncated to len(x) outputs."""
    ch = x.shape[0]
    irch = ir.shape[0]
    out = np.zeros_like(x, dtype=np.float64)
    for c in range(ch):
        h = ir[0] if irch == 1 else ir[c]
        out[c] = np.convolve(x[c].astype(np.float64), h.astype(np.float64))[
            : x.shape[-1]
        ]
    return out.astype(np.float32)


class TestDirectConvStep:
    @pytest.mark.parametrize("taps,irch", [(17, 1), (64, 2), (300, 1)])
    def test_streaming_matches_convolve(self, taps, irch):
        ch, total = 2, 512
        x = RNG.standard_normal((ch, total)).astype(np.float32)
        ir = RNG.standard_normal((irch, taps)).astype(np.float32) * 0.3

        hist = jnp.asarray(direct_hist_init(ch, taps))
        ir_j = jnp.asarray(ir)
        outs = []
        # mixed hops, including hop 1 and a big hop
        hops = [128, 1, 37, 64, 128, 128, 26]
        pos = 0
        for n in hops:
            y, hist = direct_conv_step(jnp.asarray(x[:, pos:pos + n]), hist, ir_j)
            outs.append(np.asarray(y))
            pos += n
        got = np.concatenate(outs, axis=-1)
        want = np_streaming_conv(x[:, :pos], ir)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)

    def test_single_tap(self):
        x = RNG.standard_normal((2, 64)).astype(np.float32)
        ir = np.asarray([[0.5]], np.float32)
        hist = jnp.asarray(direct_hist_init(2, 1))
        y, hist2 = direct_conv_step(jnp.asarray(x), hist, jnp.asarray(ir))
        np.testing.assert_allclose(np.asarray(y), 0.5 * x, atol=0)
        assert hist2.shape == (2, 0)

    def test_identity_impulse(self):
        """A delta IR passes the signal through exactly (bit-exact)."""
        x = RNG.standard_normal((1, 256)).astype(np.float32)
        ir = np.zeros((1, 100), np.float32)
        ir[0, 0] = 1.0
        hist = jnp.asarray(direct_hist_init(1, 100))
        y1, hist = direct_conv_step(jnp.asarray(x[:, :128]), hist, jnp.asarray(ir))
        y2, _ = direct_conv_step(jnp.asarray(x[:, 128:]), hist, jnp.asarray(ir))
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        np.testing.assert_array_equal(got, x)


def _run_node(node, x, block=128):
    proc = node.activate(48000, block, x.shape[0], x.shape[0])
    state = proc.init_state()
    params = proc.collect_params()
    outs = []
    info = BlockInfo(
        stream_time_secs=jnp.float32(0.0),
        stream_sample=jnp.zeros((), jnp.uint32),
        stream_status=jnp.zeros((), jnp.uint32),
    )
    mask = jnp.zeros((x.shape[0],), bool)
    for i in range(0, x.shape[-1], block):
        y, state, om = proc.kernel(
            params, state, jnp.asarray(x[:, i:i + block]), mask, info
        )
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


class TestReverbEngines:
    def _ir(self, ch, n):
        ir = RNG.standard_normal((ch, n)).astype(np.float32)
        ir *= np.exp(-np.arange(n, dtype=np.float32) / (n / 4))
        return ir / np.abs(ir).sum(axis=-1, keepdims=True)

    @pytest.mark.parametrize("irch", [1, 2])
    def test_direct_matches_reference(self, irch):
        ir = self._ir(irch, 700)
        x = RNG.standard_normal((2, 1024)).astype(np.float32)
        node = ConvolutionReverbNode(ir, wet=1.0, dry=0.0, method="direct")
        got = _run_node(node, x)
        # capacity pads the IR to a partition multiple; zeros don't change y
        want = np_streaming_conv(x, ir)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)

    def test_engines_agree(self):
        ir = self._ir(2, 900)
        x = RNG.standard_normal((2, 1024)).astype(np.float32)
        y_d = _run_node(
            ConvolutionReverbNode(ir, wet=0.4, dry=0.8, method="direct"), x
        )
        y_f = _run_node(
            ConvolutionReverbNode(ir, wet=0.4, dry=0.8, method="fft"), x
        )
        np.testing.assert_allclose(y_d, y_f, atol=5e-5, rtol=0)

    def test_auto_selection(self):
        short = ConvolutionReverbNode(self._ir(1, 256), method="auto")
        proc = short.activate(48000, 128, 2, 2)
        assert proc._method == "direct"
        long_ir = ConvolutionReverbNode(
            self._ir(1, DIRECT_CONV_MAX_TAPS + 1), method="auto"
        )
        proc = long_ir.activate(48000, 128, 2, 2)
        assert proc._method == "fft"

    def test_direct_silence_mask_rings_then_clears(self):
        ir = self._ir(1, 256)
        node = ConvolutionReverbNode(ir, wet=1.0, dry=0.0, method="direct")
        proc = node.activate(48000, 128, 1, 1)
        state = proc.init_state()
        params = proc.collect_params()
        info = BlockInfo(
            stream_time_secs=jnp.float32(0.0),
            stream_sample=jnp.zeros((), jnp.uint32),
            stream_status=jnp.zeros((), jnp.uint32),
        )
        x = jnp.ones((1, 128), jnp.float32)
        sil = jnp.zeros((1, 128), jnp.float32)
        # fresh line + silent input -> silent out
        y, state, om = proc.kernel(
            params, state, sil, jnp.ones((1,), bool), info
        )
        assert bool(om[0]) and float(jnp.abs(y).max()) == 0.0
        # audible input -> not silent
        y, state, om = proc.kernel(
            params, state, x, jnp.zeros((1,), bool), info
        )
        assert not bool(om[0])
        # silent input but the tail still rings (hist nonzero)
        y, state, om = proc.kernel(
            params, state, sil, jnp.ones((1,), bool), info
        )
        assert not bool(om[0])
        assert float(jnp.abs(y).max()) > 0.0


class TestFirFilterNode:
    def test_streaming_matches_convolve(self):
        taps = RNG.standard_normal((2, 65)).astype(np.float32) * 0.2
        x = RNG.standard_normal((2, 640)).astype(np.float32)
        got = _run_node(FirFilterNode(taps, gain=0.5), x)
        want = 0.5 * np_streaming_conv(x, taps)
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)

    def test_lowpass_design_response(self):
        """Windowed-sinc lowpass: ~unit gain in-band, strong stopband."""
        sr = 48000
        h = design_windowed_sinc("lowpass", 129, sr, 2000.0)
        w = np.fft.rfft(h, 8192)
        f = np.fft.rfftfreq(8192, 1 / sr)
        passband = np.abs(w[f < 1000])
        stopband = np.abs(w[f > 5000])
        assert np.all(np.abs(passband - 1.0) < 0.01)
        assert np.all(stopband < 10 ** (-40 / 20))  # >40 dB down

    def test_highpass_design_response(self):
        sr = 48000
        h = design_windowed_sinc("highpass", 129, sr, 4000.0)
        w = np.fft.rfft(h, 8192)
        f = np.fft.rfftfreq(8192, 1 / sr)
        assert np.all(np.abs(np.abs(w[f > 8000]) - 1.0) < 0.01)
        assert np.all(np.abs(w[f < 1500]) < 10 ** (-40 / 20))

    def test_bandpass_design_response(self):
        sr = 48000
        h = design_windowed_sinc("bandpass", 129, sr, (1000.0, 3000.0))
        w = np.fft.rfft(h, 8192)
        f = np.fft.rfftfreq(8192, 1 / sr)
        center = np.abs(w[np.argmin(np.abs(f - 2000.0))])
        assert abs(center - 1.0) < 0.02
        assert np.all(np.abs(w[f < 200]) < 10 ** (-35 / 20))
        assert np.all(np.abs(w[f > 10000]) < 10 ** (-35 / 20))

    def test_linear_phase_delay(self):
        """An impulse through a symmetric FIR peaks at (N-1)/2 samples."""
        h = design_windowed_sinc("lowpass", 63, 48000, 8000.0)
        x = np.zeros((1, 256), np.float32)
        x[0, 10] = 1.0
        y = _run_node(FirFilterNode(h), x)
        assert np.argmax(np.abs(y[0])) == 10 + 31

    def test_live_tap_swap_same_length(self):
        node = FirFilterNode(np.zeros(9, np.float32))
        proc = node.activate(48000, 128, 1, 1)
        delta = np.zeros(9, np.float32)
        delta[0] = 1.0
        node.set_taps(delta)
        params = proc.collect_params()
        np.testing.assert_array_equal(
            np.asarray(params["taps"]), delta[None]
        )
        # changed length -> loud error, not wrong shapes
        node.set_taps(np.zeros(17, np.float32))
        with pytest.raises(ValueError, match="length changed"):
            proc.collect_params()

    def test_activation_errors(self):
        from firewheel_tpu.core.node import NodeActivationError

        with pytest.raises(NodeActivationError, match="num_inputs"):
            FirFilterNode(np.zeros(9, np.float32)).activate(48000, 128, 2, 1)
        with pytest.raises(NodeActivationError, match="channels"):
            FirFilterNode(np.zeros((3, 9), np.float32)).activate(
                48000, 128, 2, 2
            )

    def test_design_validation(self):
        with pytest.raises(ValueError, match="odd num_taps"):
            design_windowed_sinc("highpass", 64, 48000, 1000.0)
        with pytest.raises(ValueError, match="unknown design kind"):
            design_windowed_sinc("comb", 65, 48000, 1000.0)
