"""BinauralSpatializerNode: structural-HRTF cue tests.

The model is parametric (Woodworth ITD + Brown–Duda shadow — see
nodes/binaural.py), so the goldens are the model's *defining properties*
measured from rendered audio: delay difference between ears matches the
ray formula, the shadow section has exactly unit DC gain and α Nyquist
gain, center sources are bit-symmetric, and block chunking is invariant.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo, NodeActivationError
from firewheel_tpu.nodes import BinauralSpatializerNode
from firewheel_tpu.nodes.binaural import (
    _SPEED_OF_SOUND,
    _itd_seconds,
    _shadow_coeffs,
)

SR = 48000
HEAD = 0.0875


def _render(node, x, block=128):
    proc = node.activate(SR, block, 1, 2)
    state = proc.init_state()
    params = proc.collect_params()
    info = BlockInfo(
        stream_time_secs=jnp.float32(0.0),
        stream_sample=jnp.zeros((), jnp.uint32),
        stream_status=jnp.zeros((), jnp.uint32),
    )
    outs = []
    for i in range(0, x.shape[-1], block):
        y, state, om = proc.kernel(
            params, state, jnp.asarray(x[:, i:i + block]),
            jnp.zeros((1,), bool), info,
        )
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


class TestITD:
    def test_hard_right_delay_matches_woodworth(self):
        """Impulse onset difference == the Woodworth delay difference.

        Onset (first nonzero sample) is used rather than cross-correlation:
        the contralateral shadow filter is a strong lowpass whose group
        delay would bias a correlation estimate, but it is causal with
        b0 != 0, so onsets measure the ITD gather exactly.
        """
        node = BinauralSpatializerNode(position=(2.0, 0.0, 0.0), rolloff=0.0)
        x = np.zeros((1, 256), np.float32)
        x[0, 10] = 1.0
        y = _render(node, x)
        onset_r = int(np.argmax(np.abs(y[1]) > 1e-9))
        onset_l = int(np.argmax(np.abs(y[0]) > 1e-9))
        want = (
            _itd_seconds(-1.0, HEAD) - _itd_seconds(1.0, HEAD)
        ) * SR  # left lags right by a/c(1+pi/2)
        assert want == pytest.approx(
            HEAD / _SPEED_OF_SOUND * (1 + math.pi / 2) * SR
        )
        got = onset_l - onset_r
        assert abs(got - want) <= 1.5, (got, want)

    def test_center_is_bit_symmetric(self):
        node = BinauralSpatializerNode(position=(0.0, 0.0, -1.5))
        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 512)).astype(np.float32)
        y = _render(node, x)
        np.testing.assert_array_equal(y[0], y[1])

    def test_overhead_is_symmetric(self):
        node = BinauralSpatializerNode(position=(0.0, 3.0, 0.0))
        x = np.zeros((1, 512), np.float32)
        x[0, 7] = 1.0
        y = _render(node, x)
        np.testing.assert_array_equal(y[0], y[1])


class TestILD:
    def test_high_freq_shadow(self):
        """8 kHz from hard right: right ear clearly louder."""
        node = BinauralSpatializerNode(position=(1.0, 0.0, 0.0), rolloff=0.0)
        t = np.arange(4096) / SR
        x = np.sin(2 * np.pi * 8000.0 * t).astype(np.float32)[None]
        y = _render(node, x)
        tail = slice(1024, None)  # past the filter transient
        rms_r = y[1, tail].std()
        rms_l = y[0, tail].std()
        assert rms_r > 1.5 * rms_l, (rms_r, rms_l)

    def test_low_freq_nearly_equal(self):
        """200 Hz diffracts around the head: ILD within ~2 dB."""
        node = BinauralSpatializerNode(position=(1.0, 0.0, 0.0), rolloff=0.0)
        t = np.arange(8192) / SR
        x = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)[None]
        y = _render(node, x)
        tail = slice(2048, None)
        ratio = y[1, tail].std() / y[0, tail].std()
        assert ratio < 10 ** (2.0 / 20.0), ratio


class TestShadowSection:
    @pytest.mark.parametrize("cos_theta", [-1.0, -0.3, 0.0, 0.5, 1.0])
    def test_dc_and_nyquist_gains(self, cos_theta):
        b0, b1, a1 = _shadow_coeffs(cos_theta, HEAD, SR)
        alpha = 1.0 + cos_theta
        dc = (b0 + b1) / (1.0 + a1)
        nyq = (b0 - b1) / (1.0 - a1)
        assert dc == pytest.approx(1.0, abs=1e-6)
        assert nyq == pytest.approx(alpha, abs=1e-6)

    def test_scalar_recurrence_golden(self):
        """Rendered output matches the literal y=b0x+b1x'−a1y' recurrence
        composed with the ITD gather, evaluated in float64."""
        node = BinauralSpatializerNode(
            position=(0.6, 0.0, -0.8), ref_distance=10.0, rolloff=0.0
        )
        rng = np.random.default_rng(11)
        x = rng.standard_normal((1, 384)).astype(np.float32) * 0.25
        y = _render(node, x)

        proc = node.activate(SR, 128, 1, 2)
        p = proc.collect_params()
        gain = float(p["gain"])
        lp_b = float(p["lp_b"])
        ref = np.zeros((2, x.shape[-1]))
        # air lowpass
        xs = np.zeros(x.shape[-1])
        acc = 0.0
        for n in range(x.shape[-1]):
            acc = (1.0 - lp_b) * (gain * float(x[0, n])) + lp_b * acc
            xs[n] = acc
        for e, dkey in ((0, "del_l"), (1, "del_r")):
            delay = float(p[dkey])
            b0, b1, a1 = (float(v) for v in p["shadow"][e])
            # fractional delay (linear interp, zero history)
            xe = np.zeros(x.shape[-1])
            for n in range(x.shape[-1]):
                pos = n - delay
                i0 = math.floor(pos)
                w = pos - i0
                s0 = xs[i0] if i0 >= 0 else 0.0
                s1 = xs[i0 + 1] if i0 + 1 >= 0 else 0.0
                xe[n] = s0 + (s1 - s0) * w
            yp = 0.0
            xp = 0.0
            for n in range(x.shape[-1]):
                yp = b0 * xe[n] + b1 * xp - a1 * yp
                xp = xe[n]
                ref[e, n] = yp
        np.testing.assert_allclose(y, ref, atol=5e-5, rtol=0)


class TestStreaming:
    def test_block_size_invariance(self):
        node = BinauralSpatializerNode(position=(0.5, 0.2, -1.0))
        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 1024)).astype(np.float32)
        y1 = _render(
            BinauralSpatializerNode(position=(0.5, 0.2, -1.0)), x, block=256
        )
        y2 = _render(node, x, block=64)
        # the IIR scans compose at log-depth per block, so rounding order
        # differs with the chunking — same class as ops/iir's documented
        # block-carry tolerance
        np.testing.assert_allclose(y1, y2, atol=1e-4, rtol=0)

    def test_moving_emitter_is_click_free(self):
        """Sweep the source right→left mid-stream; the output stays
        bounded and has no sample-to-sample jumps beyond the signal's own
        scale (smoothed delay/gain = no zipper clicks)."""
        node = BinauralSpatializerNode(position=(1.0, 0.0, -1.0))
        proc = node.activate(SR, 128, 1, 2)
        state = proc.init_state()
        info = BlockInfo(
            stream_time_secs=jnp.float32(0.0),
            stream_sample=jnp.zeros((), jnp.uint32),
            stream_status=jnp.zeros((), jnp.uint32),
        )
        t = np.arange(128) / SR
        outs = []
        for i in range(24):
            node.set_position((1.0 - i / 12.0, 0.0, -1.0))
            params = proc.collect_params()
            x = np.sin(
                2 * np.pi * 440.0 * (t + i * 128 / SR)
            ).astype(np.float32)[None]
            y, state, _ = proc.kernel(
                params, state, jnp.asarray(x), jnp.zeros((1,), bool), info
            )
            outs.append(np.asarray(y))
        y = np.concatenate(outs, axis=-1)
        assert np.all(np.isfinite(y))
        # 440 Hz at 48 kHz moves <= 0.0576 peak-to-peak per sample; allow
        # 3x headroom for the moving cues
        assert np.max(np.abs(np.diff(y, axis=-1))) < 0.18

    def test_silence_resets_and_masks(self):
        node = BinauralSpatializerNode(position=(0.3, 0.0, -1.0))
        proc = node.activate(SR, 128, 1, 2)
        state = proc.init_state()
        params = proc.collect_params()
        info = BlockInfo(
            stream_time_secs=jnp.float32(0.0),
            stream_sample=jnp.zeros((), jnp.uint32),
            stream_status=jnp.zeros((), jnp.uint32),
        )
        sil = jnp.zeros((1, 128), jnp.float32)
        y, state, om = proc.kernel(params, state, sil, jnp.ones((1,), bool), info)
        assert bool(om[0]) and bool(om[1])
        assert float(jnp.abs(y).max()) == 0.0
        # audible block -> active; then silent input still rings the lines
        x = jnp.ones((1, 128), jnp.float32)
        y, state, om = proc.kernel(params, state, x, jnp.zeros((1,), bool), info)
        assert not bool(om[0])
        y, state, om = proc.kernel(params, state, sil, jnp.ones((1,), bool), info)
        assert not bool(om[0])


def test_activation_errors():
    with pytest.raises(NodeActivationError, match="1 \\(mono\\) input"):
        BinauralSpatializerNode().activate(SR, 128, 2, 2)


def test_batched_instances_match_single():
    """BatchRenderer over binaural graphs: every instance bit-matches the
    single render (the node is vmap-safe end to end)."""
    from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
    from firewheel_tpu.nodes import BeepTestNode
    from firewheel_tpu.parallel import BatchRenderer

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 1, BeepTestNode(330.0, -15.0, True))
    sp = g.add_node(1, 2, BinauralSpatializerNode(position=(0.8, 0.0, -1.0)))
    g.connect(b, 0, sp, 0)
    g.connect(sp, 0, g.graph_out_node(), 0)
    g.connect(sp, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, 128)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    br = BatchRenderer(prog, batch=3)
    out, om, _ = br.render_chunk(
        br.stack_params(), br.init_state(), num_blocks=4
    )
    out = np.asarray(out)
    souts, _, _ = prog.render_chunk(
        prog.collect_params(), prog.init_state(),
        jnp.zeros((4, 0, 128), jnp.float32), jnp.zeros((4, 0), bool), 0,
    )
    for i in range(3):
        np.testing.assert_allclose(out[i], np.asarray(souts), atol=1e-6)
