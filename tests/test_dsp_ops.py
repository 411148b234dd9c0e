"""DSP ops tests: IIR scans vs float64 scalar references, FFT convolution
vs direct convolution, delay lines, pan laws.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.ops import (
    biquad_bandpass,
    biquad_highpass,
    biquad_lowpass,
    biquad_peaking,
    biquad_scan,
    comb_init,
    comb_step,
    delay_init,
    delay_step,
    equal_power_gains,
    fdl_init,
    fdl_step,
    mid_side_merge,
    mid_side_split,
    one_pole_scan,
    partition_ir,
    spatial_params,
)

RNG = np.random.default_rng(3)
SR = 48000


def scalar_biquad(x, coeffs, z=(0.0, 0.0)):
    """Float64 TDF-II reference."""
    b0, b1, b2, a1, a2 = (float(np.asarray(c)) for c in coeffs)
    z1, z2 = float(z[0]), float(z[1])
    y = np.zeros_like(x, dtype=np.float64)
    for n in range(len(x)):
        xn = float(x[n])
        y[n] = b0 * xn + z1
        z1_new = b1 * xn - a1 * y[n] + z2
        z2 = b2 * xn - a2 * y[n]
        z1 = z1_new
    return y, (z1, z2)


class TestOnePole:
    def test_matches_scalar(self):
        x = RNG.standard_normal((3, 256)).astype(np.float32)
        a, b = np.float32(0.1), np.float32(0.9)
        y, last = one_pole_scan(jnp.asarray(x), jnp.zeros(3), a, b)
        y = np.asarray(y)
        ref = np.zeros_like(x, dtype=np.float64)
        for c in range(3):
            prev = 0.0
            for n in range(256):
                prev = 0.1 * float(x[c, n]) + 0.9 * prev
                ref[c, n] = prev
        np.testing.assert_allclose(y, ref, atol=2e-6)
        np.testing.assert_allclose(np.asarray(last), ref[:, -1], atol=2e-6)

    def test_carry_across_blocks(self):
        x = RNG.standard_normal(512).astype(np.float32)
        a, b = np.float32(0.05), np.float32(0.95)
        y_full, _ = one_pole_scan(jnp.asarray(x)[None], jnp.zeros(1), a, b)
        y1, last = one_pole_scan(jnp.asarray(x[:256])[None], jnp.zeros(1), a, b)
        y2, _ = one_pole_scan(jnp.asarray(x[256:])[None], last, a, b)
        np.testing.assert_allclose(
            np.asarray(y_full)[0],
            np.concatenate([np.asarray(y1)[0], np.asarray(y2)[0]]),
            atol=1e-6,
        )


class TestBiquad:
    @pytest.mark.parametrize(
        "builder,args,tol",
        [
            (biquad_lowpass, (1000.0, 0.7071), 1e-5),
            (biquad_highpass, (2000.0, 0.7071), 1e-5),
            # Near-unit-circle poles (low freq and/or high Q) accumulate
            # more float32 error — a sequential f32 loop drifts comparably;
            # measured bound documented in ops/iir.py.
            (biquad_bandpass, (500.0, 2.0), 5e-5),
            (biquad_lowpass, (8000.0, 4.0), 5e-5),
        ],
    )
    def test_matches_scalar(self, builder, args, tol):
        coeffs = builder(*args, SR)
        x = RNG.standard_normal(1024).astype(np.float32)
        y, (z1, z2) = biquad_scan(jnp.asarray(x), (jnp.zeros(()), jnp.zeros(())), coeffs)
        ref, (rz1, rz2) = scalar_biquad(x, coeffs)
        np.testing.assert_allclose(np.asarray(y), ref, atol=tol)
        np.testing.assert_allclose(float(z1), rz1, atol=tol)

    def test_peaking_gain(self):
        coeffs = biquad_peaking(1000.0, 1.0, 6.0, SR)
        # measure response at the peak with a sine
        n = 48000
        t = np.arange(n, dtype=np.float32)
        x = np.sin(2 * np.pi * 1000.0 / SR * t).astype(np.float32)
        y, _ = biquad_scan(jnp.asarray(x), (jnp.zeros(()), jnp.zeros(())), coeffs)
        gain = np.abs(np.asarray(y)[24000:]).max()
        assert abs(20 * np.log10(gain) - 6.0) < 0.1

    def test_block_carry_equivalence(self):
        """One long scan == chunked scans with carried state (up to f32
        reassociation near the poles; tight for a damped section)."""
        coeffs = biquad_lowpass(2000.0, 0.7071, SR)
        x = RNG.standard_normal((2, 512)).astype(np.float32)
        y_full, _ = biquad_scan(
            jnp.asarray(x), (jnp.zeros(2), jnp.zeros(2)), coeffs
        )
        z = (jnp.zeros(2), jnp.zeros(2))
        parts = []
        for i in range(4):
            y, z = biquad_scan(jnp.asarray(x[:, i * 128 : (i + 1) * 128]), z, coeffs)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.asarray(y_full), np.concatenate(parts, axis=1), atol=1e-5
        )

    def test_lowpass_attenuates_highs(self):
        coeffs = biquad_lowpass(500.0, 0.7071, SR)
        t = np.arange(4096, dtype=np.float32)
        hi = np.sin(2 * np.pi * 8000.0 / SR * t).astype(np.float32)
        lo = np.sin(2 * np.pi * 100.0 / SR * t).astype(np.float32)
        yh, _ = biquad_scan(jnp.asarray(hi), (jnp.zeros(()), jnp.zeros(())), coeffs)
        yl, _ = biquad_scan(jnp.asarray(lo), (jnp.zeros(()), jnp.zeros(())), coeffs)
        assert np.abs(np.asarray(yh)[2000:]).max() < 0.05
        assert np.abs(np.asarray(yl)[2000:]).max() > 0.9


class TestDelay:
    def test_pure_delay(self):
        x = RNG.standard_normal((2, 64)).astype(np.float32)
        buf = delay_init(2, 10)
        y1, buf = delay_step(jnp.asarray(x), buf)
        y1 = np.asarray(y1)
        assert (y1[:, :10] == 0).all()
        np.testing.assert_array_equal(y1[:, 10:], x[:, :54])
        y2, buf = delay_step(jnp.asarray(x), buf)
        np.testing.assert_array_equal(np.asarray(y2)[:, :10], x[:, 54:])

    def test_delay_longer_than_block(self):
        x = RNG.standard_normal((1, 32)).astype(np.float32)
        buf = delay_init(1, 100)
        outs = []
        b = buf
        for i in range(5):
            y, b = delay_step(jnp.asarray(x * (i + 1)), b)
            outs.append(np.asarray(y))
        cat_in = np.concatenate([x * (i + 1) for i in range(5)], axis=1)
        cat_out = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(cat_out[:, 100:], cat_in[:, :60])

    def test_comb_feedback(self):
        f = 64
        impulse = np.zeros((1, f), np.float32)
        impulse[0, 0] = 1.0
        zeros = np.zeros((1, f), np.float32)
        buf = comb_init(1, f)  # delay == block
        y0, buf = comb_step(jnp.asarray(impulse), buf, 0.5)
        y1, buf = comb_step(jnp.asarray(zeros), buf, 0.5)
        y2, buf = comb_step(jnp.asarray(zeros), buf, 0.5)
        # y[n] = x[n] + 0.5 y[n-64]: impulse, then 0.5, then 0.25 at offsets
        assert np.asarray(y0)[0, 0] == 1.0
        assert np.asarray(y1)[0, 0] == 0.5
        assert np.asarray(y2)[0, 0] == 0.25


class TestFFTConv:
    @pytest.mark.parametrize("ir_len", [64, 128, 300, 1000])
    def test_matches_direct_convolution(self, ir_len):
        f = 128
        ir = (RNG.standard_normal(ir_len) * np.exp(-np.arange(ir_len) / 50)).astype(
            np.float32
        )
        x = RNG.standard_normal((1, 6 * f)).astype(np.float32)
        H = partition_ir(ir, f)
        state = fdl_init(H.shape[0], 1, f)
        outs = []
        for i in range(6):
            y, state = fdl_step(jnp.asarray(x[:, i * f : (i + 1) * f]), state, H)
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=1)[0]
        ref = np.convolve(x[0].astype(np.float64), ir.astype(np.float64))[: 6 * f]
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_stereo_separate_irs(self):
        f = 64
        ir = RNG.standard_normal((2, 100)).astype(np.float32)
        x = RNG.standard_normal((2, 4 * f)).astype(np.float32)
        H = partition_ir(ir, f)
        state = fdl_init(H.shape[0], 2, f)
        outs = []
        for i in range(4):
            y, state = fdl_step(jnp.asarray(x[:, i * f : (i + 1) * f]), state, H)
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=1)
        for c in range(2):
            ref = np.convolve(x[c].astype(np.float64), ir[c].astype(np.float64))[: 4 * f]
            np.testing.assert_allclose(got[c], ref, atol=2e-4)


class TestPanMath:
    def test_equal_power(self):
        gl, gr = equal_power_gains(jnp.float32(0.0))
        assert abs(float(gl) - float(gr)) < 1e-6
        assert abs(float(gl) ** 2 + float(gr) ** 2 - 1.0) < 1e-6
        gl, gr = equal_power_gains(jnp.float32(-1.0))
        assert abs(float(gl) - 1.0) < 1e-6 and abs(float(gr)) < 1e-6
        gl, gr = equal_power_gains(jnp.float32(1.0))
        assert abs(float(gr) - 1.0) < 1e-6 and abs(float(gl)) < 1e-6

    def test_mid_side_roundtrip(self):
        l = RNG.standard_normal(64).astype(np.float32)
        r = RNG.standard_normal(64).astype(np.float32)
        m, s = mid_side_split(jnp.asarray(l), jnp.asarray(r))
        l2, r2 = mid_side_merge(m, s)
        np.testing.assert_allclose(np.asarray(l2), l, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-6)

    def test_spatial_params(self):
        gain, pan, dist = spatial_params(jnp.asarray([0.0, 0.0, -1.0]))
        assert abs(float(pan)) < 1e-6 and abs(float(gain) - 1.0) < 1e-6
        gain, pan, dist = spatial_params(jnp.asarray([5.0, 0.0, 0.0]))
        assert float(pan) > 0.9  # hard right
        assert float(gain) < 0.5  # attenuated with distance


class TestPallasIIR:
    """The Pallas sequential-IIR kernel (interpret mode on CPU; the compiled
    path is validated on TPU in bench runs)."""

    def test_matches_scan(self):
        from firewheel_tpu.ops.pallas_iir import biquad_pallas

        coeffs = biquad_lowpass(1000.0, 0.7071, SR)
        x = RNG.standard_normal((4, 2, 256)).astype(np.float32)
        z = (jnp.zeros((4, 2)), jnp.zeros((4, 2)))
        y_s, (s1, s2) = biquad_scan(jnp.asarray(x), z, coeffs)
        y_p, (p1, p2) = biquad_pallas(jnp.asarray(x), z, coeffs, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y_p), np.asarray(y_s), atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(p1), np.asarray(s1), atol=2e-5)

    def test_exact_sequential_semantics(self):
        """The kernel reproduces the scalar float32 recurrence more tightly
        than the reassociated scan."""
        from firewheel_tpu.ops.pallas_iir import biquad_pallas

        coeffs = biquad_lowpass(500.0, 2.0, SR)  # resonant: scan drifts
        x = RNG.standard_normal(512).astype(np.float32)
        ref, _ = scalar_biquad(x, coeffs)
        y_p, _ = biquad_pallas(jnp.asarray(x), (jnp.zeros(()), jnp.zeros(())), coeffs, interpret=True)
        y_s, _ = biquad_scan(jnp.asarray(x), (jnp.zeros(()), jnp.zeros(())), coeffs)
        err_p = np.abs(np.asarray(y_p, np.float64) - ref).max()
        err_s = np.abs(np.asarray(y_s, np.float64) - ref).max()
        assert err_p < 2e-5
        # tighter than the reassociated scan on the same section
        assert err_p <= err_s

    def test_state_carry(self):
        from firewheel_tpu.ops.pallas_iir import biquad_pallas

        coeffs = biquad_highpass(2000.0, 0.7071, SR)
        x = RNG.standard_normal((2, 256)).astype(np.float32)
        y_full, _ = biquad_pallas(
            jnp.asarray(x), (jnp.zeros(2), jnp.zeros(2)), coeffs, interpret=True
        )
        z = (jnp.zeros(2), jnp.zeros(2))
        y1, z = biquad_pallas(jnp.asarray(x[:, :128]), z, coeffs, interpret=True)
        y2, z = biquad_pallas(jnp.asarray(x[:, 128:]), z, coeffs, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y_full),
            np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
            atol=1e-6,
        )

    def test_filter_node_pallas_backend(self):
        from firewheel_tpu.nodes import FilterNode, FilterType
        from firewheel_tpu.core.node import BlockInfo

        node = FilterNode(FilterType.LOWPASS, 800.0, backend="pallas")
        proc = node.activate(SR, 128, 2, 2)
        state = proc.init_state()
        x = RNG.standard_normal((2, 128)).astype(np.float32)
        out, state, om = proc.kernel(
            proc.collect_params(), state, jnp.asarray(x),
            jnp.zeros(2, bool), BlockInfo.make(),
        )
        node_s = FilterNode(FilterType.LOWPASS, 800.0, backend="scan")
        proc_s = node_s.activate(SR, 128, 2, 2)
        out_s, _, _ = proc_s.kernel(
            proc_s.collect_params(), proc_s.init_state(), jnp.asarray(x),
            jnp.zeros(2, bool), BlockInfo.make(),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_s), atol=2e-5
        )


class TestPerChannelCoeffs:
    """Review finding: biquad_scan's documented contract accepts coeffs
    broadcastable to x[..., 0] — a (ch,)-shaped per-channel array must
    align against the channel axis, not the trailing sample axis."""

    def test_channel_coeff_array_matches_per_channel_scalar(self):
        from firewheel_tpu.ops import BiquadCoeffs, biquad_lowpass

        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 256)).astype(np.float32)
        ca = biquad_lowpass(2000.0, 0.707, SR)
        cb = biquad_lowpass(6000.0, 0.707, SR)
        stacked = BiquadCoeffs(*(jnp.stack([a, b]) for a, b in zip(ca, cb)))
        z = (jnp.zeros((2,)), jnp.zeros((2,)))
        y, _ = biquad_scan(jnp.asarray(x), z, stacked)  # (ch,) coeffs
        ya, _ = biquad_scan(jnp.asarray(x[0]), (jnp.zeros(()), jnp.zeros(())), ca)
        yb, _ = biquad_scan(jnp.asarray(x[1]), (jnp.zeros(()), jnp.zeros(())), cb)
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(ya), atol=1e-6)
        np.testing.assert_allclose(np.asarray(y[1]), np.asarray(yb), atol=1e-6)

    def test_pallas_rejects_array_coeffs(self):
        from firewheel_tpu.ops import BiquadCoeffs, biquad_lowpass
        from firewheel_tpu.ops.pallas_iir import biquad_pallas

        c = biquad_lowpass(2000.0, 0.707, SR)
        bad = BiquadCoeffs(*(jnp.stack([v, v]) for v in c))
        with pytest.raises(ValueError, match="scalar coefficients"):
            biquad_pallas(jnp.zeros((2, 128)), (jnp.zeros((2,)), jnp.zeros((2,))), bad)


# -- Mosaic-safe sample_scan / sliding_max emissions ----------------------------

class TestMosaicSampleScan:
    """The Mosaic emissions (fori_loop + iota-masked emit; doubling sliding
    max) must be bit-exact vs the XLA forms: same op order per sample, and
    the masked read/write move exactly one lane."""

    def test_envelope_follow_bit_exact(self):
        from firewheel_tpu.core.trace_mode import mosaic_trace
        from firewheel_tpu.ops.dynamics import envelope_follow

        rng = np.random.default_rng(3)
        level = jnp.asarray(np.abs(rng.standard_normal((2, 3, 257))), jnp.float32)
        env0 = jnp.asarray(np.abs(rng.standard_normal((2, 3))), jnp.float32)
        a_env, a_last = envelope_follow(level, env0, 0.9, 0.99)
        with mosaic_trace():
            b_env, b_last = envelope_follow(level, env0, 0.9, 0.99)
        np.testing.assert_array_equal(np.asarray(a_env), np.asarray(b_env))
        np.testing.assert_array_equal(np.asarray(a_last), np.asarray(b_last))

    def test_sample_scan_tuple_carry(self):
        from firewheel_tpu.core.trace_mode import mosaic_trace
        from firewheel_tpu.ops.dynamics import sample_scan

        rng = np.random.default_rng(5)
        xs = jnp.asarray(rng.standard_normal(130), jnp.float32)

        def step(carry, x):
            a, b = carry
            a = jnp.where(x > a, x, 0.5 * a + b)
            b = jnp.maximum(b - 1.0, 0.0)
            return (a, b), a * 0.25

        carry0 = (jnp.float32(0.0), jnp.float32(3.0))
        (a1, b1), y1 = sample_scan(step, carry0, xs)
        with mosaic_trace():
            (a2, b2), y2 = sample_scan(step, carry0, xs)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    @pytest.mark.parametrize("window", [1, 2, 3, 4, 7, 8, 9, 16, 17, 241])
    def test_sliding_max_matches_reduce_window(self, window):
        from firewheel_tpu.core.trace_mode import mosaic_trace
        from firewheel_tpu.ops.dynamics import sliding_max

        rng = np.random.default_rng(window)
        x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
        a = sliding_max(x, window)
        with mosaic_trace():
            b = sliding_max(x, window)
        assert np.asarray(b).shape == np.asarray(a).shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pink_noise_bit_exact_across_modes(self):
        from firewheel_tpu.core.node import BlockInfo
        from firewheel_tpu.core.trace_mode import mosaic_trace
        from firewheel_tpu.nodes import NoiseNode

        node = NoiseNode("pink", gain_db=-12.0, seed=11)
        proc = node.activate(48000, 128, 0, 2)
        info = BlockInfo.make(stream_sample=512)
        p, s = proc.collect_params(), proc.init_state()
        empty = jnp.zeros((0, 128), jnp.float32)
        y1, s1, _ = proc.kernel(p, s, empty, jnp.zeros((0,), bool), info)
        with mosaic_trace():
            y2, s2, _ = proc.kernel(p, s, empty, jnp.zeros((0,), bool), info)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        np.testing.assert_array_equal(
            np.asarray(s1["pink"]), np.asarray(s2["pink"])
        )
