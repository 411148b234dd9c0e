"""Dynamics + generator nodes: compressor/limiter vs scalar golden models,
noise determinism and spectra, LFO shapes and phase continuity."""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.nodes import (
    CompressorNode,
    LFONode,
    LFOShape,
    LimiterNode,
    NoiseNode,
)

SR = 48000
F = 128


def run_node(node, x, n_ch=2, start_sample=0):
    """Render [ch, N] through an effect node block by block."""
    proc = node.activate(SR, F, n_ch, n_ch)
    state = proc.init_state()
    outs = []
    n = x.shape[-1]
    for i in range(0, n, F):
        blk = jnp.asarray(x[:, i : i + F])
        info = BlockInfo.make(
            stream_sample=start_sample + i,
            stream_time_secs=(start_sample + i) / SR,
        )
        p = proc.collect_params()
        out, state, om = proc.kernel(
            p, state, blk, jnp.zeros((n_ch,), bool), info
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1), proc, state


def run_generator(node, blocks, n_ch=2, start_sample=0, frames=F):
    proc = node.activate(SR, F, 0, n_ch)
    state = proc.init_state()
    outs = []
    empty = jnp.zeros((0, frames), jnp.float32)
    for b in range(blocks):
        info = BlockInfo.make(stream_sample=start_sample + b * frames)
        p = proc.collect_params()
        out, state, om = proc.kernel(
            p, state, empty, jnp.zeros((0,), bool), info
        )
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1)


# -- golden scalar models ------------------------------------------------------

def golden_compressor(x, threshold_db, ratio, att_b, rel_b, knee_db, makeup):
    """Scalar float64 reference of the channel-linked soft-knee compressor."""
    ch, n = x.shape
    env = 0.0
    y = np.zeros_like(x, dtype=np.float64)
    slope = 1.0 / ratio - 1.0
    for t in range(n):
        lvl = np.max(np.abs(x[:, t]))
        b = att_b if lvl > env else rel_b
        env = b * env + (1 - b) * lvl
        ldb = 20 * np.log10(max(env, 1e-9))
        over = ldb - threshold_db
        half = knee_db / 2
        if over <= -half:
            gdb = 0.0
        elif over >= half:
            gdb = slope * over
        else:
            k = np.clip(over + half, 0, knee_db)
            gdb = slope * k * k / (2 * max(knee_db, 1e-9))
        y[:, t] = x[:, t] * (10 ** (gdb / 20)) * makeup
    return y


class TestCompressor:
    def test_matches_golden(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, 6 * F)) * 0.7).astype(np.float32)
        node = CompressorNode(
            threshold_db=-18.0, ratio=4.0, attack_secs=0.003,
            release_secs=0.05, makeup_db=3.0, knee_db=6.0,
        )
        got, proc, _ = run_node(node, x)
        p = proc.collect_params()
        ref = golden_compressor(
            x.astype(np.float64), -18.0, 4.0,
            float(p["att_b"]), float(p["rel_b"]), 6.0, float(p["makeup"]),
        )
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_loud_signal_attenuated_quiet_untouched(self):
        t = np.arange(4 * F) / SR
        loud = np.tile(np.sin(2 * np.pi * 440 * t) * 0.9, (2, 1)).astype(np.float32)
        quiet = (loud * 0.01).astype(np.float32)
        node = CompressorNode(threshold_db=-20.0, ratio=8.0,
                              attack_secs=0.001, release_secs=0.05, knee_db=0.0)
        y_loud, _, _ = run_node(node, loud)
        y_quiet, _, _ = run_node(node, quiet)
        # steady state: loud is compressed well below input
        assert np.abs(y_loud[:, -F:]).max() < 0.45
        np.testing.assert_allclose(y_quiet[:, -F:], quiet[:, -F:], atol=1e-6)

    def test_silence_mask_passthrough(self):
        node = CompressorNode()
        proc = node.activate(SR, F, 2, 2)
        out, st, om = proc.kernel(
            proc.collect_params(), proc.init_state(),
            jnp.zeros((2, F)), jnp.ones((2,), bool), BlockInfo.make(),
        )
        assert bool(jnp.all(om)) and np.all(np.asarray(out) == 0)


class TestLimiter:
    def test_never_exceeds_ceiling(self):
        rng = np.random.default_rng(1)
        # harsh program: bursts at 4x the ceiling
        x = (rng.standard_normal((2, 20 * F)) * 2.0).astype(np.float32)
        node = LimiterNode(ceiling_db=-3.0, lookahead_secs=0.002,
                           release_secs=0.05)
        got, proc, _ = run_node(node, x)
        ceiling = 10 ** (-3.0 / 20)
        assert np.abs(got).max() <= ceiling * (1 + 1e-4), np.abs(got).max()

    def test_quiet_passthrough_after_latency(self):
        x = np.full((2, 8 * F), 0.1, np.float32)
        node = LimiterNode(ceiling_db=-1.0, lookahead_secs=0.002)
        got, proc, _ = run_node(node, x)
        la = proc.lookahead
        # after the lookahead latency, quiet audio passes at unity
        np.testing.assert_allclose(got[:, la + F :], 0.1, atol=1e-5)
        # the first `la` samples are the (silent) delay-line prefill
        np.testing.assert_allclose(got[:, :la], 0.0, atol=1e-7)

    def test_partial_blocks(self):
        x = np.full((2, 3 * F + 50), 0.5, np.float32)
        node = LimiterNode(ceiling_db=-6.0, lookahead_secs=0.001)
        proc = node.activate(SR, F, 2, 2)
        state = proc.init_state()
        outs = []
        for lo, hi in [(0, F), (F, 2 * F), (2 * F, 3 * F), (3 * F, 3 * F + 50)]:
            out, state, om = proc.kernel(
                proc.collect_params(), state, jnp.asarray(x[:, lo:hi]),
                jnp.zeros((2,), bool), BlockInfo.make(stream_sample=lo),
            )
            outs.append(np.asarray(out))
        y = np.concatenate(outs, axis=1)
        assert y.shape == x.shape
        assert np.abs(y).max() <= 10 ** (-6.0 / 20) * (1 + 1e-4)


class TestNoise:
    def test_deterministic_given_stream_position(self):
        node = NoiseNode("white", gain_db=0.0, seed=7)
        a = run_generator(node, 4)
        b = run_generator(node, 4)
        np.testing.assert_array_equal(a, b)
        c = run_generator(node, 4, start_sample=4 * F)
        assert not np.array_equal(a, c)  # different region, different noise

    def test_channels_decorrelated(self):
        node = NoiseNode("white", gain_db=0.0)
        y = run_generator(node, 16)
        corr = np.corrcoef(y[0], y[1])[0, 1]
        assert abs(corr) < 0.1

    def test_pink_spectrum_slope(self):
        node = NoiseNode("pink", gain_db=0.0)
        y = run_generator(node, 512)[0]
        spec = np.abs(np.fft.rfft(y)) ** 2
        freqs = np.fft.rfftfreq(y.size, 1 / SR)
        # average log-power in two decades: pink falls ~10 dB/decade
        lo = spec[(freqs > 100) & (freqs < 300)].mean()
        hi = spec[(freqs > 4000) & (freqs < 12000)].mean()
        ratio_db = 10 * np.log10(lo / hi)
        assert 8.0 < ratio_db < 22.0, ratio_db

    def test_disabled_is_silent_and_masked(self):
        node = NoiseNode("white", enabled=False)
        proc = node.activate(SR, F, 0, 2)
        out, st, om = proc.kernel(
            proc.collect_params(), proc.init_state(),
            jnp.zeros((0, F)), jnp.zeros((0,), bool), BlockInfo.make(),
        )
        assert bool(jnp.all(om)) and np.all(np.asarray(out) == 0)


class TestLFO:
    def test_sine_frequency(self):
        node = LFONode(LFOShape.SINE, freq_hz=5.0, depth=1.0)
        y = run_generator(node, 375)[0]  # 1 second
        spec = np.abs(np.fft.rfft(y))
        peak_hz = np.argmax(spec) * SR / y.size
        assert abs(peak_hz - 5.0) < 1.1

    def test_shapes_ranges(self):
        for shape in (LFOShape.SINE, LFOShape.TRIANGLE, LFOShape.SAW,
                      LFOShape.SQUARE):
            node = LFONode(shape, freq_hz=3.0, depth=0.5, offset=1.0)
            y = run_generator(node, 64)[0]
            assert y.min() >= 0.5 - 1e-5 and y.max() <= 1.5 + 1e-5, shape

    def test_phase_continuity_across_blocks(self):
        node = LFONode(LFOShape.SINE, freq_hz=50.0)
        y = run_generator(node, 32)[0]
        # max jump bounded by the sine derivative
        bound = 2 * np.pi * 50.0 / SR * 1.1
        assert np.abs(np.diff(y)).max() <= bound

    def test_square_duty_cycle(self):
        node = LFONode(LFOShape.SQUARE, freq_hz=10.0)
        y = run_generator(node, 375)[0]
        assert abs(np.mean(y > 0) - 0.5) < 0.02


# -- gate ----------------------------------------------------------------------

def golden_gate(x, open_lin, close_lin, floor, att_b, rel_b, hold_n):
    """Scalar float64 reference of the channel-linked hysteresis+hold gate."""
    ch, n = x.shape
    opn, hold, g = 0.0, 0.0, 0.0
    y = np.zeros_like(x, dtype=np.float64)
    for t in range(n):
        lvl = np.max(np.abs(x[:, t]))
        above = lvl >= open_lin
        below = lvl < close_lin
        expired = hold <= 0.0
        if above:
            opn = 1.0
        elif below and expired:
            opn = 0.0
        hold = hold_n if above else max(hold - 1.0, 0.0)
        target = opn + (1.0 - opn) * floor
        b = att_b if target > g else rel_b
        g = b * g + (1.0 - b) * target
        y[:, t] = x[:, t] * g
    return y


def gate_test_signal(n=4096, seed=7):
    """Quiet noise | loud burst | quiet noise, levels far from thresholds."""
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((2, n)) * 1e-4).astype(np.float32)  # ~-80 dB
    x[:, n // 4 : n // 2] += (
        0.5 * np.sin(2 * np.pi * 440 / SR * np.arange(n // 4))
    ).astype(np.float32)
    return x


class TestGate:
    def test_matches_golden(self):
        from firewheel_tpu.nodes import GateNode

        node = GateNode(
            threshold_db=-40.0,
            range_db=-60.0,
            attack_secs=0.002,
            release_secs=0.05,
            hold_secs=0.01,
            hysteresis_db=6.0,
        )
        x = gate_test_signal()
        got, proc, _ = run_node(node, x)
        p = {k: float(v) for k, v in proc.collect_params().items()}
        ref = golden_gate(
            x.astype(np.float64),
            p["open_lin"], p["close_lin"], p["floor"],
            p["att_b"], p["rel_b"], p["hold_n"],
        )
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_noise_gated_burst_passes(self):
        from firewheel_tpu.nodes import GateNode

        # hold must exceed the burst sine's half-period (440 Hz -> ~1.1 ms)
        # or the detector's zero crossings re-close the gate every cycle
        node = GateNode(threshold_db=-40.0, range_db=-80.0,
                        attack_secs=0.0005, release_secs=0.002,
                        hold_secs=0.005)
        x = gate_test_signal()
        y, _, _ = run_node(node, x)
        n = x.shape[-1]
        # leading quiet region (gate closed from init): ~-80 dB attenuation
        lead = slice(0, n // 4)
        assert np.abs(y[:, lead]).max() <= np.abs(x[:, lead]).max() * 2e-4
        # middle of the burst (attack settled): essentially untouched
        mid = slice(n // 4 + 512, n // 2)
        np.testing.assert_allclose(y[:, mid], x[:, mid], atol=1e-4)
        # tail long after release: closed again
        assert np.abs(y[:, -256:]).max() <= np.abs(x[:, -256:]).max() * 2e-4

    def test_hold_and_hysteresis_keep_open(self):
        from firewheel_tpu.nodes import GateNode

        # level dips to -44 dB — below the -40 open threshold but above the
        # -52 close threshold — so the gate must stay open through the dip
        node = GateNode(threshold_db=-40.0, range_db=-80.0,
                        attack_secs=0.0005, release_secs=0.005,
                        hold_secs=0.0, hysteresis_db=12.0)
        n = 2048
        t = np.arange(n)
        env = np.where((t >= 512) & (t < 1024), 10 ** (-44 / 20), 0.5)
        x = np.repeat(
            (env * np.sign(np.sin(2 * np.pi * 997 / SR * t)))[None, :].astype(
                np.float32
            ),
            2, axis=0,
        )
        y, _, _ = run_node(node, x)
        dip = slice(600, 1000)
        np.testing.assert_allclose(y[:, dip], x[:, dip], atol=1e-5)

    def test_chunk_invariance(self):
        from firewheel_tpu.core.node import BlockInfo
        from firewheel_tpu.nodes import GateNode

        x = gate_test_signal(n=2048)
        outs = []
        for frames in (64, 256):
            node = GateNode(threshold_db=-40.0, hold_secs=0.003)
            proc = node.activate(SR, frames, 2, 2)
            state = proc.init_state()
            chunks = []
            for i in range(0, x.shape[-1], frames):
                p = proc.collect_params()
                out, state, _ = proc.kernel(
                    p, state, jnp.asarray(x[:, i : i + frames]),
                    jnp.zeros((2,), bool), BlockInfo.make(stream_sample=i),
                )
                chunks.append(np.asarray(out))
            outs.append(np.concatenate(chunks, axis=1))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-7)

    def test_contract(self):
        from firewheel_tpu.nodes import GateNode
        from firewheel_tpu.testing import validate_node

        report = validate_node(GateNode(), 2, 2)  # raises on contract breach
        for check in ("eager", "jit", "scan", "vmap", "partial_block"):
            assert report[check] == "ok", report
        assert report["supports_megakernel"].startswith("declared"), report
