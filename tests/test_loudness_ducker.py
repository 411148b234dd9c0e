"""LoudnessMeterNode vs the BS.1770 definition; DuckerNode behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.nodes import DuckerNode, IntegratedLoudness, LoudnessMeterNode
from firewheel_tpu.ops.iir import biquad_scan
from firewheel_tpu.ops.loudness import k_weighting_coeffs

SR = 48000
F = 128


def measure(x, block=F):
    node = LoudnessMeterNode()
    proc = node.activate(SR, block, x.shape[0], 0)
    state = proc.init_state()
    n = x.shape[-1]
    for i in range(0, n, block):
        blk = jnp.asarray(x[:, i : i + block])
        out, state, om = proc.kernel(
            {}, state, blk, jnp.zeros((x.shape[0],), bool),
            BlockInfo.make(stream_sample=i),
        )
    return LoudnessMeterNode.read(state), state


def golden_lufs(x, window_secs):
    """float64 reference: K-weight then mean-square over the last window."""
    shelf, hp = k_weighting_coeffs(SR)
    y = np.asarray(
        biquad_scan(jnp.asarray(x), (jnp.zeros(x.shape[0]), jnp.zeros(x.shape[0])), shelf)[0]
    )
    y = np.asarray(
        biquad_scan(jnp.asarray(y), (jnp.zeros(x.shape[0]), jnp.zeros(x.shape[0])), hp)[0]
    )
    w = int(window_secs * SR)
    seg = y[:, -w:]
    ms = (seg.astype(np.float64) ** 2).sum(axis=0).mean()
    return -0.691 + 10 * np.log10(max(ms, 1e-12))


class TestLoudness:
    def test_sine_loudness_matches_definition(self):
        t = np.arange(SR, dtype=np.float64) / SR
        x = np.tile(0.1 * np.sin(2 * np.pi * 997 * t), (2, 1)).astype(np.float32)
        r, _ = measure(x)
        # BS.1770 calibration: the -0.691 offset cancels the K-filter's
        # +0.691 dB at 997 Hz, so a -20 dBFS stereo sine reads -20.0 LUFS
        assert abs(r["momentary_lufs"] - (-20.0)) < 0.2, r

    def test_momentary_tracks_recent_window_only(self):
        t = np.arange(SR, dtype=np.float64) / SR
        loud = 0.5 * np.sin(2 * np.pi * 997 * t[: SR // 2])
        quiet = 0.005 * np.sin(2 * np.pi * 997 * t[SR // 2 :])
        x = np.tile(np.concatenate([loud, quiet]), (2, 1)).astype(np.float32)
        r, _ = measure(x)
        # momentary (400ms) sees only the quiet tail; short-term (3s) is
        # dominated by the loud first half
        assert r["momentary_lufs"] < -35
        assert r["short_term_lufs"] > r["momentary_lufs"] + 15

    def test_partial_blocks_consistent(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, SR)) * 0.1).astype(np.float32)
        r_full, _ = measure(x, block=128)
        # odd block size -> different partitioning, same sample-exact hops
        node = LoudnessMeterNode()
        proc = node.activate(SR, 160, 2, 0)
        state = proc.init_state()
        for i in range(0, SR, 160):
            blk = jnp.asarray(x[:, i : i + 160])
            _, state, _ = proc.kernel(
                {}, state, blk, jnp.zeros((2,), bool),
                BlockInfo.make(stream_sample=i),
            )
        r_odd = LoudnessMeterNode.read(state)
        assert abs(r_full["momentary_lufs"] - r_odd["momentary_lufs"]) < 0.05
        assert abs(r_full["short_term_lufs"] - r_odd["short_term_lufs"]) < 0.05

    def test_integrated_gating(self):
        integ = IntegratedLoudness()
        # mostly -23 LUFS content with silence gaps (gated out)
        for _ in range(50):
            integ.push(-23.0)
        for _ in range(50):
            integ.push(-80.0)  # below absolute gate
        assert abs(integ.value() - (-23.0)) < 0.1
        # a few loud blocks pull the ungated mean up; relative gate keeps
        # the estimate near the program level
        for _ in range(5):
            integ.push(-10.0)
        assert -23.5 < integ.value() < -18.0

    def test_block_aligned_hops_clear_stale_data(self):
        # fifth-review finding: when the block size equals the 100 ms hop,
        # ring slots were never cleared — silence after loud audio kept
        # reading the loud level forever (and counts grew unboundedly)
        node = LoudnessMeterNode()
        proc = node.activate(SR, 4800, 2, 0)   # block == hop_frames
        state = proc.init_state()
        t = np.arange(int(3.2 * SR)) / SR
        loud = np.tile(0.5 * np.sin(2 * np.pi * 997 * t), (2, 1)).astype(np.float32)
        silence = np.zeros((2, int(0.8 * SR)), np.float32)
        x = np.concatenate([loud, silence], axis=1)
        for i in range(0, x.shape[-1], 4800):
            _, state, _ = proc.kernel(
                {}, state, jnp.asarray(x[:, i : i + 4800]),
                jnp.zeros((2,), bool), BlockInfo.make(stream_sample=i),
            )
        r = LoudnessMeterNode.read(state)
        assert r["momentary_lufs"] < -80, r      # 800 ms of silence
        counts = np.asarray(state["counts"])
        assert counts.max() <= 4800               # no unbounded accumulation

    def test_empty_reads(self):
        node = LoudnessMeterNode()
        proc = node.activate(SR, F, 2, 0)
        r = LoudnessMeterNode.read(proc.init_state())
        assert r["momentary_lufs"] == -np.inf
        assert IntegratedLoudness().value() == -np.inf


class TestDucker:
    def _run(self, main, side):
        node = DuckerNode(threshold_db=-40.0, duck_db=-12.0,
                          attack_secs=0.002, release_secs=0.05)
        proc = node.activate(SR, F, main.shape[0] + side.shape[0], main.shape[0])
        state = proc.init_state()
        outs = []
        for i in range(0, main.shape[-1], F):
            x = jnp.asarray(np.concatenate([main[:, i:i+F], side[:, i:i+F]]))
            out, state, om = proc.kernel(
                proc.collect_params(), state, x,
                jnp.zeros((x.shape[0],), bool), BlockInfo.make(stream_sample=i),
            )
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=1)

    def test_ducks_when_sidechain_hot(self):
        n = SR  # 1 s: hot 0.3 s, then 0.7 s to release (release=50 ms)
        hot = int(0.3 * SR)
        main = np.full((2, n), 0.5, np.float32)
        side = np.zeros((1, n), np.float32)
        side[:, :hot] = 0.5
        y = self._run(main, side)
        duck_gain = 10 ** (-12 / 20)
        # steady ducked level mid-way through the hot region
        mid = hot // 2
        np.testing.assert_allclose(
            y[:, mid : mid + F], 0.5 * duck_gain, rtol=0.02
        )
        # recovered to unity at the end
        np.testing.assert_allclose(y[:, -F:], 0.5, rtol=0.02)

    def test_silent_sidechain_is_passthrough(self):
        main = np.full((2, 4 * F), 0.3, np.float32)
        side = np.zeros((2, 4 * F), np.float32)
        y = self._run(main, side)
        np.testing.assert_allclose(y, 0.3, atol=1e-6)

    def test_activation_requires_sidechain_ports(self):
        from firewheel_tpu.core.node import NodeActivationError

        with pytest.raises(NodeActivationError):
            DuckerNode().activate(SR, F, 2, 2)
