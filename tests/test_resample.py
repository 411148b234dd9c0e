"""Offline polyphase resampler (utils/resample.py) — the asset-tooling
counterpart to the device-side playback resampling (sampler.rs:359-522's
resampling TODO, implemented in nodes/sampler.py).  Golden contract:
mastering grade — >90 dB SNR against the analytically resampled signal
across common rate pairs, exact output length, linear phase (no lag)."""

import numpy as np
import pytest

from firewheel_tpu.utils.resample import resample


def sine(freq, sr, secs=1.0, amp=0.5):
    n = int(sr * secs)
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / sr)).astype(
        np.float32)


def snr_db(y, ref):
    err = y - ref
    return 10 * np.log10(np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-30))


RATE_PAIRS = [(44100, 48000), (48000, 44100), (22050, 48000),
              (48000, 16000), (96000, 48000), (32000, 48000)]


@pytest.mark.parametrize("sr_in,sr_out", RATE_PAIRS)
def test_sine_snr_and_length(sr_in, sr_out):
    for freq in (440.0, 1000.0):
        x = sine(freq, sr_in)
        y = resample(x, sr_in, sr_out)
        m = y.shape[1]
        assert m == -(-len(x) * sr_out // sr_in)  # ceil, exact
        ref = sine(freq, sr_out, secs=m / sr_out)[: m]
        core = slice(2000, m - 2000)
        assert snr_db(y[0, core], ref[core].astype(np.float64)) > 90.0


def test_band_edge_tone():
    # 18 kHz through 44.1↔48 stays > 90 dB (band edge, passband intact)
    for sr_in, sr_out in ((44100, 48000), (48000, 44100)):
        x = sine(18000.0, sr_in)
        y = resample(x, sr_in, sr_out)[0]
        m = len(y)
        ref = sine(18000.0, sr_out, secs=m / sr_out)[:m]
        core = slice(2000, m - 2000)
        assert snr_db(y[core], ref[core].astype(np.float64)) > 90.0


def test_zero_phase_alignment():
    # a ramp resamples onto its exact continuous positions: no group lag
    x = np.arange(4000, dtype=np.float32)
    y = resample(x, 44100, 48000)[0]
    pos = np.arange(len(y)) * 44100 / 48000
    core = slice(300, len(y) - 300)
    assert np.max(np.abs(y[core] - pos[core])) < 1e-2


def test_identity_and_shapes():
    st = np.random.default_rng(0).standard_normal((2, 1000)).astype(
        np.float32)
    same = resample(st, 48000, 48000)
    np.testing.assert_array_equal(same, st)
    assert resample(st, 48000, 24000).shape == (2, 500)
    assert resample(st[0], 48000, 96000).shape == (1, 2000)  # 1-D in
    assert resample(np.zeros((2, 0), np.float32), 44100, 48000).shape[1] == 0


def test_antialiasing_on_downsample():
    # a 20 kHz tone downsampled to 16 kHz (Nyquist 8 kHz) must vanish,
    # not alias into band
    x = sine(20000.0, 48000)
    y = resample(x, 48000, 16000)[0]
    assert np.max(np.abs(y[500:-500])) < 1e-4


def test_blocked_path_matches_single_block():
    """Outputs crossing the internal block boundary (B ≈ 2^24/(ch·taps))
    are seamless — the blocked gather is pure indexing, so a long
    resample must equal the concatenation-free math at every sample."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 300_000)).astype(np.float32)
    y = resample(x, 44100, 48000)  # n_out ≈ 326k > mono block ≈ 246k
    assert y.shape == (1, -(-300_000 * 160 // 147))
    # re-run on a shifted window: block edges move, samples must not
    z = resample(x[:, :200_000], 44100, 48000)
    n = min(z.shape[1], y.shape[1]) - 200  # tail differs (edge padding)
    np.testing.assert_allclose(y[:, :n], z[:, :n], atol=2e-6)
