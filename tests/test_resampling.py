"""Sampler resampling quality options (VERDICT r1 #9): linear (default),
cubic Catmull-Rom, and 8-tap Lanczos windowed sinc.

Golden methodology: play a pure sine clip at a fractional rate and compare
the rendered stream against the *analytically evaluated* sine at the exact
fractional positions the playhead visits — interpolation error is then
measured against ground truth, not against another resampler.  Reference
scope: resampling was TODO in the reference (sampler.rs:359-522)."""

import numpy as np
import pytest
import jax.numpy as jnp

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import LoopRange, SamplerNode

SR = 48000
F = 128
INFO = BlockInfo.make()


def render(node, n_blocks, num_out=1):
    proc = node.activate(SR, F, 0, num_out)
    state = proc.init_state()
    outs = []
    empty = jnp.zeros((0, F), jnp.float32)
    emask = jnp.zeros((0,), bool)
    for _ in range(n_blocks):
        p = proc.collect_params()
        out, state, om = proc.kernel(p, state, empty, emask, INFO)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1)


def sine_clip(frames=24000, cycles_per_sample=0.013):
    x = np.sin(2 * np.pi * cycles_per_sample * np.arange(frames))
    return SampleResource(x[None, :].astype(np.float32), device=False), cycles_per_sample


def max_err(quality, rate, n_blocks=20, cps=0.013):
    clip, cps = sine_clip(cycles_per_sample=cps)
    node = SamplerNode(100.0, quality=quality)
    node.set_sample(clip)
    node.play()
    got = render(node, n_blocks)[0]
    pos = np.arange(got.shape[0], dtype=np.float64) * rate
    want = np.sin(2 * np.pi * cps * pos)
    # skip the first/last taps where edge clamping dominates
    return float(np.abs(got[8:-8] - want[8:-8]).max())


class TestQualityLadder:
    @staticmethod
    def _errs(cps, rate=0.737):
        errs = {}
        for q in ("linear", "cubic", "sinc8"):
            clip, _ = sine_clip(cycles_per_sample=cps)
            node = SamplerNode(100.0, quality=q)
            node.set_sample(clip)
            node.set_playback_rate(rate)
            node.play()
            got = render(node, 20)[0]
            pos = np.arange(got.shape[0], dtype=np.float64) * rate
            want = np.sin(2 * np.pi * cps * pos)
            errs[q] = float(np.abs(got[8:-8] - want[8:-8]).max())
        return errs

    def test_low_frequency_cubic_beats_linear(self):
        # smooth-signal regime: polynomial interpolation excels
        # (measured: linear 8.3e-4, cubic 1.1e-5, sinc8 1.2e-3)
        errs = self._errs(cps=0.013)
        assert errs["cubic"] < errs["linear"] / 20, errs

    def test_high_frequency_sinc8_beats_both(self):
        # near-Nyquist regime (16.8 kHz content): where linear/cubic alias
        # audibly, the windowed sinc holds (measured: linear 5.4e-1,
        # cubic 3.6e-1, sinc8 2.9e-2)
        errs = self._errs(cps=0.35)
        assert errs["sinc8"] < errs["cubic"] / 5, errs
        assert errs["sinc8"] < errs["linear"] / 10, errs

    def test_rate_one_linear_and_cubic_bit_exact(self):
        clip, _ = sine_clip(frames=4096)
        data = np.asarray(clip.data)
        for q in ("linear", "cubic"):
            node = SamplerNode(100.0, quality=q)
            node.set_sample(clip)
            node.play()
            got = render(node, 8)[0]
            np.testing.assert_array_equal(got, data[0, : got.shape[0]], err_msg=q)

    def test_rate_one_sinc8_near_exact(self):
        # f32 sin(pi*k) is not exactly 0 at integer taps — near-exact only
        clip, _ = sine_clip(frames=4096)
        data = np.asarray(clip.data)
        node = SamplerNode(100.0, quality="sinc8")
        node.set_sample(clip)
        node.play()
        got = render(node, 8)[0]
        assert np.abs(got - data[0, : got.shape[0]]).max() < 1e-5


class TestLoopAndLifecycle:
    @pytest.mark.parametrize("quality", ["cubic", "sinc8"])
    def test_loop_wrap_is_finite_and_seamless(self, quality):
        # loop a 0.25-cycle-aligned sine region: taps wrapping across the
        # join see a continuous waveform, so no interpolation spikes
        cps = 1.0 / 250.0  # one cycle == 250 frames
        clip, _ = sine_clip(frames=2000, cycles_per_sample=cps)
        node = SamplerNode(100.0, quality=quality)
        node.set_sample(clip)
        node.set_loop_range(LoopRange.range_secs(0.0, 500.0 / SR))  # 2 cycles
        node.set_playback_rate(0.61)
        node.play()
        got = render(node, 30)[0]
        assert np.isfinite(got).all()
        pos = np.fmod(np.arange(got.shape[0], dtype=np.float64) * 0.61, 500.0)
        want = np.sin(2 * np.pi * cps * pos)
        assert np.abs(got[8:] - want[8:]).max() < 0.02, quality

    def test_one_shot_end_stays_silent(self):
        clip, _ = sine_clip(frames=300)
        node = SamplerNode(100.0, quality="sinc8")
        node.set_sample(clip)
        node.play()
        got = render(node, 5)[0]  # 640 frames > 300-frame clip
        assert np.isfinite(got).all()
        assert np.all(got[320:] == 0.0)

    def test_quality_is_a_pooling_key(self):
        clip, _ = sine_clip(frames=100)
        a = SamplerNode(100.0, poolable=True, quality="linear")
        b = SamplerNode(100.0, poolable=True, quality="sinc8")
        a.set_sample(clip)
        b.set_sample(clip)
        pa = a.activate(SR, F, 0, 1)
        pb = b.activate(SR, F, 0, 1)
        assert pa.group_key() != pb.group_key()


def test_sinc8_vs_scipy_polyphase_reference():
    """Cross-check against scipy's kaiser-windowed polyphase resampler at a
    rational rate (0.5: every other output sample needs the half-sample
    interpolant).  Different windows -> loose tolerance; this guards gross
    phase/index errors rather than window shape."""
    scipy_signal = pytest.importorskip("scipy.signal")
    cps = 0.009
    clip, _ = sine_clip(frames=24000, cycles_per_sample=cps)
    data = np.asarray(clip.data)[0]
    node = SamplerNode(100.0, quality="sinc8")
    node.set_sample(clip)
    node.set_playback_rate(0.5)
    node.play()
    got = render(node, 20)[0]
    want = scipy_signal.resample_poly(data.astype(np.float64), 2, 1)[: got.shape[0]]
    assert np.abs(got[16:-16] - want[16:-16]).max() < 5e-3


class TestClipSampleRate:
    """SampleResource.sample_rate: auto rate conversion + clip-time seeks."""

    def _peak_hz(self, audio, sr=SR):
        spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
        return float(np.fft.rfftfreq(len(audio), 1 / sr)[spec.argmax()])

    def test_rated_clip_plays_native_pitch(self):
        """A 1 kHz sine recorded at 44.1 kHz must sound at 1 kHz in a
        48 kHz stream (auto rate 44100/48000), not at 1.088 kHz."""
        clip_sr = 44100.0
        n = 44100
        x = np.sin(2 * np.pi * 1000.0 * np.arange(n) / clip_sr)
        node = SamplerNode(100.0, quality="sinc8")
        node.set_sample(SampleResource(
            x[None, :].astype(np.float32), sample_rate=clip_sr, device=False
        ))
        node.play()
        got = render(node, 60)[0]
        assert abs(self._peak_hz(got) - 1000.0) < 10.0

    def test_unrated_clip_keeps_reference_behavior(self):
        """No sample_rate on the resource -> frames map 1:1 (the
        reference's PCM semantics): the same clip sounds at ~1088 Hz."""
        clip_sr = 44100.0
        n = 44100
        x = np.sin(2 * np.pi * 1000.0 * np.arange(n) / clip_sr)
        node = SamplerNode(100.0)
        node.set_sample(SampleResource(x[None, :].astype(np.float32), device=False))
        node.play()
        got = render(node, 60)[0]
        assert abs(self._peak_hz(got) - 48000.0 / 44.1) < 12.0

    def test_seek_addresses_clip_time(self):
        """set_playhead(secs) on a rated clip lands at secs * clip_sr."""
        clip_sr = 32000.0
        n = 32000
        x = np.zeros(n, np.float32)
        marker = 16000  # = 0.5 s of clip time
        x[marker:marker + 8] = 1.0
        node = SamplerNode(100.0)
        node.set_sample(SampleResource(
            x[None, :], sample_rate=clip_sr, device=False
        ))
        node.set_playhead(0.5)
        node.play()
        got = render(node, 4)[0]
        onset = int(np.argmax(np.abs(got) > 0.5))
        assert onset <= 2  # marker plays immediately after the seek

    def test_rate_composes_with_playback_rate(self):
        """User rate 2.0 on a rated clip doubles the native pitch."""
        clip_sr = 44100.0
        n = 44100
        x = np.sin(2 * np.pi * 1000.0 * np.arange(n) / clip_sr)
        node = SamplerNode(100.0, quality="cubic")
        node.set_sample(SampleResource(
            x[None, :].astype(np.float32), sample_rate=clip_sr, device=False
        ))
        node.set_playback_rate(2.0)
        node.play()
        got = render(node, 60)[0]
        assert abs(self._peak_hz(got) - 2000.0) < 15.0
