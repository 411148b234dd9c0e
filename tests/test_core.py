"""Core-layer tests: silence masks, unit conversions, ranges, interleave.

Reference behaviors cited per test.
"""

import numpy as np
import pytest

from firewheel_tpu.core import (
    LinearRange,
    NormToFreqRange,
    NormToPowRange,
    SilenceMask,
    db_to_gain,
    db_to_gain_clamped_neg_100_db,
    gain_to_db,
    gain_to_db_clamped_neg_100_db,
    mask_from_bools,
    mask_to_bools,
    percent_volume_to_raw_gain,
)
from firewheel_tpu.core.interleave import (
    clear_all_outputs,
    deinterleave,
    deinterleave_stereo,
    interleave,
    interleave_stereo,
)


class TestSilenceMask:
    # silence_mask.rs:7-74
    def test_constants(self):
        assert SilenceMask.NONE_SILENT.bits == 0
        assert SilenceMask.MONO_SILENT.bits == 0b1
        assert SilenceMask.STEREO_SILENT.bits == 0b11

    def test_new_all_silent(self):
        assert SilenceMask.new_all_silent(0).bits == 0
        assert SilenceMask.new_all_silent(3).bits == 0b111
        assert SilenceMask.new_all_silent(64).bits == (1 << 64) - 1

    def test_channel_queries(self):
        m = SilenceMask(0b101)
        assert m.is_channel_silent(0)
        assert not m.is_channel_silent(1)
        assert m.is_channel_silent(2)
        assert m.any_channel_silent(1)
        assert not SilenceMask(0b100).any_channel_silent(2)
        assert SilenceMask(0b11).all_channels_silent(2)
        assert not SilenceMask(0b01).all_channels_silent(2)
        assert SilenceMask((1 << 64) - 1).all_channels_silent(64)

    def test_set_channel(self):
        m = SilenceMask.NONE_SILENT.set_channel(3, True)
        assert m.bits == 0b1000
        assert m.set_channel(3, False).bits == 0

    def test_bool_roundtrip(self):
        flags = np.array([True, False, True, True])
        m = mask_from_bools(flags)
        assert (mask_to_bools(m, 4) == flags).all()


class TestUnits:
    # util.rs:7-41
    def test_db_to_gain(self):
        assert np.isclose(db_to_gain(np.float32(0.0)), 1.0)
        assert np.isclose(db_to_gain(np.float32(-6.0)), 10 ** (-6 / 20), rtol=1e-6)
        assert np.isclose(db_to_gain(np.float32(20.0)), 10.0, rtol=1e-6)

    def test_gain_to_db(self):
        assert np.isclose(gain_to_db(np.float32(1.0)), 0.0)
        assert np.isclose(gain_to_db(np.float32(10.0)), 20.0, rtol=1e-6)

    def test_clamped(self):
        assert db_to_gain_clamped_neg_100_db(np.float32(-100.0)) == 0.0
        assert db_to_gain_clamped_neg_100_db(np.float32(-101.0)) == 0.0
        assert db_to_gain_clamped_neg_100_db(np.float32(-99.0)) > 0.0
        assert gain_to_db_clamped_neg_100_db(np.float32(0.0)) == -100.0
        assert gain_to_db_clamped_neg_100_db(np.float32(0.00001)) == -100.0
        assert gain_to_db_clamped_neg_100_db(np.float32(1.0)) == 0.0

    def test_percent_volume(self):
        # range.rs:32-35: (p/100)^2
        assert percent_volume_to_raw_gain(np.float32(0.0)) == 0.0
        assert percent_volume_to_raw_gain(np.float32(100.0)) == 1.0
        assert np.isclose(percent_volume_to_raw_gain(np.float32(50.0)), 0.25)
        assert percent_volume_to_raw_gain(np.float32(-10.0)) == 0.0
        assert np.isclose(percent_volume_to_raw_gain(np.float32(200.0)), 4.0)

    def test_jax_parity(self):
        import jax.numpy as jnp

        for v in [-12.0, 0.0, 6.0]:
            np.testing.assert_allclose(
                np.asarray(db_to_gain(jnp.float32(v))),
                db_to_gain(np.float32(v)),
                rtol=1e-6,
            )


class TestRanges:
    # range.rs:1-125
    def test_linear(self):
        r = LinearRange(0.0, 1.0)
        assert r.clamp(np.float32(0.5)) == 0.5
        assert r.clamp(np.float32(2.0)) == 1.0
        assert r.clamp(np.float32(-1.0)) == 0.0
        rr = LinearRange(1.0, 0.0)  # reversed range quirk (range.rs:15-19)
        assert rr.clamp(np.float32(2.0)) == 1.0
        assert rr.clamp(np.float32(-1.0)) == 0.0

    def test_norm_to_freq(self):
        r = NormToFreqRange(20.0, 20_000.0)
        assert r.to_hz(np.float32(0.0)) == 20.0
        assert r.to_hz(np.float32(1.0)) == 20_000.0
        assert r.to_hz(np.float32(-1.0)) == 20.0
        mid = r.to_hz(np.float32(0.5))
        assert np.isclose(mid, np.sqrt(20.0 * 20000.0), rtol=1e-3)

    def test_norm_to_pow(self):
        r = NormToPowRange(0.0, 10.0, 2.0)
        assert r.to_dsp(np.float32(0.0)) == 0.0
        assert r.to_dsp(np.float32(1.0)) == 10.0
        assert np.isclose(r.to_dsp(np.float32(0.5)), 2.5)


class TestInterleave:
    # util.rs:44-175
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        chans = rng.standard_normal((3, 16)).astype(np.float32)
        inter = np.zeros(16 * 3, np.float32)
        interleave(chans, inter, 3)
        back = np.zeros_like(chans)
        mask = deinterleave(back, inter, 3, True)
        np.testing.assert_array_equal(back, chans)
        assert mask.bits == 0

    def test_deinterleave_extra_channels_silent(self):
        inter = np.ones(8 * 2, np.float32)
        chans = np.zeros((4, 8), np.float32)
        mask = deinterleave(chans, inter, 2, True)
        assert not mask.is_channel_silent(0)
        assert mask.is_channel_silent(2) and mask.is_channel_silent(3)
        assert (chans[2:] == 0).all()

    def test_deinterleave_detects_silence(self):
        inter = np.zeros(8 * 2, np.float32)
        inter[0::2] = 1.0  # channel 0 loud, channel 1 silent
        chans = np.zeros((2, 8), np.float32)
        mask = deinterleave(chans, inter, 2, True)
        assert not mask.is_channel_silent(0)
        assert mask.is_channel_silent(1)

    def test_interleave_honors_mask(self):
        chans = np.ones((2, 8), np.float32)
        inter = np.full(16, 7.0, np.float32)
        interleave(chans, inter, 2, SilenceMask(0b10))
        assert (inter[0::2] == 1.0).all()
        assert (inter[1::2] == 0.0).all()  # silent channel zeroed, not copied

    def test_stereo_fast_paths(self):
        l = np.arange(8, dtype=np.float32)
        r = -np.arange(8, dtype=np.float32)
        inter = np.zeros(16, np.float32)
        interleave_stereo(l, r, inter)
        assert (inter[0::2] == l).all() and (inter[1::2] == r).all()
        l2, r2 = np.zeros(8, np.float32), np.zeros(8, np.float32)
        deinterleave_stereo(l2, r2, inter)
        np.testing.assert_array_equal(l2, l)
        np.testing.assert_array_equal(r2, r)
        interleave_stereo(l, r, inter, SilenceMask.STEREO_SILENT)
        assert (inter == 0).all()

    def test_clear_all_outputs(self):
        outs = np.ones((3, 8), np.float32)
        mask = clear_all_outputs(8, outs)
        assert (outs == 0).all()
        assert mask.all_channels_silent(3)
