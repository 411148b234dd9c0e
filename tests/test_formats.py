"""Audio-format registry tests (DESIGN_DOC format-loading scope)."""

import aifc

import numpy as np
import pytest

from firewheel_tpu.core.formats import (
    load_audio,
    register_format,
    supported_formats,
)
from firewheel_tpu.utils.wav import write_wav

SR = 22050


def make_audio(frames=2000, channels=2):
    rng = np.random.default_rng(2)
    return np.clip(
        rng.standard_normal((channels, frames)) * 0.3, -1, 1
    ).astype(np.float32)


def test_wav_f32_and_i16(tmp_path):
    a = make_audio()
    for dtype, tol in (("f32", 1e-7), ("i16", 1e-4)):
        p = str(tmp_path / f"x_{dtype}.wav")
        write_wav(p, a, SR, dtype=dtype)
        res, sr = load_audio(p, device=False)
        assert sr == SR
        np.testing.assert_allclose(res.host_data, a, atol=tol)


def test_aiff(tmp_path):
    a = make_audio(channels=1)
    p = str(tmp_path / "x.aiff")
    with aifc.open(p, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        pcm = (a[0] * 32767.0).astype(">i2").tobytes()
        f.writeframes(pcm)
    res, sr = load_audio(p, device=False)
    assert sr == SR
    np.testing.assert_allclose(res.host_data, a, atol=1e-4)


def test_unknown_format_names_extensions(tmp_path):
    p = str(tmp_path / "x.xyz")
    open(p, "wb").write(b"\xff\xfb")
    with pytest.raises(ValueError, match="no decoder registered"):
        load_audio(p)


def test_register_custom_decoder(tmp_path):
    def fake_decoder(path):
        return np.ones((1, 100), np.float32) * 0.25, 8000

    register_format(".fake", fake_decoder)
    assert ".fake" in supported_formats()
    p = str(tmp_path / "x.fake")
    open(p, "w").write("")
    res, sr = load_audio(p, device=False)
    assert sr == 8000
    assert (res.host_data == 0.25).all()


def test_aiff_8bit_is_signed(tmp_path):
    """Review finding: AIFF/AU 8-bit sample points are SIGNED two's
    complement; decoding them as unsigned offsets the waveform by
    half-scale and wraps it."""
    p = str(tmp_path / "x8.aiff")
    samples = np.array([0, 64, 127, -64, -127], np.int8)
    with aifc.open(p, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(48000)
        f.writeframes(samples.tobytes())
    res, sr = load_audio(p, device=False)
    np.testing.assert_allclose(
        res.host_data[0], samples.astype(np.float32) / 127.0, atol=1e-7
    )
