"""Audio format loading: a pluggable decoder registry.

Reference scope: "Support for loading a wide variety of audio formats (using
Symphonia)" (``DESIGN_DOC.md:32``; the reference never wired a decoder).
The Symphonia analog here is a *registry*: built-in decoders for the formats
the environment can read without third-party code (WAV incl. IEEE-float and
the IMA/MS ADPCM game-asset flavors — ``utils/adpcm.py`` — AIFF, AU, FLAC —
``core/flac.py``), and :func:`register_format` for plugging any external
decoder (ffmpeg wrapper, miniaudio binding, a network codec, ...).

``load_audio(path)`` → :class:`SampleResource` ready for the sampler.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from .sample_resource import SampleResource

__all__ = ["load_audio", "register_format", "supported_formats"]

# ext (lowercase, with dot) → loader(path) -> (f32[ch, frames], sample_rate)
_LOADERS: dict[str, Callable] = {}


def register_format(extensions, loader: Callable) -> None:
    """Register ``loader(path) -> (f32[channels, frames], sample_rate)`` for
    the given extension(s)."""
    if isinstance(extensions, str):
        extensions = [extensions]
    for ext in extensions:
        _LOADERS[ext.lower() if ext.startswith(".") else "." + ext.lower()] = (
            loader
        )


def supported_formats() -> list[str]:
    return sorted(_LOADERS)


def load_audio(path: str, device: bool = True):
    """Decode an audio file → ``(SampleResource, sample_rate)``."""
    ext = os.path.splitext(path)[1].lower()
    loader = _LOADERS.get(ext)
    if loader is None:
        raise ValueError(
            f"no decoder registered for {ext!r}; supported: "
            f"{supported_formats()} (register_format to extend)"
        )
    audio, sample_rate = loader(path)
    # the resource carries its native rate, so samplers auto-convert when
    # the stream runs at a different rate (SampleResource.sample_rate)
    return (
        SampleResource(
            np.asarray(audio, np.float32),
            sample_rate=float(sample_rate),
            device=device,
        ),
        int(sample_rate),
    )


# -- built-in decoders --------------------------------------------------------

def _load_wav(path):
    from ..utils.wav import read_wav

    return read_wav(path)


def _pcm_bytes_to_f32(raw: bytes, sampwidth: int, big_endian: bool) -> np.ndarray:
    if sampwidth == 1:
        # Both callers are AIFF and AU, whose 8-bit sample points are
        # SIGNED two's complement (unlike WAV's unsigned u8, decoded in
        # utils/wav.py) — decoding as unsigned would offset the waveform
        # by half-scale and wrap it.
        return np.frombuffer(raw, np.int8).astype(np.float32) / 127.0
    if sampwidth == 2:
        dt = ">i2" if big_endian else "<i2"
        return np.frombuffer(raw, dt).astype(np.float32) / 32767.0
    if sampwidth == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        if big_endian:
            val = (
                (b[:, 0].astype(np.int32) << 16)
                | (b[:, 1].astype(np.int32) << 8)
                | b[:, 2]
            )
        else:
            val = (
                (b[:, 2].astype(np.int32) << 16)
                | (b[:, 1].astype(np.int32) << 8)
                | b[:, 0]
            )
        val = (val ^ 0x800000) - 0x800000  # sign-extend 24-bit
        return val.astype(np.float32) / 8388607.0
    if sampwidth == 4:
        dt = ">i4" if big_endian else "<i4"
        return np.frombuffer(raw, dt).astype(np.float32) / 2147483647.0
    raise ValueError(f"unsupported sample width {sampwidth}")


def _load_aiff(path):
    import aifc

    with aifc.open(path, "rb") as f:
        ch = f.getnchannels()
        sr = int(f.getframerate())
        n = f.getnframes()
        raw = f.readframes(n)
        flat = _pcm_bytes_to_f32(raw, f.getsampwidth(), big_endian=True)
    return flat.reshape(n, ch).T.copy(), sr


def _load_au(path):
    try:
        import sunau
    except ImportError as e:  # pragma: no cover (removed in py3.13)
        raise ValueError("AU decoding unavailable on this Python") from e

    with sunau.open(path, "rb") as f:
        ch = f.getnchannels()
        sr = int(f.getframerate())
        n = f.getnframes()
        raw = f.readframes(n)
        flat = _pcm_bytes_to_f32(raw, f.getsampwidth(), big_endian=True)
    return flat.reshape(n, ch).T.copy(), sr


register_format([".wav", ".wave"], _load_wav)
try:  # aifc exists through py3.12 (removed in 3.13)
    import aifc as _aifc  # noqa: F401

    register_format([".aif", ".aiff", ".aifc"], _load_aiff)
except ImportError:  # pragma: no cover
    pass
try:  # sunau exists through py3.12
    import sunau as _sunau  # noqa: F401

    register_format([".au", ".snd"], _load_au)
except ImportError:  # pragma: no cover
    pass


def _load_flac(path):
    from .flac import decode_flac

    return decode_flac(path)


register_format([".flac"], _load_flac)
