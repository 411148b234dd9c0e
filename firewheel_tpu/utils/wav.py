"""Minimal WAV read/write supporting 16-bit PCM and 32-bit IEEE float,
plus a seekable windowed reader for disk streaming."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["write_wav", "read_wav", "WavStreamReader"]


def write_wav(path: str, audio: np.ndarray, sample_rate: int, dtype: str = "f32"):
    """Write ``audio`` (``[channels, frames]`` or ``[frames]``) to a WAV file.

    ``dtype``: ``"f32"`` (IEEE float, format 3) or ``"i16"`` (PCM).
    """
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    ch, frames = audio.shape
    interleaved = audio.T.reshape(-1)

    if dtype == "f32":
        fmt_code, bits = 3, 32
        payload = interleaved.astype("<f4").tobytes()
    elif dtype == "i16":
        fmt_code, bits = 1, 16
        clipped = np.clip(interleaved, -1.0, 1.0)
        payload = (clipped * 32767.0).astype("<i2").tobytes()
    else:
        raise ValueError(f"unsupported dtype {dtype}")

    byte_rate = sample_rate * ch * bits // 8
    block_align = ch * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVEfmt ")
        f.write(
            struct.pack(
                "<IHHIIHH", 16, fmt_code, ch, sample_rate, byte_rate, block_align, bits
            )
        )
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def read_wav(path: str):
    """Read a WAV file → ``(audio [channels, frames] f32, sample_rate)``."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV file"
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    assert fmt is not None and payload is not None
    fmt_code, ch, sample_rate, _, _, bits = fmt
    if fmt_code == 3 and bits == 32:
        x = np.frombuffer(payload, "<f4").astype(np.float32)
    elif fmt_code == 1 and bits == 16:
        x = np.frombuffer(payload, "<i2").astype(np.float32) / 32767.0
    else:
        raise ValueError(f"unsupported wav format {fmt_code}/{bits}")
    frames = len(x) // ch
    return x[: frames * ch].reshape(frames, ch).T.copy(), sample_rate


class WavStreamReader:
    """Windowed WAV access without loading the file: parses the header once
    and memory-maps the data chunk, so ``read(start, n)`` touches only the
    pages it needs.  Satisfies the stream-reader protocol used by
    :class:`~firewheel_tpu.nodes.streaming_sampler.StreamingSamplerNode`
    (``num_channels``, ``len_frames``, ``sample_rate``, ``read``)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            head = f.read(12)
            assert head[:4] == b"RIFF" and head[8:12] == b"WAVE", "not a WAV"
            fmt = None
            data_off = data_size = None
            pos = 12
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
                if cid == b"fmt ":
                    fmt = struct.unpack("<HHIIHH", f.read(16))
                    f.seek(size - 16, 1)
                elif cid == b"data":
                    data_off, data_size = f.tell(), size
                    f.seek(size + (size & 1), 1)
                else:
                    f.seek(size + (size & 1), 1)
        assert fmt is not None and data_off is not None, "malformed WAV"
        fmt_code, ch, sr, _, _, bits = fmt
        if fmt_code == 3 and bits == 32:
            dtype, self._scale = "<f4", None
        elif fmt_code == 1 and bits == 16:
            dtype, self._scale = "<i2", np.float32(1.0 / 32767.0)
        else:
            raise ValueError(f"unsupported wav format {fmt_code}/{bits}")
        self.num_channels = ch
        self.sample_rate = sr
        self.len_frames = data_size // (ch * bits // 8)
        self._mm = np.memmap(
            path,
            dtype=dtype,
            mode="r",
            offset=data_off,
            shape=(self.len_frames, ch),
        )

    def read(self, start_frame: int, num_frames: int) -> np.ndarray:
        """``f32[channels, n]``; reads outside [0, len_frames) zero-pad —
        pre-roll (negative start) yields leading zeros at the correct
        positions, not time-shifted audio."""
        start_frame = int(start_frame)
        start = max(0, start_frame)
        lead = start - start_frame  # zeros before frame 0
        end = min(start_frame + num_frames, self.len_frames)
        out = np.zeros((self.num_channels, num_frames), np.float32)
        if end > start:
            chunk = np.asarray(self._mm[start:end]).T
            if self._scale is not None:
                chunk = chunk.astype(np.float32) * self._scale
            out[:, lead : lead + (end - start)] = chunk
        return out
