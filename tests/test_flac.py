"""FLAC decode/encode: spec vectors assembled by hand, bit-exact
roundtrips across stereo modes and depths, windowed stream reading, and
a network-streamed FLAC music bed (DESIGN_DOC.md:33 "loading a wide
variety of audio formats" — the compressed-format slice)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from firewheel_tpu.core.flac import (
    FlacError,
    FlacStreamReader,
    _Bits,
    _read_coded_number,
    crc8,
    crc16,
    decode_flac,
)
from firewheel_tpu.core.formats import load_audio
from firewheel_tpu.utils.flac_encode import _BitWriter, _utf8_number, encode_flac

SR = 48000


def make_audio(frames, channels=2, seed=7, level=0.4):
    rng = np.random.default_rng(seed)
    t = np.arange(frames, dtype=np.float64)
    tone = np.stack([
        np.sin(2 * np.pi * (180.0 * (c + 1)) * t / SR) for c in range(channels)
    ])
    noise = rng.standard_normal((channels, frames)) * 0.02
    return (level * tone + noise).astype(np.float32)


def as_pcm(audio, bits=16):
    scale = float(1 << (bits - 1))
    return np.clip(np.rint(audio.astype(np.float64) * scale),
                   -scale, scale - 1).astype(np.int64)


# ---------------------------------------------------------------------------
# spec vectors, independent implementations


def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    """Bit-serial CRC, structurally independent of the table-driven one."""
    reg = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            fb = ((reg >> (width - 1)) & 1) ^ bit
            reg = ((reg << 1) & mask) ^ (poly if fb else 0)
    return reg


def test_crc_known_vectors():
    # CRC-8 (poly 0x07, init 0) of "123456789" is 0xF4; CRC-16/BUYPASS
    # (poly 0x8005, init 0, unreflected) is 0xFEE8 — published check
    # values for these parameterizations.
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    for data in (b"", b"\x00", b"fLaC", bytes(range(256))):
        assert crc8(data) == _crc_bitwise(data, 0x07, 8)
        assert crc16(data) == _crc_bitwise(data, 0x8005, 16)


def test_utf8_coded_number_roundtrip():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 21) - 1, 1 << 21, (1 << 31) + 12345, (1 << 36) - 1):
        blob = _utf8_number(n)
        br = _Bits(lambda off, size, b=blob: b[off:off + size], 0)
        assert _read_coded_number(br) == n, hex(n)
        assert br.pos == 8 * len(blob)


def _streaminfo(block, sr, ch, bits, total, md5=b"\x00" * 16) -> bytes:
    w = _BitWriter()
    w.write(block, 16); w.write(block, 16)
    w.write(0, 24); w.write(0, 24)
    w.write(sr, 20); w.write(ch - 1, 3); w.write(bits - 1, 5)
    w.write(total, 36)
    body = w.bytes() + md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(block, ch_code, bits_code) -> _BitWriter:
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)           # reserved + fixed blocking
    w.write(7, 4)           # block size: 16-bit follows
    w.write(0, 4)           # rate: STREAMINFO
    w.write(ch_code, 4)
    w.write(bits_code, 3)
    w.write(0, 1)
    w.write(0, 8)           # frame number 0
    w.write(block - 1, 16)
    w.write(crc8(bytes(w.buf)), 8)
    return w


def test_handmade_lpc_frame_decodes():
    """A frame assembled bit-by-bit from the spec: mono 16-bit, LPC
    order 1 (precision 4, shift 0, coeff +1 ⇒ x[i] = r[i] + x[i-1]),
    Rice k=1 residuals — exercises the LPC path our encoder never
    emits."""
    block = 6
    w = _frame_header(block, ch_code=0, bits_code=4)
    w.write(0, 1)               # subframe pad
    w.write(0b100000, 6)        # LPC order 1 (xxxxx=0 → order 1)
    w.write(0, 1)               # no wasted bits
    w.write(100 & 0xFFFF, 16)   # warm-up sample = 100
    w.write(4 - 1, 4)           # qlp precision 4
    w.write(0, 5)               # shift 0
    w.write(0b0001, 4)          # coeff +1
    w.write(0, 2)               # residual method: Rice (4-bit)
    w.write(0, 4)               # partition order 0
    w.write(1, 4)               # rice param k=1
    # residuals +1,+2,-1,0,+3 → zigzag 2,4,1,0,6 → (q=u>>1, r=u&1)
    for u in (2, 4, 1, 0, 6):
        w.write_unary(u >> 1)
        w.write(u & 1, 1)
    w.align()
    w.write(crc16(bytes(w.buf)), 16)
    blob = _streaminfo(block, SR, 1, 16, block) + w.bytes()
    audio, rate = decode_flac(blob)
    got = np.rint(audio[0] * 32768).astype(int)
    # x = 100, then +1,+2,-1,0,+3 accumulated
    np.testing.assert_array_equal(got, [100, 101, 103, 102, 102, 105])
    assert rate == SR


def test_handmade_wasted_bits_frame():
    """Wasted-bits flag: a constant subframe stored with 3 wasted bits
    must be shifted back up on decode."""
    block = 4
    w = _frame_header(block, ch_code=0, bits_code=4)
    w.write(0, 1)
    w.write(0b000000, 6)        # CONSTANT
    w.write(1, 1)               # wasted-bits flag
    w.write_unary(2)            # unary 2 → wasted = 3
    w.write((800 >> 3) & 0x1FFF, 13)  # 16-3 bits
    w.align()
    w.write(crc16(bytes(w.buf)), 16)
    blob = _streaminfo(block, SR, 1, 16, block) + w.bytes()
    audio, _ = decode_flac(blob)
    np.testing.assert_array_equal(
        np.rint(audio[0] * 32768).astype(int), [800] * block)


def test_corrupted_frame_raises():
    blob = bytearray(encode_flac(make_audio(2000), SR))
    blob[-40] ^= 0x10  # flip a bit in the last frame's coded data
    with pytest.raises(FlacError, match="CRC"):
        decode_flac(bytes(blob))


# ---------------------------------------------------------------------------
# roundtrips


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side", "auto"])
def test_roundtrip_stereo_modes(mode):
    audio = make_audio(5000)  # includes a short final frame (block 4096)
    pcm = as_pcm(audio)
    blob = encode_flac(audio, SR, stereo_mode=mode)
    out, rate = decode_flac(blob, verify_md5=True)
    np.testing.assert_array_equal(as_pcm(out), pcm)
    assert rate == SR


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_roundtrip_depths(bits):
    audio = make_audio(3000, channels=1)
    blob = encode_flac(audio, SR, bits=bits)
    out, _ = decode_flac(blob, verify_md5=True)
    np.testing.assert_array_equal(as_pcm(out, bits), as_pcm(audio, bits))


def test_roundtrip_partitions_and_silence():
    # leading digital silence → CONSTANT frames; partition order 2
    audio = make_audio(4096 * 3, channels=2)
    audio[:, :4096] = 0.0
    blob = encode_flac(audio, SR, partition_order=2)
    out, _ = decode_flac(blob, verify_md5=True)
    np.testing.assert_array_equal(as_pcm(out), as_pcm(audio))


def test_roundtrip_escape_partitions():
    """Sparse huge spikes make raw (escape) partitions cheaper than any
    Rice parameter — the escape path must roundtrip."""
    pcm = np.zeros((1, 4096), np.int64)
    pcm[0, ::512] = 30000  # 8 spikes
    blob = encode_flac(pcm, SR, max_fixed_order=0)
    assert b"\x00" != blob  # encoded something
    out, _ = decode_flac(blob, verify_md5=True)
    np.testing.assert_array_equal(as_pcm(out), pcm)


def test_load_audio_registry(tmp_path):
    audio = make_audio(2500)
    path = str(tmp_path / "bed.flac")
    encode_flac(audio, SR, path=path)
    res, rate = load_audio(path, device=False)
    assert rate == SR
    np.testing.assert_array_equal(as_pcm(res.host_data),
                                  as_pcm(audio))


# ---------------------------------------------------------------------------
# streaming


def test_stream_reader_matches_full_decode(tmp_path):
    audio = make_audio(SR // 2)
    path = str(tmp_path / "clip.flac")
    encode_flac(audio, SR, block_size=1024, path=path)
    full, _ = decode_flac(path)
    r = FlacStreamReader(path, cache_frames=4)
    assert r.num_channels == 2 and r.len_frames == SR // 2
    assert r.sample_rate == SR
    # forward windowed reads, unaligned spans
    for start, n in ((0, 100), (100, 3000), (3100, 1), (5000, 4096)):
        np.testing.assert_array_equal(r.read(start, n), full[:, start:start + n])
    # backward seek re-decodes from the frame index
    np.testing.assert_array_equal(r.read(50, 500), full[:, 50:550])
    # past-EOF reads zero-pad
    tail = r.read(SR // 2 - 10, 64)
    np.testing.assert_array_equal(tail[:, :10], full[:, -10:])
    assert np.all(tail[:, 10:] == 0)
    assert np.all(r.read(SR, 16) == 0)


def test_stream_reader_negative_start_preroll(tmp_path):
    """Pre-roll reads (negative start) yield leading zeros at the correct
    positions — matching WavStreamReader — not audio resolved from the
    frame index's newest entry (review r4: bisect on a negative start
    wrapped to the frontier once the index had grown)."""
    audio = make_audio(SR // 4)
    path = str(tmp_path / "clip.flac")
    encode_flac(audio, SR, block_size=1024, path=path)
    full, _ = decode_flac(path)
    r = FlacStreamReader(path, cache_frames=4)
    # grow the frame index first, so bisect has something to wrap into
    r.read(0, 5000)
    got = r.read(-100, 5000)
    assert np.all(got[:, :100] == 0)
    np.testing.assert_array_equal(got[:, 100:], full[:, : 5000 - 100])
    # fully-before-zero reads are all zeros
    assert np.all(r.read(-300, 200) == 0)


def test_native_lpc_matches_python_fallback():
    """backend/native/lpc.cpp and the pure-Python loop are bit-identical
    on a stable LPC recurrence (the native kernel is the hot decode path;
    the Python loop is the no-toolchain reference)."""
    from firewheel_tpu.core import flac as flac_mod

    lib = flac_mod._native_lpc()
    if lib is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    warm = rng.integers(-30000, 30000, 8)
    coeffs = [1024, 512, 512, 256, 256, 128, 128, 64]  # Σ < 2^12 (stable)
    resid = rng.integers(-(1 << 10), 1 << 10, 4096)
    nat = flac_mod._undo_lpc(np.asarray(warm), coeffs, 12, np.asarray(resid))
    saved = flac_mod._NATIVE_LPC
    try:
        flac_mod._NATIVE_LPC = None
        py = flac_mod._undo_lpc(
            np.asarray(warm), coeffs, 12, np.asarray(resid)
        )
    finally:
        flac_mod._NATIVE_LPC = saved
    np.testing.assert_array_equal(nat, py)


class _RangeHandler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = self.server.files.get(self.path)
        if body is None:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        if rng:
            lo_s, hi_s = rng.split("=", 1)[1].split("-", 1)
            lo = int(lo_s)
            hi = min(int(hi_s) if hi_s else len(body) - 1, len(body) - 1)
            chunk = body[lo:hi + 1]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {lo}-{hi}/{len(body)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)
        else:
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_network_streamed_flac_music_bed():
    """End-to-end: a FLAC music bed streamed over HTTP byte ranges
    through StreamingSamplerNode renders the same audio as a local
    full decode (DESIGN_DOC sampler 'disk and network streaming')."""
    from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
    from firewheel_tpu.nodes import StreamingSamplerNode
    from firewheel_tpu.utils.net_stream import HttpByteSource, SegmentCache

    secs = 0.5
    audio = make_audio(int(SR * secs))
    blob = encode_flac(audio, SR, block_size=1024)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    srv.files = {"/bed.flac": blob}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/bed.flac"
        cache = SegmentCache(HttpByteSource(url), segment_bytes=32768)
        reader = FlacStreamReader(cache)

        cx = FirewheelCtx()
        g = cx.graph_mut()
        smp = g.add_node(0, 2, StreamingSamplerNode(reader,
                                                    window_secs=0.25))
        g.connect(smp, 0, g.graph_out_node(), 0)
        g.connect(smp, 1, g.graph_out_node(), 1)
        sink = ArraySink()
        cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
        g.node(smp).play()
        cx.render_offline(secs + 0.1)
        cx.deactivate()
        got = sink.audio(2)
        want, _ = decode_flac(blob)
        n = want.shape[1]
        np.testing.assert_allclose(got[:, :n], want, atol=1e-6)
        assert float(np.abs(got).max()) > 0.01
    finally:
        srv.shutdown()
        srv.server_close()
