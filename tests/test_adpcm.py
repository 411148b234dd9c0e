"""ADPCM WAV support (utils/adpcm.py): golden vs independent decoders,
round-trip SNR, container round-trips incl. the fact-chunk trim, and
windowed streaming reads.

Reference scope: DESIGN_DOC.md:32-33 ("loading a wide variety of audio
formats (using Symphonia)") — IMA/MS ADPCM are the compressed WAV flavors
game assets ship.
"""

import struct

import numpy as np
import pytest

from firewheel_tpu.utils import adpcm
from firewheel_tpu.utils.wav import WavStreamReader, read_wav, write_wav

SR = 48000


def tone(frames, freq=440.0, amp=0.6, ch=1, sr=SR):
    t = np.arange(frames) / sr
    rows = [
        np.sin(2 * np.pi * freq * (1.0 + 0.1 * c) * t) * amp
        for c in range(ch)
    ]
    return np.asarray(rows, np.float32)


def snr_db(ref, test):
    err = ref.astype(np.float64) - test.astype(np.float64)
    return 10.0 * np.log10(
        (ref.astype(np.float64) ** 2).sum() / max((err ** 2).sum(), 1e-30)
    )


class TestImaGolden:
    def test_decoder_matches_audioop(self):
        """audioop (CPython's independent Intel/DVI IMA implementation)
        decodes our block payloads identically, given the same initial
        (predictor, index) state.  audioop packs the FIRST sample in the
        HIGH nibble; WAV-IMA packs low-first, so the comparison swaps
        nibbles."""
        audioop = pytest.importorskip("audioop")
        rng = np.random.default_rng(3)
        sig = (
            np.cumsum(rng.integers(-2000, 2000, 2041))
            .clip(-32000, 32000)
            .astype(np.int16)[None, :]
        )
        block_align = 1024
        payload, _ = adpcm.encode_ima(sig, block_align)
        mine = adpcm.decode_ima_blocks(payload, 1, block_align)

        spb = adpcm.ima_samples_per_block(block_align, 1)
        for b in range(len(payload) // block_align):
            block = payload[b * block_align : (b + 1) * block_align]
            pred = struct.unpack("<h", block[:2])[0]
            idx = block[2]
            body = np.frombuffer(block[4:], np.uint8)
            swapped = ((body << 4) | (body >> 4)).astype(np.uint8).tobytes()
            ref, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
            ref = np.frombuffer(ref, "<i2")
            got = mine[0, b * spb : (b + 1) * spb]
            assert got[0] == pred  # header predictor IS sample 0
            np.testing.assert_array_equal(got[1:], ref)

    def test_round_trip_snr(self):
        sig = (tone(9000) * 32767).astype(np.int16)
        payload, frames = adpcm.encode_ima(sig, 1024)
        dec = adpcm.decode_ima_blocks(payload, 1, 1024)[:, :frames]
        assert snr_db(sig, dec) > 26.0

    def test_stereo_channel_isolation(self):
        """A silent right channel must stay silent through the per-group
        channel interleave (catches group-ordering bugs)."""
        left = (tone(4096) * 32767).astype(np.int16)[0]
        sig = np.stack([left, np.zeros_like(left)])
        payload, frames = adpcm.encode_ima(sig, 2048)
        dec = adpcm.decode_ima_blocks(payload, 2, 2048)[:, :frames]
        assert np.abs(dec[1]).max() <= 8  # quantizer noise floor only
        assert snr_db(sig[0], dec[0]) > 26.0


def ms_decode_scalar(block: bytes, ch: int):
    """From-spec scalar MS ADPCM block decoder (independent expression
    of the RIFF registry algorithm; the library version is vectorized
    across blocks)."""
    bpred = list(block[:ch])
    delta = list(struct.unpack(f"<{ch}h", block[ch : 3 * ch]))
    s1 = list(struct.unpack(f"<{ch}h", block[3 * ch : 5 * ch]))
    s2 = list(struct.unpack(f"<{ch}h", block[5 * ch : 7 * ch]))
    coef1 = [int(adpcm.MS_COEFFS[p, 0]) for p in bpred]
    coef2 = [int(adpcm.MS_COEFFS[p, 1]) for p in bpred]
    out = [[s2[c], s1[c]] for c in range(ch)]
    nibbles = []
    for byte in block[7 * ch :]:
        nibbles.append(byte >> 4)
        nibbles.append(byte & 0x0F)
    for i, n in enumerate(nibbles):
        c = i % ch
        signed = n - 16 if n >= 8 else n
        pred = (s1[c] * coef1[c] + s2[c] * coef2[c]) >> 8
        samp = max(-32768, min(32767, pred + signed * delta[c]))
        out[c].append(samp)
        s2[c], s1[c] = s1[c], samp
        delta[c] = max(16, (int(adpcm.MS_ADAPT[n]) * delta[c]) >> 8)
    return np.asarray(out, np.int16)


class TestMsGolden:
    @pytest.mark.parametrize("ch", [1, 2])
    def test_decoder_matches_scalar_reference(self, ch):
        rng = np.random.default_rng(7)
        frames = 3000
        sig = (
            np.cumsum(rng.integers(-1500, 1500, (ch, frames)), axis=1)
            .clip(-32000, 32000)
            .astype(np.int16)
        )
        block_align = 512 * ch
        payload, _ = adpcm.encode_ms(sig, block_align)
        mine = adpcm.decode_ms_blocks(payload, ch, block_align)
        spb = adpcm.ms_samples_per_block(block_align, ch)
        for b in range(len(payload) // block_align):
            ref = ms_decode_scalar(
                payload[b * block_align : (b + 1) * block_align], ch
            )
            np.testing.assert_array_equal(
                mine[:, b * spb : (b + 1) * spb], ref
            )

    def test_round_trip_snr(self):
        sig = (tone(9000) * 32767).astype(np.int16)
        payload, frames = adpcm.encode_ms(sig, 1024)
        dec = adpcm.decode_ms_blocks(payload, 1, 1024)[:, :frames]
        assert snr_db(sig, dec) > 26.0


class TestWavContainer:
    @pytest.mark.parametrize("dtype", ["ima", "ms"])
    def test_write_read_round_trip(self, tmp_path, dtype):
        sig = tone(10111, ch=2)  # deliberately NOT a block multiple
        p = str(tmp_path / f"clip_{dtype}.wav")
        write_wav(p, sig, SR, dtype=dtype)
        audio, sr = read_wav(p)
        assert sr == SR
        assert audio.shape == sig.shape  # fact chunk trims the pad
        assert snr_db(sig, audio) > 26.0

    @pytest.mark.parametrize("dtype", ["ima", "ms"])
    def test_stream_reader_windows_match_full_decode(self, tmp_path, dtype):
        sig = tone(9000, ch=2)
        p = str(tmp_path / f"stream_{dtype}.wav")
        write_wav(p, sig, SR, dtype=dtype)
        full, _ = read_wav(p)
        r = WavStreamReader(p)
        assert r.num_channels == 2
        assert r.len_frames == sig.shape[1]
        # windowed reads at non-block-aligned offsets, incl. pre-roll
        # and past-EOF zero-padding
        for start, n in [(0, 777), (333, 2048), (-100, 500),
                         (8990, 64), (1023, 1026)]:
            got = r.read(start, n)
            want = np.zeros((2, n), np.float32)
            s = max(0, start)
            e = min(start + n, sig.shape[1])
            if e > s:
                want[:, s - start : e - start] = full[:, s:e]
            np.testing.assert_array_equal(got, want)

    def test_load_audio_adpcm(self, tmp_path):
        from firewheel_tpu.core.formats import load_audio

        sig = tone(5000, ch=2)
        p = str(tmp_path / "fx.wav")
        write_wav(p, sig, SR, dtype="ima")
        res, sr = load_audio(p, device=False)
        assert sr == SR
        assert snr_db(sig, np.asarray(res.data)) > 26.0

    def test_streaming_sampler_plays_adpcm(self, tmp_path):
        """End to end: an ADPCM music bed streams through the engine."""
        from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
        from firewheel_tpu.nodes.streaming_sampler import (
            StreamingSamplerNode,
        )

        sig = tone(SR // 2, ch=2)
        p = str(tmp_path / "bed.wav")
        write_wav(p, sig, SR, dtype="ms")

        cx = FirewheelCtx()
        g = cx.graph_mut()
        node = StreamingSamplerNode()
        node.set_reader(WavStreamReader(p))
        node.play()
        src = g.add_node(0, 2, node)
        g.connect(src, 0, g.graph_out_node(), 0)
        g.connect(src, 1, g.graph_out_node(), 1)
        sink = ArraySink()
        cx.activate(StreamConfig(SR, 2, buffer_frames=128), sink=sink)
        cx.render_offline(0.25)
        cx.deactivate()
        out = sink.audio(2)[:, : SR // 4]
        assert snr_db(sig[:, : SR // 4], out) > 24.0


class TestMsTruncatingDivision:
    """The MS predictor is ``(s1·c1 + s2·c2) / 256`` with C integer
    division (truncation toward zero).  ``>> 8`` floors, which is 1 low
    whenever the weighted history is negative and not a multiple of 256
    — coefficient pairs 3–6 hit this constantly (pairs 0–2 are multiples
    of 256, so round-trips with the in-tree encoder can't catch it)."""

    def test_decode_matches_scalar_spec_reference(self):
        ch, block_align = 1, 15  # spb = 2 + 8*2 = 18
        coeff_idx = 5  # [460, -208]: not multiples of 256
        s2, s1, delta = 1, -3, 16
        rng = np.random.default_rng(9)
        nibbles = rng.integers(0, 16, 16).tolist()
        # q = 460·(-3) + (-208)·1 = -1588: floor -7, trunc -6 — sample 0
        # separates the two conventions immediately
        blk = bytearray()
        blk.append(coeff_idx)
        blk += struct.pack("<hhh", delta, s1, s2)
        for i in range(0, 16, 2):
            blk.append((nibbles[i] << 4) | nibbles[i + 1])
        assert len(blk) == block_align

        def scalar_ref():
            c1, c2 = 460, -208
            _s1, _s2, d = s1, s2, delta
            out = [s2, s1]
            for n in nibbles:
                signed = n - 16 if n >= 8 else n
                q = _s1 * c1 + _s2 * c2
                pred = -((-q) // 256) if q < 0 else q // 256
                smp = max(-32768, min(32767, pred + signed * d))
                out.append(smp)
                _s2, _s1 = _s1, smp
                d = max((int(adpcm.MS_ADAPT[n]) * d) // 256, 16)
            return np.asarray(out, np.int16)

        dec = adpcm.decode_ms_blocks(bytes(blk), ch, block_align)
        np.testing.assert_array_equal(dec[0], scalar_ref())


class TestTruncatedTailBlock:
    """RIFF allows a truncated final ADPCM block; its bytes still decode
    to real frames (review r4: the tail was silently dropped, cutting up
    to spb−1 frames off the end of third-party files)."""

    def test_ima_partial_tail_decodes(self):
        sig = tone(1200, ch=1)
        payload, frames = adpcm.encode_ima(sig[0] * 32767, block_align=256)
        spb = adpcm.ima_samples_per_block(256, 1)  # 505
        full = adpcm.decode_ima_blocks(payload, 1, 256)
        # keep block 0 + header + 2 payload groups of block 1
        cut = payload[: 256 + 4 + 8]
        dec = adpcm.decode_ima_blocks(cut, 1, 256)
        assert dec.shape[1] == spb + 1 + 2 * 8
        np.testing.assert_array_equal(dec, full[:, : dec.shape[1]])
        # a tail shorter than its header is dropped
        dec2 = adpcm.decode_ima_blocks(payload[: 256 + 3], 1, 256)
        assert dec2.shape[1] == spb

    def test_ms_partial_tail_decodes(self):
        sig = tone(1200, ch=1)
        payload, frames = adpcm.encode_ms(sig[0] * 32767, block_align=256)
        spb = adpcm.ms_samples_per_block(256, 1)  # 500
        full = adpcm.decode_ms_blocks(payload, 1, 256)
        cut = payload[: 256 + 7 + 5]  # header + 5 data bytes = 10 frames
        dec = adpcm.decode_ms_blocks(cut, 1, 256)
        assert dec.shape[1] == spb + 2 + 10
        np.testing.assert_array_equal(dec, full[:, : dec.shape[1]])

    def _truncated_wav(self, tmp_path, dtype):
        """write_wav output with the data chunk surgically truncated
        mid-final-block and sizes/fact rewritten (what a spec-legal
        third-party writer produces)."""
        sig = tone(1600, ch=1)
        p = str(tmp_path / f"trunc_{dtype}.wav")
        write_wav(p, sig, SR, dtype=dtype)
        data = bytearray(open(p, "rb").read())
        # walk chunks to the data chunk
        pos = 12
        while pos + 8 <= len(data):
            cid = bytes(data[pos : pos + 4])
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            if cid == b"data":
                break
            pos += 8 + size + (size & 1)
        assert cid == b"data"
        block_align = struct.unpack("<H", data[32:34])[0]
        hdr = 4 if dtype == "ima" else 7
        cut = size - block_align + hdr + 8  # tail: header + 8 data bytes
        data[pos + 4 : pos + 8] = struct.pack("<I", cut)
        del data[pos + 8 + cut :]
        data[4:8] = struct.pack("<I", len(data) - 8)
        out = str(tmp_path / f"trunc_{dtype}_cut.wav")
        open(out, "wb").write(bytes(data))
        if dtype == "ima":
            spb = adpcm.ima_samples_per_block(block_align, 1)
            tail = 1 + 8 // 4 * 8
        else:
            spb = adpcm.ms_samples_per_block(block_align, 1)
            tail = 2 + 8 * 2
        n_blocks = cut // block_align
        return out, p, n_blocks * spb + tail

    @pytest.mark.parametrize("dtype", ["ima", "ms"])
    def test_truncated_wav_reads_tail_frames(self, tmp_path, dtype):
        cut_path, full_path, want = self._truncated_wav(tmp_path, dtype)
        full_audio, _ = read_wav(full_path)
        audio, sr = read_wav(cut_path)
        # the original fact chunk survives and may clamp below the block
        # capacity; the decoded prefix must match the full file exactly
        assert audio.shape[1] == min(want, full_audio.shape[1])
        np.testing.assert_array_equal(
            audio, full_audio[:, : audio.shape[1]]
        )
        r = WavStreamReader(cut_path)
        assert r.len_frames == audio.shape[1]
        np.testing.assert_allclose(
            r.read(0, r.len_frames), audio, atol=0, rtol=0
        )
