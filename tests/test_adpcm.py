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
