"""MP3 and Ogg Vorbis codec bindings (system libraries via ctypes) and
the stream-reader registry (DESIGN_DOC.md:32-33 "loading a wide variety
of audio formats (using Symphonia)" — Symphonia's MP3/OGG slice).

Lossy codecs can't be golden-tested bit-exactly; the contract tested
here is the one the framework relies on:

* exact frame counts (gapless — a music loop must not grow or shrink),
* high-correlation reconstruction of band-limited content,
* sample-exact windowed reads (the stream reader must return the same
  samples as the whole-file decode at every offset, or StreamingSampler
  prefetch windows would glitch at span boundaries),
* zero-padding outside [0, len_frames) matching WavStreamReader.
"""

import os

import numpy as np
import pytest

from firewheel_tpu.core.formats import (
    load_audio,
    open_stream_reader,
    register_stream_reader,
    supported_formats,
    supported_stream_formats,
)
from firewheel_tpu.utils import mp3, vorbis

SR = 44100


def make_tone(frames, channels=2):
    t = np.arange(frames, dtype=np.float64) / SR
    return np.stack([
        (0.4 * np.sin(2 * np.pi * 220.0 * (c + 1) * t)).astype(np.float32)
        for c in range(channels)
    ])


def correlation(a, b):
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])


mp3_ok = mp3.available()
vorbis_ok = vorbis.available()
needs_mp3 = pytest.mark.skipif(
    not (mp3_ok["decode"] and mp3_ok["encode"]),
    reason="system libmpg123/libmp3lame unavailable",
)
needs_vorbis = pytest.mark.skipif(
    not (vorbis_ok["decode"] and vorbis_ok["encode"]),
    reason="system libvorbis unavailable",
)


@needs_mp3
class TestMp3:
    def test_roundtrip_stereo_gapless(self, tmp_path):
        audio = make_tone(SR)
        p = str(tmp_path / "t.mp3")
        mp3.encode_mp3(p, audio, SR)
        dec, rate = mp3.decode_mp3(p)
        assert rate == SR
        # LAME tag → mpg123 trims encoder delay+padding: exact length
        assert dec.shape == audio.shape
        core = slice(2000, SR - 2000)
        assert correlation(audio[:, core], dec[:, core]) > 0.999

    def test_roundtrip_mono(self, tmp_path):
        audio = make_tone(SR // 2, channels=1)
        p = str(tmp_path / "m.mp3")
        mp3.encode_mp3(p, audio[0], SR)
        dec, rate = mp3.decode_mp3(p)
        assert dec.shape == (1, SR // 2)
        core = slice(2000, SR // 2 - 2000)
        assert correlation(audio[:, core], dec[:, core]) > 0.999

    def test_three_channels_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="mono or stereo"):
            mp3.encode_mp3(str(tmp_path / "x.mp3"),
                           np.zeros((3, 1024), np.float32), SR)

    def test_stream_reader_matches_full_decode(self, tmp_path):
        audio = make_tone(SR)
        p = str(tmp_path / "t.mp3")
        mp3.encode_mp3(p, audio, SR)
        dec, _ = mp3.decode_mp3(p)
        r = mp3.Mp3StreamReader(p)
        assert (r.num_channels, r.sample_rate) == (2, SR)
        assert r.len_frames == dec.shape[1]
        # sequential, then random access (backward seek), then tail
        for start in (0, 512, 1024, 30000, 7777, r.len_frames - 100):
            n = 512
            w = r.read(start, n)
            end = min(start + n, r.len_frames)
            np.testing.assert_array_equal(w[:, : end - start],
                                          dec[:, start:end])
            assert np.all(w[:, end - start:] == 0.0)
        r.close()

    def test_stream_reader_padding(self, tmp_path):
        audio = make_tone(8192)
        p = str(tmp_path / "t.mp3")
        mp3.encode_mp3(p, audio, SR)
        dec, _ = mp3.decode_mp3(p)
        r = mp3.Mp3StreamReader(p)
        pre = r.read(-64, 128)
        assert np.all(pre[:, :64] == 0.0)
        np.testing.assert_array_equal(pre[:, 64:], dec[:, :64])
        assert np.all(r.read(r.len_frames + 10, 64) == 0.0)
        assert pre.shape == (2, 128)
        r.close()

    def test_load_audio_registry(self, tmp_path):
        assert ".mp3" in supported_formats()
        audio = make_tone(SR // 4)
        p = str(tmp_path / "t.mp3")
        mp3.encode_mp3(p, audio, SR)
        res, rate = load_audio(p, device=False)
        assert rate == SR
        assert res.len_frames == SR // 4


@needs_vorbis
class TestVorbis:
    def test_roundtrip_stereo_exact_length(self, tmp_path):
        audio = make_tone(SR)
        p = str(tmp_path / "t.ogg")
        vorbis.encode_vorbis(p, audio, SR)
        dec, rate = vorbis.decode_vorbis(p)
        assert rate == SR
        assert dec.shape == audio.shape  # granulepos-exact, no padding
        core = slice(2000, SR - 2000)
        assert correlation(audio[:, core], dec[:, core]) > 0.999

    def test_roundtrip_mono_and_quality(self, tmp_path):
        audio = make_tone(SR // 2, channels=1)
        p_lo = str(tmp_path / "lo.ogg")
        p_hi = str(tmp_path / "hi.ogg")
        vorbis.encode_vorbis(p_lo, audio[0], SR, quality=0.0)
        vorbis.encode_vorbis(p_hi, audio[0], SR, quality=0.9)
        assert os.path.getsize(p_hi) > os.path.getsize(p_lo)
        dec, _ = vorbis.decode_vorbis(p_hi)
        assert dec.shape == (1, SR // 2)
        core = slice(2000, SR // 2 - 2000)
        assert correlation(audio[:, core], dec[:, core]) > 0.999

    def test_stream_reader_matches_full_decode(self, tmp_path):
        audio = make_tone(SR)
        p = str(tmp_path / "t.ogg")
        vorbis.encode_vorbis(p, audio, SR)
        dec, _ = vorbis.decode_vorbis(p)
        r = vorbis.VorbisStreamReader(p)
        assert (r.num_channels, r.sample_rate) == (2, SR)
        assert r.len_frames == dec.shape[1]
        for start in (0, 512, 30000, 7777, r.len_frames - 100):
            n = 512
            w = r.read(start, n)
            end = min(start + n, r.len_frames)
            np.testing.assert_array_equal(w[:, : end - start],
                                          dec[:, start:end])
            assert np.all(w[:, end - start:] == 0.0)
        pre = r.read(-64, 128)
        assert np.all(pre[:, :64] == 0.0)
        np.testing.assert_array_equal(pre[:, 64:], dec[:, :64])
        r.close()

    def test_load_audio_registry(self, tmp_path):
        assert ".ogg" in supported_formats()
        audio = make_tone(SR // 4)
        p = str(tmp_path / "t.ogg")
        vorbis.encode_vorbis(p, audio, SR)
        res, rate = load_audio(p, device=False)
        assert rate == SR
        assert res.len_frames == SR // 4


class TestStreamReaderRegistry:
    def test_wav_and_flac_registered(self):
        regs = supported_stream_formats()
        assert ".wav" in regs and ".flac" in regs

    def test_open_wav(self, tmp_path):
        from firewheel_tpu.utils.wav import write_wav

        audio = make_tone(4096)
        p = str(tmp_path / "t.wav")
        write_wav(p, audio, SR)
        r = open_stream_reader(p)
        assert r.len_frames == 4096
        np.testing.assert_allclose(r.read(128, 256), audio[:, 128:384],
                                   atol=2e-4)
        r.close()

    def test_unknown_extension_message(self):
        with pytest.raises(ValueError, match="register_stream_reader"):
            open_stream_reader("x.xyz")

    def test_register_custom(self):
        class Dummy:
            num_channels, sample_rate, len_frames = 1, SR, 0

            def __init__(self, path):
                self.path = path

            def read(self, s, n):
                return np.zeros((1, n), np.float32)

            def close(self):
                pass

        register_stream_reader(".dummy", Dummy)
        r = open_stream_reader("a.DUMMY".lower())
        assert isinstance(r, Dummy)
        # extension matching is case-insensitive on the path side
        assert isinstance(open_stream_reader("b.DuMmY"), Dummy)


class TestPathConvenience:
    """Readers-or-paths: every deck/sampler entry point coerces a path
    string through the stream registry (``as_stream_reader``)."""

    def _wav(self, tmp_path, freq=440.0, secs=0.5):
        from firewheel_tpu.utils.wav import write_wav

        n = int(SR * secs)
        t = np.arange(n) / SR
        audio = np.stack([np.sin(2 * np.pi * freq * t)] * 2)
        audio = (audio * 0.5).astype(np.float32)
        p = str(tmp_path / "clip.wav")
        write_wav(p, audio, SR)
        return p, audio

    def test_as_stream_reader_coercion(self, tmp_path):
        from firewheel_tpu.core.formats import as_stream_reader

        p, audio = self._wav(tmp_path)
        r = as_stream_reader(p)
        assert r.len_frames == audio.shape[1]
        # passthrough: an existing reader is returned untouched
        assert as_stream_reader(r) is r

    def test_streaming_sampler_accepts_path(self, tmp_path):
        from firewheel_tpu.nodes.streaming_sampler import StreamingSamplerNode

        p, audio = self._wav(tmp_path)
        node = StreamingSamplerNode(p)
        assert node._reader.len_frames == audio.shape[1]
        node.set_reader(p)
        assert node._reader.len_frames == audio.shape[1]

    def test_music_player_plays_path(self, tmp_path):
        from firewheel_tpu import ArraySink, FirewheelCtx, MusicPlayer, StreamConfig

        p, audio = self._wav(tmp_path)
        cx = FirewheelCtx()
        player = MusicPlayer(
            cx.graph_mut(), clock=lambda: cx.stream.frames_rendered
        )
        sink = ArraySink()
        cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
        player.play(p)
        cx.render_offline(0.25)
        player.update()
        cx.deactivate()
        L = sink.audio(2)[0]
        assert np.max(np.abs(L)) > 0.3


from firewheel_tpu.utils import opus as opus_mod

opus_ok = opus_mod.available()
needs_opus = pytest.mark.skipif(
    not (opus_ok["decode"] and opus_ok["encode"]),
    reason="system libopus unavailable",
)
SR48 = 48000


def tone48(frames, channels=2):
    t = np.arange(frames, dtype=np.float64) / SR48
    return np.stack([
        (0.4 * np.sin(2 * np.pi * 220.0 * (c + 1) * t)).astype(np.float32)
        for c in range(channels)
    ])


@needs_opus
class TestOpus:
    """Ogg Opus: in-tree Ogg framing + system libopus (utils/opus.py)."""

    def test_roundtrip_stereo_gapless(self, tmp_path):
        audio = tone48(SR48)
        p = str(tmp_path / "t.opus")
        opus_mod.encode_opus(p, audio, SR48, bitrate_kbps=128)
        dec, rate = opus_mod.decode_opus(p)
        assert rate == SR48
        # preskip + final-granule trim → frame-count exact (gapless)
        assert dec.shape == audio.shape
        core = slice(2000, SR48 - 2000)
        assert correlation(audio[:, core], dec[:, core]) > 0.999

    def test_roundtrip_mono_24k(self, tmp_path):
        audio = tone48(12000, channels=1)
        p = str(tmp_path / "m.opus")
        opus_mod.encode_opus(p, audio[0], 24000)
        dec, rate = opus_mod.decode_opus(p)
        # Opus reconstructs at 48 kHz: 12000 frames @24k → 24000 @48k
        assert rate == SR48 and dec.shape == (1, 24000)

    def test_non_opus_rate_auto_resamples(self, tmp_path):
        # 44.1 kHz input converts offline to 48 kHz (utils/resample.py)
        sr_in = 44100
        t = np.arange(sr_in, dtype=np.float64) / sr_in
        audio = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        p = str(tmp_path / "cd.opus")
        opus_mod.encode_opus(p, audio, sr_in)
        dec, rate = opus_mod.decode_opus(p)
        assert rate == SR48 and dec.shape == (1, SR48)  # 1 s either way
        w = np.abs(np.fft.rfft(dec[0] * np.hanning(SR48)))
        assert abs(np.argmax(w) * SR48 / SR48 - 440.0) < 2.0

    def test_stream_forward_reads_bit_exact(self, tmp_path):
        audio = tone48(SR48)
        p = str(tmp_path / "t.opus")
        opus_mod.encode_opus(p, audio, SR48)
        dec, _ = opus_mod.decode_opus(p)
        r = opus_mod.OpusStreamReader(p)
        assert (r.num_channels, r.sample_rate, r.len_frames) == \
            (2, SR48, SR48)
        # forward-from-zero, sequential, and gap reads continue the
        # decoder: identical to the whole-file decode
        assert np.array_equal(r.read(10_000, 4096), dec[:, 10_000:14_096])
        assert np.array_equal(r.read(14_096, 4096), dec[:, 14_096:18_192])
        assert np.array_equal(r.read(30_000, 2048), dec[:, 30_000:32_048])
        # loop back to 0: reset == fresh decoder → exact (gapless loops)
        assert np.array_equal(r.read(0, 4096), dec[:, :4096])
        r.close()

    def test_stream_backward_seek_converged(self, tmp_path):
        audio = tone48(SR48)
        p = str(tmp_path / "t.opus")
        opus_mod.encode_opus(p, audio, SR48)
        dec, _ = opus_mod.decode_opus(p)
        r = opus_mod.OpusStreamReader(p)
        r.read(40_000, 1024)
        w = r.read(20_000, 4096)  # backward: 640 ms preroll
        assert np.max(np.abs(w - dec[:, 20_000:24_096])) < 1e-4
        r.close()

    def test_stream_eof_and_negative_zero_pad(self, tmp_path):
        audio = tone48(8192)
        p = str(tmp_path / "s.opus")
        opus_mod.encode_opus(p, audio, SR48)
        r = opus_mod.OpusStreamReader(p)
        tail = r.read(r.len_frames - 64, 256)
        assert np.all(tail[:, 64:] == 0)
        head = r.read(-32, 64)
        assert np.all(head[:, :32] == 0)
        r.close()

    def test_registry_integration(self, tmp_path):
        audio = tone48(4800)
        p = str(tmp_path / "r.opus")
        opus_mod.encode_opus(p, audio, SR48)
        assert ".opus" in supported_formats()
        assert ".opus" in supported_stream_formats()
        res, rate = load_audio(p, device=False)
        assert rate == SR48
        assert np.asarray(res.data).shape == audio.shape
        rr = open_stream_reader(p)
        assert rr.len_frames == 4800
        rr.close()

    def test_ogg_crc_and_spanning_packets(self, tmp_path):
        """Ogg layer invariants: pages we build carry a valid Ogg CRC,
        and packets spanning pages (>64 KB of lacing) reassemble."""
        from firewheel_tpu.utils.opus import _build_page, _ogg_crc, \
            _parse_packets
        pkt = bytes(range(256)) * 3  # 768 bytes → 4 lacing segments
        page = _build_page(7, 0, 960, [pkt], 0x02)
        body = bytearray(page)
        import struct as _s
        crc_stored = _s.unpack("<I", body[22:26])[0]
        body[22:26] = b"\0\0\0\0"
        assert _ogg_crc(bytes(body)) == crc_stored
        pkts, granule = _parse_packets(page)
        assert pkts == [pkt] and granule == 960
        # a packet exactly 255*k bytes needs the 0-lacing terminator
        pkt2 = b"\xab" * 510
        page2 = _build_page(7, 1, 1920, [pkt2], 0x00)
        pkts2, _ = _parse_packets(page + page2)
        assert pkts2 == [pkt, pkt2]

    def test_byte_sources(self, tmp_path):
        """decode_opus / OpusStreamReader accept bytes and network-style
        byte sources (read_range + length), like FlacStreamReader."""
        audio = tone48(24000)
        p = str(tmp_path / "b.opus")
        opus_mod.encode_opus(p, audio, SR48)
        blob = open(p, "rb").read()
        ref, _ = opus_mod.decode_opus(p)
        dec, rate = opus_mod.decode_opus(blob)
        assert rate == SR48 and np.array_equal(dec, ref)

        class FakeSource:  # the HttpByteSource protocol
            def __init__(self, data):
                self.data, self.calls = data, 0

            def length(self):
                return len(self.data)

            def read_range(self, off, size):
                self.calls += 1
                return self.data[off:off + size]

        src = FakeSource(blob)
        r = opus_mod.OpusStreamReader(src)
        assert src.calls == 1  # one fetch: the scan needs the whole file
        assert np.array_equal(r.read(1000, 2048), ref[:, 1000:3048])
        r.close()

    def test_stream_writer_matches_whole_encode(self, tmp_path):
        """Incremental OpusStreamWriter (ragged appends) produces the
        byte-identical file to the one-shot encode_opus — same frames in,
        same encoder state, same pages out."""
        audio = tone48(20000)
        p1 = str(tmp_path / "whole.opus")
        p2 = str(tmp_path / "inc.opus")
        opus_mod.encode_opus(p1, audio, SR48)
        w = opus_mod.OpusStreamWriter(p2, SR48, 2)
        for a, b in ((0, 1), (1, 777), (777, 5000), (5000, 20000)):
            w.append(audio[:, a:b])
        w.finish()
        w.finish()  # idempotent
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_opus_sink_bounces_engine_stream(self, tmp_path):
        """OpusSink plugs into the engine like WavSink: a rendered tone
        bounces to a playable .opus with the exact stream length."""
        from firewheel_tpu import FirewheelCtx, StreamConfig
        from firewheel_tpu.nodes import BeepTestNode

        p = str(tmp_path / "bounce.opus")
        sink = opus_mod.OpusSink(p, SR48, 2)
        cx = FirewheelCtx()
        g = cx.graph_mut()
        beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        g.connect(beep, 0, g.graph_out_node(), 0)
        g.connect(beep, 1, g.graph_out_node(), 1)
        cx.activate(StreamConfig(SR48, 2, buffer_frames=512), sink=sink)
        cx.render_offline(0.5)
        cx.deactivate()
        sink.close()
        dec, rate = opus_mod.decode_opus(p)
        assert rate == SR48
        assert dec.shape[0] == 2 and dec.shape[1] % 512 == 0
        assert dec.shape[1] >= int(0.5 * SR48)
        seg = dec[0, 4000:16000]
        w = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.argmax(w) * SR48 / len(seg)
        assert abs(f - 440.0) < 5.0


    def test_chained_stream_decodes_first_link(self, tmp_path):
        """`cat a.opus b.opus` (chained Ogg) decodes link A exactly —
        the second link's OpusHead must not reach the codec as audio,
        and the end-trim must come from A's EOS granule, not B's
        restarted timeline."""
        a = tone48(9000)
        b = tone48(30000)
        pa = str(tmp_path / "a.opus")
        pb = str(tmp_path / "b.opus")
        opus_mod.encode_opus(pa, a, SR48)
        opus_mod.encode_opus(pb, b, SR48)
        ref, _ = opus_mod.decode_opus(pa)
        chained = open(pa, "rb").read() + open(pb, "rb").read()
        dec, rate = opus_mod.decode_opus(chained)
        assert rate == SR48 and np.array_equal(dec, ref)

    def test_forward_jump_prerolls_instead_of_decoding_through(
            self, tmp_path):
        """A forward jump past the preroll resets + pre-rolls (bounded
        work per read) instead of decoding every intermediate packet —
        the shared-reader looping-deck hot path — and still converges
        below audibility vs the whole-file decode."""
        audio = tone48(20 * SR48 // 10)  # 2 s
        p = str(tmp_path / "j.opus")
        opus_mod.encode_opus(p, audio, SR48)
        ref, _ = opus_mod.decode_opus(p)
        r = opus_mod.OpusStreamReader(p)
        r.read(0, 2048)  # decoder parked near the start
        calls = {"n": 0}
        orig = r._d.decode_packet

        def counting(pkt):
            calls["n"] += 1
            return orig(pkt)

        r._d.decode_packet = counting
        target = 80000  # far past _PREROLL (30720)
        win = r.read(target, 4096)
        # bounded: preroll + window ≈ 35k raw samples ≈ 37 packets of
        # 960; decoding through would be ~83 packets from sample ~2k
        assert calls["n"] < 50, calls["n"]
        assert np.max(np.abs(win - ref[:, target:target + 4096])) < 1e-3
        r.close()
