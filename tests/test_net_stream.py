"""Network streaming tests: a localhost HTTP server with byte-range support
stands in for a CDN; HttpWavStreamReader must match the disk reader span for
span, and a full StreamingSamplerNode render over HTTP must equal the
disk-streamed render (DESIGN_DOC "disk and network streaming" scope)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.nodes import StreamingSamplerNode
from firewheel_tpu.utils.net_stream import (
    HttpByteSource,
    HttpWavStreamReader,
    SegmentCache,
)
from firewheel_tpu.utils.wav import WavStreamReader, write_wav

SR = 48000


def make_audio(frames, channels=2, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((channels, frames)) * 0.3).astype(np.float32)


class _RangeHandler(BaseHTTPRequestHandler):
    """Serves self.server.files (path -> bytes) honoring Range requests."""

    honor_range = True

    def do_GET(self):
        body = self.server.files.get(self.path)
        if body is None:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        if rng and self.honor_range:
            spec = rng.split("=", 1)[1]
            lo_s, hi_s = spec.split("-", 1)
            lo = int(lo_s)
            hi = min(int(hi_s) if hi_s else len(body) - 1, len(body) - 1)
            chunk = body[lo : hi + 1]
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {lo}-{hi}/{len(body)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)
        else:
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    def log_message(self, *a):  # quiet test output
        pass


class _NoRangeHandler(_RangeHandler):
    honor_range = False


@pytest.fixture
def http_server():
    """Yields (base_url, files dict); files added by tests before requests."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    srv.files = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", srv.files
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_byte_source_ranges(http_server):
    base, files = http_server
    files["/blob"] = bytes(range(256)) * 100  # 25600 bytes
    src = HttpByteSource(base + "/blob")
    assert src.length() == 25600
    assert src.read_range(0, 4) == bytes([0, 1, 2, 3])
    assert src.read_range(255, 3) == bytes([255, 0, 1])
    # EOF short read, and past-EOF empty
    assert src.read_range(25598, 10) == bytes([254, 255])
    assert src.read_range(30000, 8) == b""
    # non-http scheme rejected
    with pytest.raises(ValueError):
        HttpByteSource("https://example.com/x")


def test_segment_cache_coalesces(http_server):
    base, files = http_server
    files["/blob"] = np.arange(100000, dtype=np.uint8).tobytes()
    src = HttpByteSource(base + "/blob")
    cache = SegmentCache(src, segment_bytes=4096, max_segments=8)
    ref = files["/blob"]
    assert cache.read(100, 50) == ref[100:150]
    n0 = src.request_count
    # same span again: pure cache hit
    assert cache.read(100, 50) == ref[100:150]
    assert src.request_count == n0
    # span crossing segments
    assert cache.read(4090, 20) == ref[4090:4110]
    # sequential sweep stays bounded: one request per new segment + length probe
    before = src.request_count
    for off in range(0, 32768, 1000):
        assert cache.read(off, 1000) == ref[off : off + 1000]
    assert src.request_count - before <= 8


def test_http_wav_reader_matches_disk(http_server, tmp_path):
    base, files = http_server
    audio = make_audio(SR)  # 1 s stereo
    for dtype, atol in (("f32", 1e-7), ("i16", 1e-4)):
        path = str(tmp_path / f"clip_{dtype}.wav")
        write_wav(path, audio, SR, dtype=dtype)
        files[f"/clip_{dtype}.wav"] = open(path, "rb").read()
        net = HttpWavStreamReader(
            base + f"/clip_{dtype}.wav", segment_bytes=8192
        )
        disk = WavStreamReader(path)
        assert (net.num_channels, net.len_frames, net.sample_rate) == (
            disk.num_channels,
            disk.len_frames,
            disk.sample_rate,
        )
        for start, n in [(0, 256), (1000, 777), (-64, 128), (SR - 10, 64)]:
            np.testing.assert_allclose(
                net.read(start, n), disk.read(start, n), atol=atol
            )


def test_rangeless_server_full_download_fallback(tmp_path):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _NoRangeHandler)
    audio = make_audio(4096)
    path = str(tmp_path / "c.wav")
    write_wav(path, audio, SR)
    srv.files = {"/c.wav": open(path, "rb").read()}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/c.wav"
        net = HttpWavStreamReader(url)
        np.testing.assert_allclose(net.read(0, 4096), audio, atol=1e-7)
        # whole file arrived in one response; later reads add no requests
        n0 = net.source.request_count
        net.read(1000, 512)
        assert net.source.request_count == n0
    finally:
        srv.shutdown()
        srv.server_close()


def test_streaming_sampler_over_http(http_server, tmp_path):
    """End-to-end: network-streamed playback == disk-streamed playback."""
    base, files = http_server
    secs = 0.6
    audio = make_audio(int(SR * secs))
    path = str(tmp_path / "clip.wav")
    write_wav(path, audio, SR)
    files["/clip.wav"] = open(path, "rb").read()

    def render(reader):
        cx = FirewheelCtx()
        g = cx.graph_mut()
        smp = g.add_node(
            0, 2, StreamingSamplerNode(reader, window_secs=0.25)
        )
        g.connect(smp, 0, g.graph_out_node(), 0)
        g.connect(smp, 1, g.graph_out_node(), 1)
        sink = ArraySink()
        cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
        g.node(smp).play()
        cx.render_offline(secs + 0.1)
        cx.deactivate()
        return sink.audio(2)

    net_reader = HttpWavStreamReader(base + "/clip.wav", segment_bytes=65536)
    got = render(net_reader)
    want = render(WavStreamReader(path))
    np.testing.assert_allclose(got, want, atol=1e-7)
    # and it actually played audio, not silence
    assert float(np.abs(got).max()) > 0.01
    # bounded request volume: segments are fetched once
    assert net_reader.source.request_count < 30
