"""Disk/network streaming sampler tests: windowed playback matches fully
resident playback; window refills stay bounded; starvation degrades to
silence (DESIGN_DOC sampler streaming scope)."""

import numpy as np
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.nodes import (
    CallbackStreamReader,
    SamplerNode,
    StreamingSamplerNode,
)
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.utils.wav import WavStreamReader, write_wav

SR = 48000


def make_audio(frames, channels=2, seed=5):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((channels, frames)) * 0.3).astype(np.float32)


def render_ctx(node_factory, secs, buffer_frames=512):
    cx = FirewheelCtx()
    g = cx.graph_mut()
    smp = g.add_node(0, 2, node_factory())
    g.connect(smp, 0, g.graph_out_node(), 0)
    g.connect(smp, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=buffer_frames), sink=sink)
    node = g.node(smp)
    yield_obj = (cx, node, sink)
    return yield_obj


def test_wav_stream_reader_windows(tmp_path):
    audio = make_audio(SR)  # 1 s
    path = str(tmp_path / "a.wav")
    write_wav(path, audio, SR)
    r = WavStreamReader(path)
    assert r.num_channels == 2 and r.len_frames == SR and r.sample_rate == SR
    np.testing.assert_allclose(r.read(1000, 256), audio[:, 1000:1256], atol=1e-7)
    # EOF zero-padding
    tail = r.read(SR - 10, 64)
    np.testing.assert_allclose(tail[:, :10], audio[:, -10:], atol=1e-7)
    assert (tail[:, 10:] == 0).all()
    # PCM16 roundtrip within quantization
    path16 = str(tmp_path / "b.wav")
    write_wav(path16, audio, SR, dtype="i16")
    r16 = WavStreamReader(path16)
    np.testing.assert_allclose(
        r16.read(0, 100), np.clip(audio[:, :100], -1.0, 1.0), atol=1e-4
    )


def test_streaming_matches_resident(tmp_path):
    """Windowed disk playback == the in-memory sampler, and the window stays
    a fraction of the clip."""
    secs = 1.0
    audio = make_audio(int(SR * secs))
    path = str(tmp_path / "clip.wav")
    write_wav(path, audio, SR)

    # streaming playback with a 0.25 s window over a 1 s file
    cx, node, sink = render_ctx(
        lambda: StreamingSamplerNode(WavStreamReader(path), window_secs=0.25),
        secs,
    )
    node.play()
    cx.render_offline(0.8)
    proc = cx.stream._processor
    from firewheel_tpu.executor import node_key
    streaming_proc = [
        p for p in proc._processors.values()
        if hasattr(p, "refill_count")
    ][0]
    refills = streaming_proc.refill_count
    window_frames = streaming_proc.window_frames
    cx.deactivate()
    got = sink.audio(2)

    # resident playback of the same clip
    cx2, node2, sink2 = render_ctx(lambda: SamplerNode(100.0), secs)
    node2.set_sample(SampleResource(audio, device=False))
    node2.play()
    cx2.render_offline(0.8)
    cx2.deactivate()
    want = sink2.audio(2)

    n = min(got.shape[1], want.shape[1], int(0.75 * SR))
    np.testing.assert_allclose(got[:, :n], want[:, :n], atol=1e-6)
    assert window_frames <= SR // 4 + 2048  # window stayed small
    assert refills >= 3  # it actually slid


def test_callback_reader_network_style():
    frames = SR // 2
    audio = make_audio(frames, channels=1, seed=9)
    calls = []

    def fetch(start, n):
        calls.append((start, n))
        out = np.zeros((1, n), np.float32)
        end = min(start + n, frames)
        if end > start:
            out[:, : end - start] = audio[:, start:end]
        return out

    reader = CallbackStreamReader(fetch, 1, frames, SR)
    cx, node, sink = render_ctx(
        lambda: StreamingSamplerNode(reader, window_secs=0.1), 0.6
    )
    node.play()
    cx.render_offline(0.6)
    cx.deactivate()
    got = sink.audio(2)
    n = min(got.shape[1], frames)
    np.testing.assert_allclose(got[0, :n], audio[0, :n], atol=1e-6)
    assert (got[0, frames:] == 0).all()  # one-shot end → silence
    assert len(calls) >= 3


def test_seek_and_rate(tmp_path):
    audio = make_audio(SR)
    path = str(tmp_path / "c.wav")
    write_wav(path, audio, SR)
    cx, node, sink = render_ctx(
        lambda: StreamingSamplerNode(WavStreamReader(path), window_secs=0.2),
        0.5,
    )
    node.set_playhead(0.5)
    node.play()
    cx.render_offline(0.2)
    cx.deactivate()
    got = sink.audio(2)
    start = SR // 2
    n = min(got.shape[1], 4000)
    np.testing.assert_allclose(
        got[:, :n], audio[:, start : start + n], atol=1e-6
    )


def test_streaming_with_chunked_dispatch(tmp_path):
    """chunk_buffers > 1 renders K blocks per collect_params — the shadow
    playhead must advance by the whole chunk or the window starves."""
    from firewheel_tpu import StreamConfig

    secs = 1.0
    audio = make_audio(int(SR * secs))
    path = str(tmp_path / "chunked.wav")
    write_wav(path, audio, SR)

    cx = FirewheelCtx()
    g = cx.graph_mut()
    smp = g.add_node(
        0, 2, StreamingSamplerNode(WavStreamReader(path), window_secs=0.25)
    )
    g.connect(smp, 0, g.graph_out_node(), 0)
    g.connect(smp, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=512, chunk_buffers=4), sink=sink
    )
    g.node(smp).play()
    cx.render_offline(0.8)
    cx.deactivate()
    got = sink.audio(2)
    n = int(0.75 * SR)
    np.testing.assert_allclose(got[:, :n], audio[:, :n], atol=1e-6)


def test_rated_reader_plays_native_pitch():
    """A 24 kHz-rated stream reader in a 48 kHz stream auto-converts:
    a 600 Hz clip tone sounds at 600 Hz (not 1200), and seeks address
    clip time (SampleResource.sample_rate contract)."""
    clip_sr = 24000
    n = clip_sr * 2
    tone = np.sin(2 * np.pi * 600.0 * np.arange(n) / clip_sr).astype(np.float32)

    def read(start, num):
        out = np.zeros((1, num), np.float32)
        avail = max(0, min(num, n - start))
        if avail:
            out[0, :avail] = tone[start:start + avail]
        return out

    reader = CallbackStreamReader(read, 1, n, sample_rate=clip_sr)
    cx = FirewheelCtx()
    g = cx.graph_mut()
    node = StreamingSamplerNode(reader)
    smp = g.add_node(0, 1, node)
    g.connect(smp, 0, g.graph_out_node(), 0)
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 1, buffer_frames=512), sink=sink)
    node.set_playhead(0.5)  # clip time: frame 12000 of the 24k clip
    node.play()
    cx.render_offline(0.5)
    cx.deactivate()
    a = sink.audio(1)[0]
    a = a[512:]  # skip the gain ramp-in
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    peak = float(np.fft.rfftfreq(len(a), 1 / SR)[spec.argmax()])
    assert abs(peak - 600.0) < 8.0, peak
