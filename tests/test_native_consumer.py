"""Native paced consumer: pacing, sink forwarding, underflow accounting.

The C++ consumer (``backend/native/consumer.cpp``) replaces the Python
paced thread in realtime mode; these tests drive it through the public
OutputStream/FirewheelCtx surface and through the raw binding.
"""

import time

import numpy as np
import pytest

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.backend.ring_buffer import NativeConsumer, RingBuffer
from firewheel_tpu.nodes import BeepTestNode

SR = 48000


def _beep_ctx(cfg, sink):
    cx = FirewheelCtx()
    g = cx.graph
    b = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    g.connect(b, 0, g.graph_out_node(), 0)
    g.connect(b, 1, g.graph_out_node(), 1)
    cx.activate(cfg, sink=sink)
    return cx


def test_native_consumer_binding_paces_and_forwards():
    rb_in = RingBuffer(4096)
    rb_out = RingBuffer(65536)
    if not rb_in.is_native:
        pytest.skip("no native toolchain")
    period = 0.004
    c = NativeConsumer(rb_in, rb_out, period, floats_per_period=64)
    data = np.arange(1, 64 * 30 + 1, dtype=np.float32)
    fed = 0
    t0 = time.time()
    while fed < data.size and time.time() - t0 < 2.0:
        fed += rb_in.write(data[fed : fed + 64])
        time.sleep(0.001)
    time.sleep(5 * period)
    periods = c.periods
    c.stop()
    assert periods >= 10
    out = np.zeros(64 * 40, np.float32)
    got = rb_out.read(out)
    vals = out[:got][out[:got] != 0]
    # forwarded frames preserve order (zero-fills may interleave on starts)
    assert vals.size > 0 and np.all(np.diff(vals) > 0)


def test_native_consumer_counts_underflows_when_starved():
    rb_in = RingBuffer(4096)
    rb_out = RingBuffer(65536)
    if not rb_in.is_native:
        pytest.skip("no native toolchain")
    c = NativeConsumer(rb_in, rb_out, 0.002, floats_per_period=64)
    time.sleep(0.05)  # never fed: every period starves
    under = c.underflows
    flag = c.take_underflow()
    c.stop()
    assert under >= 5 and flag


def test_realtime_stream_uses_native_consumer():
    sink = ArraySink()
    cx = _beep_ctx(
        StreamConfig(SR, 2, buffer_frames=256, realtime=True), sink
    )
    stream = cx._active.stream
    t0 = time.time()
    while time.time() - t0 < 0.5:
        cx.update()
        time.sleep(0.002)
    stats = stream.stats()
    cx.deactivate()
    if stats.get("consumer") != "native":
        pytest.skip("native consumer unavailable in this environment")
    assert stats["consumer_periods"] > 10
    audio = sink.audio(2)
    # paced output reached the sink through the out-ring drain
    assert audio.shape[1] >= 256 * 10
    # beep present in the non-zero-filled region
    assert np.abs(audio).max() == pytest.approx(0.2512, abs=2e-3)


def test_realtime_python_fallback_still_works(monkeypatch):
    import firewheel_tpu.backend.stream as sm

    # force the fallback path
    monkeypatch.setattr(
        sm,
        "NativeConsumer",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("forced")),
    )
    sink = ArraySink()
    cx = _beep_ctx(
        StreamConfig(SR, 2, buffer_frames=256, realtime=True), sink
    )
    stream = cx._active.stream
    t0 = time.time()
    while time.time() - t0 < 0.4:
        cx.update()
        time.sleep(0.002)
    stats = stream.stats()
    cx.deactivate()
    assert stats["consumer"] == "python"
    assert sink.audio(2).shape[1] >= 256 * 5
