"""Context + processor + streaming backend tests: the engine lifecycle
(activate → update → live edits → deactivate), schedule hot-swap with state
migration, stream fault tolerance, and the ring buffer.
"""

import threading
import time

import numpy as np
import pytest

from firewheel_tpu import (
    ArraySink,
    FirewheelCtx,
    GraphContext,
    RingBuffer,
    StreamConfig,
    UpdateStatus,
)
from firewheel_tpu.core.node import StreamStatus
from firewheel_tpu.nodes import BeepTestNode, VolumeNode
from firewheel_tpu.processor import ProcessorStatus

SR = 48000


class TestRingBuffer:
    @pytest.mark.parametrize("force_python", [False, True])
    def test_fifo_wraparound(self, force_python):
        rb = RingBuffer(16, force_python=force_python)
        assert rb.capacity == 16
        data = np.arange(10, dtype=np.float32)
        assert rb.write(data) == 10
        out = np.zeros(6, np.float32)
        assert rb.read(out) == 6
        np.testing.assert_array_equal(out, data[:6])
        assert rb.write(np.arange(10, 20, dtype=np.float32)) == 10
        assert rb.writable() == 2
        out2 = np.zeros(14, np.float32)
        assert rb.read(out2) == 14
        np.testing.assert_array_equal(out2, np.arange(6, 20, dtype=np.float32))

    def test_overfull_write_truncates(self):
        rb = RingBuffer(8)
        assert rb.write(np.zeros(100, np.float32)) == 8
        assert rb.write(np.zeros(1, np.float32)) == 0
        assert rb.skip(4) == 4
        assert rb.write(np.zeros(100, np.float32)) == 4

    def test_threaded_spsc(self):
        rb = RingBuffer(1 << 10)
        n = 100_000
        bad = []

        def produce():
            i = 0
            while i < n:
                i += rb.write(np.arange(i, min(i + 256, n), dtype=np.float32))

        def consume():
            i = 0
            buf = np.zeros(333, np.float32)
            while i < n:
                r = rb.read(buf)
                if r:
                    if not np.array_equal(buf[:r], np.arange(i, i + r, dtype=np.float32)):
                        bad.append(i)
                        return
                    i += r

        tp, tc = threading.Thread(target=produce), threading.Thread(target=consume)
        tp.start(), tc.start()
        tp.join(10), tc.join(10)
        assert not bad


def beep_graph(cx_or_graph, freq=440.0, db=-12.0):
    g = cx_or_graph.graph if hasattr(cx_or_graph, "graph") else cx_or_graph
    beep = g.add_node(0, 2, BeepTestNode(freq, db, True))
    g.connect(beep, 0, g.graph_out_node(), 0)
    g.connect(beep, 1, g.graph_out_node(), 1)
    return beep


class TestGraphContext:
    def test_activate_update_deactivate(self):
        cx = GraphContext()
        beep_graph(cx)
        proc = cx.activate(SR, 0, 2, 128, user_cx={"tag": 7})
        assert proc is not None
        assert cx.is_activated()
        assert cx.activate(SR, 0, 2, 128) is None  # double activate

        res = cx.update()  # compiles + ships schedule
        assert res.status == UpdateStatus.ACTIVE and res.graph_error is None

        out = np.zeros(128 * 2, np.float32)
        st = proc.process_interleaved(
            np.zeros(0, np.float32), out, 0, 2, 128, 0.0
        )
        assert st == ProcessorStatus.OK
        assert np.abs(out).max() > 0.01

        # handshake: drop-on-stop returns the user context
        def runner():
            for _ in range(200):
                s = proc.process_interleaved(
                    np.zeros(0, np.float32), out, 0, 2, 128, 0.0
                )
                if s == ProcessorStatus.DROP_PROCESSOR:
                    proc.drop()
                    return
                time.sleep(0.001)

        t = threading.Thread(target=runner)
        t.start()
        user_cx = cx.deactivate(stream_is_running=True)
        t.join(5)
        assert user_cx == {"tag": 7}
        assert not cx.is_activated()

    def test_live_schedule_swap_preserves_state(self):
        """Insert a node mid-stream; beep phase must continue (the
        ScheduleHeapData round trip, processor.rs:170-199)."""
        cx = GraphContext()
        g = cx.graph
        beep = beep_graph(cx)
        proc = cx.activate(SR, 0, 2, 128)
        cx.update()
        out1 = np.zeros(128 * 2, np.float32)
        proc.process_interleaved(np.zeros(0, np.float32), out1, 0, 2, 128, 0.0)

        # live edit: splice a unity volume between beep and out
        vol = g.add_node(2, 2, VolumeNode(100.0))
        g.disconnect(beep, 0, g.graph_out_node(), 0)
        g.disconnect(beep, 1, g.graph_out_node(), 1)
        g.connect(beep, 0, vol, 0)
        g.connect(beep, 1, vol, 1)
        g.connect(vol, 0, g.graph_out_node(), 0)
        g.connect(vol, 1, g.graph_out_node(), 1)
        res = cx.update()
        assert res.graph_error is None

        out2 = np.zeros(128 * 2, np.float32)
        proc.process_interleaved(
            np.zeros(0, np.float32), out2, 0, 2, 128, 128 / SR
        )
        sig = np.concatenate([out1[0::2], out2[0::2]])
        ideal = 0.25118864 * np.sin(2 * np.pi * 440 / SR * np.arange(256))
        assert np.abs(sig - ideal).max() < 2e-6

        # the old schedule came back and the context processed the return
        res = cx.update()
        assert res.status == UpdateStatus.ACTIVE

    def test_remove_node_returns_processor(self):
        cx = GraphContext()
        g = cx.graph
        beep = beep_graph(cx)
        vol = g.add_node(2, 2, VolumeNode(50.0))
        proc = cx.activate(SR, 0, 2, 128)
        cx.update()
        out = np.zeros(128 * 2, np.float32)
        proc.process_interleaved(np.zeros(0, np.float32), out, 0, 2, 128, 0.0)

        g.remove_node(vol)
        cx.update()
        proc.process_interleaved(np.zeros(0, np.float32), out, 0, 2, 128, 0.0)
        cx.update()  # processes ReturnSchedule with the removed processor
        # the volume node was deactivated; re-adding works
        g.add_node(2, 2, VolumeNode(10.0))
        res = cx.update()
        assert res.graph_error is None


class TestFirewheelCtx:
    def test_offline_render_beep(self):
        cx = FirewheelCtx()
        beep_graph(cx)
        sink = ArraySink()
        cfg = StreamConfig(sample_rate=SR, num_out_channels=2, buffer_frames=512)
        cx.activate(cfg, sink=sink, duration_secs=0.25)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            cx.update()
            if cx.stream and cx.stream.frames_rendered >= SR * 0.25:
                break
            time.sleep(0.01)
        cx.deactivate()
        audio = sink.audio(2)
        assert audio.shape[0] == 2 and audio.shape[1] >= SR * 0.25
        # 440 Hz at -12 dB
        n = audio.shape[1]
        spec = np.abs(np.fft.rfft(audio[0] * np.hanning(n)))
        peak_hz = np.argmax(spec) * SR / n
        assert abs(peak_hz - 440.0) < 4.0
        assert abs(np.abs(audio[0]).max() - 0.2512) < 1e-3

    def test_stream_error_deactivates_cleanly(self):
        class FailingSink:
            def __init__(self):
                self.writes = 0

            def write(self, data, ch):
                self.writes += 1
                if self.writes > 2:
                    raise IOError("device unplugged")

        cx = FirewheelCtx()
        beep_graph(cx)
        cx.activate(
            StreamConfig(sample_rate=SR, buffer_frames=256),
            sink=FailingSink(),
        )
        deadline = time.monotonic() + 30
        status = None
        while time.monotonic() < deadline:
            res = cx.update()
            if res.status == UpdateStatus.DEACTIVATED:
                status = res
                break
            time.sleep(0.01)
        assert status is not None, "stream error never surfaced"
        assert isinstance(status.error, IOError)
        assert not cx.is_activated()
        # graph survives for re-activation (fault tolerance, lib.rs:286-297)
        cx.activate(StreamConfig(sample_rate=SR), sink=ArraySink())
        assert cx.is_activated()
        cx.deactivate()

    def test_realtime_pacing_and_clock(self):
        cx = FirewheelCtx()
        beep_graph(cx)
        sink = ArraySink()
        cfg = StreamConfig(
            sample_rate=SR,
            num_out_channels=2,
            buffer_frames=2048,
            realtime=True,
            lookahead_buffers=4,
        )
        cx.activate(cfg, sink=sink)
        t0 = time.monotonic()
        while time.monotonic() - t0 < 0.5:
            cx.update()
            time.sleep(0.015)
        cx.deactivate()
        audio = sink.audio(2)
        # paced: ~0.5 s of audio consumed in ~0.5 s wall (generous bounds)
        assert SR * 0.2 <= audio.shape[1] <= SR * 1.5


def test_activate_raises_on_compile_failure():
    """Review finding: a graph that cannot compile (cycle built with
    check_for_cycles=False) must FAIL activation, not start a silent
    stream (the reference's ActivateError contract, lib.rs:107)."""
    from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
    from firewheel_tpu.graph.errors import CompileGraphError
    from firewheel_tpu.nodes import VolumeNode

    cx = FirewheelCtx()
    g = cx.graph
    a = g.add_node(2, 2, VolumeNode(100.0))
    b = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(a, 0, b, 0)
    g.connect(b, 0, a, 0)  # cycle, unchecked at edit time
    g.connect(b, 1, g.graph_out_node(), 0)
    with pytest.raises(CompileGraphError):
        cx.activate(StreamConfig(48000, 2, buffer_frames=128), sink=ArraySink())
    assert not cx.is_activated()
    # and the engine is re-activatable once the cycle is fixed
    g.disconnect(b, 0, a, 0)
    cx.activate(StreamConfig(48000, 2, buffer_frames=128), sink=ArraySink())
    assert cx.is_activated()
    cx.deactivate()
