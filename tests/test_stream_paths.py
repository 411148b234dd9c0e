"""Stream-path coverage: graph inputs from an input source, partial tail
blocks, and the chunked (multi-block-per-dispatch) render path.
"""

import numpy as np
import pytest

from firewheel_tpu import (
    ArraySink,
    FirewheelCtx,
    GraphContext,
    StreamConfig,
)
from firewheel_tpu.nodes import BeepTestNode, HardClipNode, VolumeNode
from firewheel_tpu.processor import ProcessorStatus

SR = 48000


def passthrough_ctx(cls=FirewheelCtx, gain_pct=100.0):
    cx = cls() if cls is FirewheelCtx else cls()
    g = cx.graph if hasattr(cx, "graph") else cx.graph_mut()
    from firewheel_tpu.graph import AudioGraphConfig

    return cx


def build_passthrough(cx):
    g = cx.graph_mut() if hasattr(cx, "graph_mut") else cx.graph
    clip = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(g.graph_in_node(), 0, clip, 0)
    g.connect(g.graph_in_node(), 1, clip, 1)
    g.connect(clip, 0, g.graph_out_node(), 0)
    g.connect(clip, 1, g.graph_out_node(), 1)


def test_input_source_flows_to_output():
    """Stream inputs (graph_in) pass through the engine end to end."""
    from firewheel_tpu.graph import AudioGraphConfig

    cx = FirewheelCtx(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
    build_passthrough(cx)

    rng = np.random.default_rng(0)
    feed_log = []

    def source(frames):
        x = (rng.standard_normal((frames, 2)) * 0.4).astype(np.float32)
        feed_log.append(x)
        return x.reshape(-1)  # interleaved

    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, num_in_channels=2, buffer_frames=256),
        sink=sink,
        input_source=source,
        duration_secs=0.1,
    )
    cx.render_offline(0.1)
    cx.deactivate()
    got = sink.audio(2)
    fed = np.concatenate(feed_log).T  # [2, frames]
    n = min(got.shape[1], fed.shape[1])
    np.testing.assert_allclose(got[:, :n], np.clip(fed[:, :n], -1, 1), atol=1e-6)


def test_partial_tail_block():
    """A stream buffer not divisible by max_block_frames exercises the
    partial-block path with correct state advance (processor.rs:95-158)."""
    cx = GraphContext()
    g = cx.graph
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    g.connect(beep, 0, g.graph_out_node(), 0)
    g.connect(beep, 1, g.graph_out_node(), 1)
    proc = cx.activate(SR, 0, 2, 128)
    cx.update()

    # 128 + 128 + 64: last call is a partial block
    out_a = np.zeros(128 * 2, np.float32)
    out_b = np.zeros(128 * 2, np.float32)
    out_c = np.zeros(64 * 2, np.float32)
    proc.process_interleaved(np.zeros(0, np.float32), out_a, 0, 2, 128, 0.0)
    proc.process_interleaved(np.zeros(0, np.float32), out_b, 0, 2, 128, 128 / SR)
    proc.process_interleaved(np.zeros(0, np.float32), out_c, 0, 2, 64, 256 / SR)
    # a 4th call continues seamlessly after the 64-frame tail
    out_d = np.zeros(128 * 2, np.float32)
    proc.process_interleaved(np.zeros(0, np.float32), out_d, 0, 2, 128, 320 / SR)

    sig = np.concatenate([out_a[0::2], out_b[0::2], out_c[0::2], out_d[0::2]])
    ideal = 0.25118864 * np.sin(2 * np.pi * 440 / SR * np.arange(448))
    np.testing.assert_allclose(sig, ideal, atol=2e-6)
    cx.deactivate(stream_is_running=False, pump=lambda: proc.process_interleaved(
        np.zeros(0, np.float32), out_d, 0, 2, 128, 0.0) and None)


@pytest.mark.parametrize("chunk_buffers", [1, 4])
def test_chunked_pump_equivalence(chunk_buffers):
    """chunk_buffers=4 (one dispatch per 4 buffers) must produce the same
    audio as the per-buffer path."""
    cx = FirewheelCtx()
    g = cx.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cx.activate(
        StreamConfig(
            SR, 2, buffer_frames=256, chunk_buffers=chunk_buffers
        ),
        sink=sink,
    )
    cx.render_offline(0.25)
    cx.deactivate()
    audio = sink.audio(2)
    n = min(audio.shape[1], int(SR * 0.25))
    ideal = 0.25118864 * np.sin(2 * np.pi * 440 / SR * np.arange(n))
    np.testing.assert_allclose(audio[0, :n], ideal, atol=5e-6)


def test_chunked_live_param_applies_at_chunk_granularity():
    cx = FirewheelCtx()
    g = cx.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=256, chunk_buffers=4), sink=sink
    )
    cx.render_offline(0.1)
    g.node(vol).set_percent_volume(0.0)
    cx.render_offline(0.3)
    cx.deactivate()
    audio = sink.audio(2)
    assert np.abs(audio[:, :2000]).max() > 0.1
    assert np.abs(audio[:, -2000:]).max() < 1e-5


def test_chunked_dispatch_with_stream_inputs():
    """_process_chunk's per-block deinterleave + mask path (inputs present)."""
    from firewheel_tpu.graph import AudioGraphConfig

    cx = FirewheelCtx(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
    build_passthrough(cx)
    rng = np.random.default_rng(1)
    fed = []

    def source(frames):
        x = (rng.standard_normal((frames, 2)) * 0.4).astype(np.float32)
        fed.append(x)
        return x.reshape(-1)

    sink = ArraySink()
    cx.activate(
        StreamConfig(
            SR, 2, num_in_channels=2, buffer_frames=256, chunk_buffers=4
        ),
        sink=sink,
        input_source=source,
    )
    cx.render_offline(0.2)
    cx.deactivate()
    got = sink.audio(2)
    want = np.concatenate(fed).T
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(
        got[:, :n], np.clip(want[:, :n], -1, 1), atol=1e-6
    )


def test_chunked_input_silence_mask_per_block():
    """Silent input blocks inside a chunk must come out silent even when
    neighbors in the same chunk are loud (per-block masks through the scan)."""
    from firewheel_tpu.graph import AudioGraphConfig

    cx = FirewheelCtx(AudioGraphConfig(num_graph_inputs=1, num_graph_outputs=1))
    g = cx.graph_mut()
    g.connect(g.graph_in_node(), 0, g.graph_out_node(), 0)

    calls = [0]

    def source(frames):
        calls[0] += 1
        if calls[0] % 2 == 0:
            return np.zeros(frames, np.float32)
        return np.full(frames, 0.5, np.float32)

    sink = ArraySink()
    cx.activate(
        StreamConfig(
            SR, 1, num_in_channels=1, buffer_frames=256, chunk_buffers=4
        ),
        sink=sink,
        input_source=source,
    )
    cx.render_offline(0.1)
    cx.deactivate()
    got = sink.audio(1)[0]
    blocks = got[: (len(got) // 256) * 256].reshape(-1, 256)
    for i, blk in enumerate(blocks[: calls[0]]):
        if i % 2 == 0:
            assert (blk == np.float32(0.5)).all(), f"block {i}"
        else:
            assert (blk == 0).all(), f"block {i}"


def test_pipeline_depths_render_identically():
    """Pipelined offline pumping (depth 1 and deeper) must be bit-exact
    with the synchronous path (depth 0), including the flush of chunks
    still in flight when render_offline returns."""
    ref = None
    for depth in (0, 1, 3):
        cx = FirewheelCtx()
        g = cx.graph_mut()
        beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        g.connect(beep, 0, g.graph_out_node(), 0)
        g.connect(beep, 1, g.graph_out_node(), 1)
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=128, chunk_buffers=16,
                         pipeline_depth=depth),
            sink=sink,
        )
        cx.render_offline(0.7)  # 262.5 buffers: chunks + odd tail
        cx.deactivate()
        audio = sink.audio(2)
        assert audio.shape[1] >= int(0.7 * SR)
        if ref is None:
            ref = audio
        else:
            np.testing.assert_array_equal(audio, ref)


def test_offline_pump_dispatches_whole_chunks():
    """Regression (round-4 soak): update()'s render-ahead bound clamped
    explicit max_pump_buffers to PUMP_MAX_BUFFERS (8), so with
    chunk_buffers > 8 every render_offline dispatch shrank to a SINGLE
    buffer (8 is not a warmed size; the strict-size rule walks k down to
    1) — ~0.01x realtime on a ~30 ms-RTT chip tunnel.  The bound must
    admit at least one whole chunk, and a non-power-of-two request
    floors to the processor's quantized chunk."""
    cx = FirewheelCtx()
    g = cx.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    g.connect(beep, 0, g.graph_out_node(), 0)
    g.connect(beep, 1, g.graph_out_node(), 1)
    sink = ArraySink()
    cfg = StreamConfig(SR, 2, buffer_frames=128, chunk_buffers=23)
    assert cfg.chunk_buffers == 16  # floored to the warmed power of two
    cx.activate(cfg, sink=sink)
    st = cx.stream
    st._render_times.clear()
    cx.render_offline(1.0)  # 375 buffers
    dispatches = len(st._render_times)
    cx.deactivate()
    # 375 buffers in 16-buffer chunks: 23 chunks + tail (8/4/2/1 sizes),
    # far below the 375 the k=1 regime would log (deque caps at 512)
    assert dispatches <= 40, dispatches
    audio = sink.audio(2)
    assert audio.shape[1] >= SR
    assert np.abs(audio).max() > 0.2


def test_pump_until_finished_flushes_pipeline():
    """A fixed-duration caller pumping until ``finished`` and reading the
    sink WITHOUT stop()/drain() must see every frame: the final pump
    auto-flushes in-flight pipelined chunks (review r4: the tail chunk
    sat in _inflight_q until an explicit drain)."""
    outs = []
    for depth in (0, 2):
        cx = FirewheelCtx()
        g = cx.graph_mut()
        beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        g.connect(beep, 0, g.graph_out_node(), 0)
        g.connect(beep, 1, g.graph_out_node(), 1)
        from firewheel_tpu import ArraySink

        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=128, chunk_buffers=16,
                         pipeline_depth=depth),
            sink=sink,
            duration_secs=0.5,
        )
        st = cx.stream
        for _ in range(10_000):
            if st.finished:
                break
            st.pump()
        assert st.finished
        audio = sink.audio(2)  # no stop()/drain()/flush()
        assert audio.shape[1] == int(0.5 * SR)
        outs.append(audio)
        cx.deactivate()
    np.testing.assert_array_equal(outs[0], outs[1])
