"""Latency analysis + automatic compensation (PDC) tests.

Covers `firewheel_tpu/graph/latency.py` — the graph-level
plugin-delay-compensation pass ("delay compensation" is listed and
unimplemented in the reference's DESIGN_DOC.md:17-18; the graph surface
mirrors crates/firewheel-graph/src/graph.rs).
"""

import numpy as np
import pytest

from firewheel_tpu import AudioGraph, AudioGraphConfig
from firewheel_tpu.graph.latency import LatencyReport
from firewheel_tpu.nodes import BeepTestNode, SumNode, VolumeNode
from firewheel_tpu.nodes.delay import DelayCompNode
from firewheel_tpu.nodes.dynamics import LimiterNode
from firewheel_tpu.nodes.fir import FirFilterNode
from firewheel_tpu.testing import NaiveGraphRenderer

SR = 48000
F = 128


def test_limiter_declares_lookahead_latency():
    lim = LimiterNode(lookahead_secs=0.005)
    assert lim.latency_frames(SR) == 240
    assert lim.latency_frames(96000) == 480


def test_fir_latency_opt_in():
    taps = np.zeros(63, np.float32)
    taps[31] = 1.0
    assert FirFilterNode(taps).latency_frames(SR) == 0
    assert FirFilterNode(taps, report_latency=True).latency_frames(SR) == 31


def test_delay_comp_reports_own_latency():
    assert DelayCompNode(delay_frames=100).latency_frames(SR) == 100
    assert DelayCompNode(delay_secs=0.01).latency_frames(SR) == 480


def test_negative_latency_rejected():
    class Bad(BeepTestNode):
        def latency_frames(self, sample_rate):
            return -1

    g = AudioGraph(AudioGraphConfig(0, 2))
    bad = g.add_node(0, 2, Bad(440.0, -12.0))
    g.connect(bad, 0, g.graph_out_node(), 0)
    with pytest.raises(ValueError, match="latency_frames"):
        g.path_latencies(SR)


def build_parallel_limiter_graph(lookahead_secs=0.005):
    """beep → {limiter, direct} → sum → out: the classic parallel-limit
    bus whose dry side arrives early."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    lim = g.add_node(2, 2, LimiterNode(lookahead_secs=lookahead_secs))
    mix = g.add_node(4, 2, SumNode())
    g.connect(beep, 0, lim, 0)
    g.connect(beep, 1, lim, 1)
    g.connect(lim, 0, mix, 0)
    g.connect(lim, 1, mix, 1)
    e0 = g.connect(beep, 0, mix, 2)
    e1 = g.connect(beep, 1, mix, 3)
    g.connect(mix, 0, g.graph_out_node(), 0)
    g.connect(mix, 1, g.graph_out_node(), 1)
    return g, beep, lim, mix, (e0, e1)


def test_path_latencies_diamond():
    g, beep, lim, mix, _ = build_parallel_limiter_graph()
    arrival = g.path_latencies(SR)
    assert arrival[beep] == 0
    assert arrival[lim] == 0          # latency applies at its output
    assert arrival[mix] == 240        # longest path wins
    assert g.output_latency_frames(SR) == 240


def test_compensation_inserts_shared_delay_and_is_idempotent():
    g, beep, lim, mix, _ = build_parallel_limiter_graph()
    n_before = len(list(g.nodes()))
    report = g.compensate_latency(SR)
    assert isinstance(report, LatencyReport)
    # both early edges come from the same source node → ONE stereo delay
    assert len(report.insertions) == 1
    ins = report.insertions[0]
    assert ins.frames == 240 and ins.channels == 2
    assert ins.src_node == beep and ins.dst_node == mix
    assert report.output_latency_frames == 240
    assert len(list(g.nodes())) == n_before + 1
    # every merge is now aligned: a second pass finds nothing
    report2 = g.compensate_latency(SR)
    assert report2.insertions == []
    assert report2.output_latency_frames == 240


def test_manual_alignment_delay_counts():
    """A hand-placed DelayCompNode equal to the limiter's lookahead means
    the pass has nothing to do."""
    g, beep, lim, mix, edges = build_parallel_limiter_graph()
    for e in edges:
        g.disconnect_by_edge_id(e)
    man = g.add_node(2, 2, DelayCompNode(delay_frames=240))
    g.connect(beep, 0, man, 0)
    g.connect(beep, 1, man, 1)
    g.connect(man, 0, mix, 2)
    g.connect(man, 1, mix, 3)
    assert g.compensate_latency(SR).insertions == []


def test_cascaded_merges_single_pass():
    """Two stacked merge points: one pass aligns both (longest-path
    semantics propagate, no second pass needed)."""
    g = AudioGraph(AudioGraphConfig(0, 1))
    src = g.add_node(0, 1, BeepTestNode(440.0, -12.0, True))
    d100 = g.add_node(1, 1, DelayCompNode(delay_frames=100))
    s1 = g.add_node(2, 1, SumNode())
    s2 = g.add_node(2, 1, SumNode())
    g.connect(src, 0, d100, 0)
    g.connect(d100, 0, s1, 0)
    g.connect(src, 0, s1, 1)      # 100 early at s1
    g.connect(s1, 0, s2, 0)
    g.connect(src, 0, s2, 1)      # 100 early at s2 (via s1's path)
    g.connect(s2, 0, g.graph_out_node(), 0)

    report = g.compensate_latency(SR)
    assert sorted(i.frames for i in report.insertions) == [100, 100]
    assert report.output_latency_frames == 100
    assert g.compensate_latency(SR).insertions == []


def _render_secs(g, blocks):
    r = NaiveGraphRenderer(g, SR, F)
    outs = [np.asarray(r.render_block()[0]) for _ in range(blocks)]
    return np.concatenate(outs, axis=-1)


def test_compensation_aligns_numerically():
    """Impulse through {delayed, direct} → sum: uncompensated output has
    two pulses; compensated output is ONE pulse of amplitude 2 at the
    delayed position."""
    d = 200

    def build():
        g = AudioGraph(AudioGraphConfig(1, 1))
        delay = g.add_node(1, 1, DelayCompNode(delay_frames=d))
        mix = g.add_node(2, 1, SumNode())
        g.connect(g.graph_in_node(), 0, delay, 0)
        g.connect(delay, 0, mix, 0)
        g.connect(g.graph_in_node(), 0, mix, 1)
        g.connect(mix, 0, g.graph_out_node(), 0)
        return g

    def render_impulse(g, blocks=4):
        r = NaiveGraphRenderer(g, SR, F)
        outs = []
        for b in range(blocks):
            x = np.zeros((1, F), np.float32)
            if b == 0:
                x[0, 0] = 1.0
            out, _ = r.render_block(graph_in=x, in_mask=np.zeros((1,), bool))
            outs.append(np.asarray(out))
        return np.concatenate(outs, axis=-1)[0]

    y_raw = render_impulse(build())
    assert y_raw[0] == pytest.approx(1.0)
    assert y_raw[d] == pytest.approx(1.0)

    g2 = build()
    report = g2.compensate_latency(SR)
    assert [i.frames for i in report.insertions] == [d]
    y_comp = render_impulse(g2)
    assert y_comp[d] == pytest.approx(2.0)
    peaks = np.flatnonzero(np.abs(y_comp) > 1e-6)
    assert peaks.tolist() == [d]


def test_compensated_graph_compiles_and_renders():
    """The spliced graph goes through the real compile path (the pass uses
    only public mutation APIs, so live update() would hot-swap it)."""
    g, _, _, _, _ = build_parallel_limiter_graph()
    g.compensate_latency(SR)
    pkg = g.compile(SR, F)
    assert pkg.schedule is not None
    y = _render_secs(g, 3)
    assert np.all(np.isfinite(y)) and y.shape[0] == 2


def test_volume_chain_reports_zero():
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(80.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    assert g.output_latency_frames(SR) == 0
    assert g.compensate_latency(SR).insertions == []


def test_ctx_output_latency_accessor():
    """FirewheelCtx surfaces the mix latency while activated (games add
    sink buffering and sync visuals to the total)."""
    import time

    from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
    from firewheel_tpu.nodes import MonoToStereoNode

    cx = FirewheelCtx()
    with pytest.raises(RuntimeError, match="not activated"):
        cx.output_latency_frames()

    g = cx.graph
    beep = g.add_node(0, 1, BeepTestNode(440.0, -12.0, True))
    lim = g.add_node(1, 1, LimiterNode(lookahead_secs=0.005))
    up = g.add_node(1, 2, MonoToStereoNode())
    g.connect(beep, 0, lim, 0)
    g.connect(lim, 0, up, 0)
    g.connect(up, 0, g.graph_out_node(), 0)
    g.connect(up, 1, g.graph_out_node(), 1)

    cfg = StreamConfig(sample_rate=SR, num_out_channels=2, buffer_frames=256)
    cx.activate(cfg, sink=ArraySink(), duration_secs=0.05)
    try:
        assert cx.output_latency_frames() == 240
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            cx.update()
            if cx.stream and cx.stream.frames_rendered >= SR * 0.05:
                break
            time.sleep(0.005)
    finally:
        cx.deactivate()
