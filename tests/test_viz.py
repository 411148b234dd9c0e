"""Visualization tests: ASCII graph, DOT export, HTML view, schedule table."""

import numpy as np

from firewheel_tpu import AudioGraph, AudioGraphConfig
from firewheel_tpu.nodes import BeepTestNode, VolumeNode
from firewheel_tpu.utils.viz import ascii_graph, schedule_table, to_dot, to_html


def build():
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    return g


def test_ascii_graph_mentions_every_node_and_edge():
    g = build()
    art = ascii_graph(g)
    for entry in g.nodes():
        assert repr(entry.id) in art
    assert art.count("-->") == len(list(g.edges()))


def test_dot_is_wellformed_and_buffer_labeled():
    g = build()
    sched = g.compile_internal(128)
    dot = to_dot(g, sched)
    assert dot.startswith("digraph") and dot.rstrip().endswith("}")
    assert dot.count("->") == len(list(g.edges()))
    assert 'label="b' in dot  # buffer indices on edges


def test_schedule_table_lists_all_nodes():
    g = build()
    sched = g.compile_internal(128)
    table = schedule_table(sched)
    assert "buffers:" in table
    for sn in sched.schedule:
        assert repr(sn.id) in table


def test_html_is_selfcontained():
    g = build()
    sched = g.compile_internal(128)
    html = to_html(g, sched)
    assert html.startswith("<!DOCTYPE html>")
    assert "<script>" in html and "nodes" in html
    assert "http" not in html.split("</title>")[1].split("<script>")[0]


def test_pump_reentrancy_guard():
    """Concurrent pumps are rejected loudly (single-thread device rule)."""
    from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig

    cx = FirewheelCtx()
    g = cx.graph_mut()
    b = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    g.connect(b, 0, g.graph_out_node(), 0)
    g.connect(b, 1, g.graph_out_node(), 1)
    cx.activate(StreamConfig(48000, 2, buffer_frames=256), sink=ArraySink())
    stream = cx.stream
    stream._pumping = True  # simulate a pump in flight on another thread
    try:
        import pytest

        with pytest.raises(RuntimeError, match="re-entered"):
            stream.pump()
    finally:
        stream._pumping = False
        cx.deactivate()
