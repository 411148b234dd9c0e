"""Graph-compiler tests, ported from the reference suite
(``crates/firewheel-graph/src/graph/compiler/schedule.rs:392-711``) including
the ``verify_node`` / ``verify_edge`` invariant helpers.
"""

import pytest

from firewheel_tpu.graph import (
    AudioGraph,
    AudioGraphConfig,
    InputPortAlreadyConnected,
)
from firewheel_tpu.nodes import DummyAudioNode


def verify_node(node_id, in_ports_that_should_clear, schedule, graph):
    """schedule.rs:600-635: buffer counts match ports; should_clear flags
    match; no buffer index aliases within a node."""
    node = graph.node_info(node_id)
    scheduled = next(s for s in schedule.schedule if s.id == node_id)
    assert scheduled.id == node_id
    assert len(scheduled.input_buffers) == node.num_inputs
    assert len(scheduled.output_buffers) == node.num_outputs
    assert len(in_ports_that_should_clear) == node.num_inputs
    for buf, should_clear in zip(scheduled.input_buffers, in_ports_that_should_clear):
        assert buf.should_clear == should_clear
    seen = set()
    for buf in scheduled.input_buffers:
        assert buf.buffer_index not in seen
        seen.add(buf.buffer_index)
    for buf in scheduled.output_buffers:
        assert buf.buffer_index not in seen
        seen.add(buf.buffer_index)


def verify_edge(edge_id, graph, schedule):
    """schedule.rs:637-660: an edge's src output buffer == dst input buffer."""
    edge = graph.edge(edge_id)
    src_idx = dst_idx = None
    for node in schedule.schedule:
        if node.id == edge.src_node:
            src_idx = node.output_buffers[edge.src_port].buffer_index
        elif node.id == edge.dst_node:
            dst_idx = node.input_buffers[edge.dst_port].buffer_index
    assert src_idx is not None and dst_idx is not None
    assert src_idx == dst_idx


def test_simplest_graph_compile():
    # schedule.rs:407-436
    graph = AudioGraph(AudioGraphConfig(num_graph_inputs=1, num_graph_outputs=1))
    node0 = graph.graph_in_node()
    node1 = graph.graph_out_node()
    edge0 = graph.connect(node0, 0, node1, 0, False)
    schedule = graph.compile_internal(128)
    assert len(schedule.schedule) == 2
    assert schedule.num_buffers > 0
    assert schedule.schedule[0].id == node0
    assert schedule.schedule[1].id == node1
    verify_node(node0, [], schedule, graph)
    verify_node(node1, [False], schedule, graph)
    verify_edge(edge0, graph, schedule)


def test_graph_compile_1():
    # schedule.rs:438-524 (7-node DAG with fan-out and unconnected ports)
    graph = AudioGraph(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
    node0 = graph.graph_in_node()
    node1 = graph.add_node(1, 2, DummyAudioNode())
    node2 = graph.add_node(1, 1, DummyAudioNode())
    node3 = graph.add_node(2, 2, DummyAudioNode())
    node4 = graph.add_node(2, 2, DummyAudioNode())
    node5 = graph.add_node(5, 2, DummyAudioNode())
    node6 = graph.graph_out_node()

    edges = [
        graph.connect(node0, 0, node1, 0, False),
        graph.connect(node0, 1, node2, 0, False),
        graph.connect(node1, 0, node3, 0, False),
        graph.connect(node1, 1, node4, 1, False),
        graph.connect(node3, 0, node5, 0, False),
        graph.connect(node3, 1, node5, 1, False),
        graph.connect(node4, 0, node5, 2, False),
        graph.connect(node4, 1, node5, 3, False),
        graph.connect(node2, 0, node5, 4, False),
        graph.connect(node5, 0, node6, 0, False),
        graph.connect(node5, 1, node6, 1, False),
    ]

    schedule = graph.compile_internal(128)
    assert len(schedule.schedule) == 7
    # Node 5 needs at least 7 buffers (schedule.rs:484-486)
    assert schedule.num_buffers > 6

    ids = [s.id for s in schedule.schedule]
    assert ids[0] == node0
    assert {ids[1], ids[2]} == {node1, node2}
    assert {ids[3], ids[4]} == {node3, node4}
    assert ids[5] == node5
    assert ids[6] == node6

    verify_node(node0, [], schedule, graph)
    verify_node(node1, [False], schedule, graph)
    verify_node(node2, [False], schedule, graph)
    verify_node(node3, [False, True], schedule, graph)
    verify_node(node4, [True, False], schedule, graph)
    verify_node(node5, [False] * 5, schedule, graph)
    verify_node(node6, [False, False], schedule, graph)
    for e in edges:
        verify_edge(e, graph, schedule)


def test_graph_compile_2():
    # schedule.rs:526-598 (fan-out from one output to two inputs, sink node)
    graph = AudioGraph(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
    node0 = graph.graph_in_node()
    node1 = graph.add_node(1, 1, DummyAudioNode())
    node2 = graph.add_node(2, 2, DummyAudioNode())
    node3 = graph.add_node(2, 2, DummyAudioNode())
    node4 = graph.add_node(5, 4, DummyAudioNode())
    node5 = graph.graph_out_node()
    node6 = graph.add_node(1, 1, DummyAudioNode())

    edges = [
        graph.connect(node0, 0, node2, 0, False),
        graph.connect(node0, 0, node3, 1, False),
        graph.connect(node2, 0, node4, 0, False),
        graph.connect(node3, 1, node4, 3, False),
        graph.connect(node1, 0, node4, 4, False),
        graph.connect(node4, 0, node5, 0, False),
        graph.connect(node4, 2, node6, 0, False),
    ]

    schedule = graph.compile_internal(128)
    assert len(schedule.schedule) == 7
    # Node 4 needs at least 8 buffers (schedule.rs:568-569)
    assert schedule.num_buffers > 7

    ids = [s.id for s in schedule.schedule]
    assert {ids[0], ids[1]} == {node0, node1}
    assert {ids[2], ids[3]} == {node2, node3}
    assert ids[4] == node4
    assert {ids[5], ids[6]} == {node5, node6}

    for e in edges:
        verify_edge(e, graph, schedule)

    verify_node(node0, [], schedule, graph)
    verify_node(node1, [True], schedule, graph)
    verify_node(node2, [False, True], schedule, graph)
    verify_node(node3, [True, False], schedule, graph)
    verify_node(node4, [False, True, True, False, False], schedule, graph)
    verify_node(node5, [False, True], schedule, graph)
    verify_node(node6, [False], schedule, graph)


def test_many_to_one_detection():
    # schedule.rs:662-683
    graph = AudioGraph(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=1))
    node1 = graph.graph_in_node()
    node2 = graph.graph_out_node()
    graph.connect(node1, 0, node2, 0, False)
    with pytest.raises(InputPortAlreadyConnected) as exc:
        graph.connect(node1, 1, node2, 0, False)
    assert exc.value.node_id == node2
    assert exc.value.port_idx == 0


def test_cycle_detection():
    # schedule.rs:685-710
    graph = AudioGraph(AudioGraphConfig(num_graph_inputs=0, num_graph_outputs=2))
    node1 = graph.add_node(1, 1, DummyAudioNode())
    node2 = graph.add_node(2, 1, DummyAudioNode())
    node3 = graph.add_node(1, 1, DummyAudioNode())
    graph.connect(node1, 0, node2, 0, False)
    graph.connect(node2, 0, node3, 0, False)
    edge3 = graph.connect(node3, 0, node1, 0, False)
    assert graph.cycle_detected()
    graph.disconnect_by_edge_id(edge3)
    assert not graph.cycle_detected()
    graph.connect(node3, 0, node2, 1, False)
    assert graph.cycle_detected()
