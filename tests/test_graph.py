"""AudioGraph API tests: mutation, error taxonomy, lifecycle
(graph.rs:109-698)."""

import pytest

from firewheel_tpu.graph import (
    AudioGraph,
    AudioGraphConfig,
    CycleDetected,
    DstNodeNotFound,
    EdgeAlreadyExists,
    InPortOutOfRange,
    NodeActivationFailed,
    OutPortOutOfRange,
    SrcNodeNotFound,
)
from firewheel_tpu.nodes import DummyAudioNode, VolumeNode


def make_graph(nin=2, nout=2):
    return AudioGraph(AudioGraphConfig(num_graph_inputs=nin, num_graph_outputs=nout))


def test_add_and_query_nodes():
    g = make_graph()
    node = DummyAudioNode()
    nid = g.add_node(2, 3, node)
    assert g.node(nid) is node
    info = g.node_info(nid)
    assert info.num_inputs == 2 and info.num_outputs == 3
    assert nid.debug_name == "dummy"
    assert len(list(g.nodes())) == 3  # includes the two sentinels


def test_connect_errors():
    g = make_graph()
    a = g.add_node(1, 1, DummyAudioNode())
    b = g.add_node(1, 1, DummyAudioNode())
    g.connect(a, 0, b, 0)
    with pytest.raises(EdgeAlreadyExists):
        g.connect(a, 0, b, 0)
    with pytest.raises(OutPortOutOfRange):
        g.connect(a, 5, b, 0)
    with pytest.raises(InPortOutOfRange):
        g.connect(a, 0, b, 5)
    with pytest.raises(CycleDetected):
        g.connect(a, 0, a, 0)  # self-loop (graph.rs:431-433)
    removed = g.remove_node(b)
    assert len(removed) == 1
    with pytest.raises(DstNodeNotFound):
        g.connect(a, 0, b, 0)
    with pytest.raises(SrcNodeNotFound):
        g.connect(b, 0, a, 0)


def test_connect_with_cycle_check_rolls_back():
    g = make_graph()
    a = g.add_node(1, 1, DummyAudioNode())
    b = g.add_node(1, 1, DummyAudioNode())
    g.connect(a, 0, b, 0)
    with pytest.raises(CycleDetected):
        g.connect(b, 0, a, 0, check_for_cycles=True)
    # rollback: the edge must be gone and the input port free again
    assert len(list(g.edges())) == 1
    c = g.add_node(1, 1, DummyAudioNode())
    g.connect(c, 0, a, 0)  # port a:0 must be connectable


def test_remove_node_cascades_edges():
    g = make_graph()
    a = g.add_node(1, 2, DummyAudioNode())
    b = g.add_node(2, 1, DummyAudioNode())
    g.connect(a, 0, b, 0)
    g.connect(a, 1, b, 1)
    g.connect(b, 0, g.graph_out_node(), 0)
    removed = g.remove_node(b)
    assert len(removed) == 3
    assert len(list(g.edges())) == 0


def test_remove_sentinels_fails():
    g = make_graph()
    with pytest.raises(ValueError):
        g.remove_node(g.graph_in_node())
    with pytest.raises(ValueError):
        g.remove_node(g.graph_out_node())


def test_set_num_ports_removes_out_of_range_edges():
    g = make_graph()
    a = g.add_node(0, 2, DummyAudioNode())
    b = g.add_node(2, 0, DummyAudioNode())
    g.connect(a, 0, b, 0)
    g.connect(a, 1, b, 1)
    removed = g.set_num_inputs(b, 1)
    assert len(removed) == 1
    assert len(list(g.edges())) == 1
    removed = g.set_num_outputs(a, 0)
    assert len(removed) == 1
    assert len(list(g.edges())) == 0
    # growing back leaves ports free
    g.set_num_inputs(b, 2)
    g.set_num_outputs(a, 2)
    g.connect(a, 1, b, 1)


def test_disconnect():
    g = make_graph()
    a = g.add_node(0, 1, DummyAudioNode())
    b = g.add_node(1, 0, DummyAudioNode())
    g.connect(a, 0, b, 0)
    assert g.disconnect(a, 0, b, 0)
    assert not g.disconnect(a, 0, b, 0)
    # port is free again
    g.connect(a, 0, b, 0)


def test_reset_keeps_sentinels():
    g = make_graph()
    g.add_node(1, 1, DummyAudioNode())
    g.add_node(1, 1, DummyAudioNode())
    g.reset()
    assert len(list(g.nodes())) == 2


def test_needs_compile_flag():
    g = make_graph()
    assert g.needs_compile()
    g.compile(48000, 128)
    assert not g.needs_compile()
    a = g.add_node(0, 1, DummyAudioNode())
    assert g.needs_compile()
    g.compile(48000, 128)
    g.connect(a, 0, g.graph_out_node(), 0)
    assert g.needs_compile()


def test_activation_failure_rolls_back():
    # VolumeNode requires num_inputs == num_outputs (volume.rs:63-66)
    g = make_graph()
    g.add_node(1, 2, VolumeNode(100.0))
    with pytest.raises(NodeActivationFailed):
        g.compile(48000, 128)


def test_node_id_generation_distinguishes_reuse():
    g = make_graph()
    a = g.add_node(1, 1, DummyAudioNode())
    g.remove_node(a)
    b = g.add_node(1, 1, DummyAudioNode())
    # b may reuse a's slot but must not compare equal (thunderdome semantics)
    assert a != b


def test_max_ports_enforced():
    # 64-port engine-wide cap (node.rs:62,69; compiler.rs:203-204)
    g = make_graph()
    from firewheel_tpu.nodes import SumNode

    nid = g.add_node(64, 2, SumNode())  # at the cap: fine
    assert g.node_info(nid).num_inputs == 64
    with pytest.raises(ValueError, match="SilenceMask"):
        g.add_node(65, 2, SumNode())
    with pytest.raises(ValueError, match="SilenceMask"):
        g.add_node(2, 65, SumNode())


def test_wide_sum_compiles_and_runs():
    """A full-width 64->2 sum node through the executor."""
    import numpy as np
    import jax.numpy as jnp
    from firewheel_tpu import BlockInfo, ScheduleProgram
    from firewheel_tpu.nodes import BeepTestNode, SumNode

    g = make_graph(nin=0, nout=2)
    s = g.add_node(64, 2, SumNode())
    beeps = []
    for i in range(32):
        b = g.add_node(0, 2, BeepTestNode(100.0 + 50.0 * i, -30.0, True))
        g.connect(b, 0, s, 2 * i)
        g.connect(b, 1, s, 2 * i + 1)
        beeps.append(b)
    g.connect(s, 0, g.graph_out_node(), 0)
    g.connect(s, 1, g.graph_out_node(), 1)
    pkg = g.compile(48000, 128)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), 48000)
    out, om, _ = prog.render_block(
        prog.collect_params(), prog.init_state(),
        jnp.zeros((0, 128), jnp.float32), jnp.zeros((0,), bool),
        BlockInfo.make(),
    )
    out = np.asarray(out)
    assert out.shape == (2, 128)
    assert np.abs(out).max() > 0.1  # 32 voices summed
    assert np.isfinite(out).all()


class TestPortValidation:
    """Review findings: negative ports and out-of-range port resizes must
    be rejected with real exceptions, not crash compile later."""

    def _graph(self):
        from firewheel_tpu.nodes import VolumeNode

        g = AudioGraph(AudioGraphConfig(0, 2))
        v = g.add_node(2, 2, VolumeNode(100.0))
        return g, v

    def test_negative_src_port_rejected(self):
        g, v = self._graph()
        with pytest.raises(OutPortOutOfRange):
            g.connect(v, -1, g.graph_out_node(), 0)

    def test_negative_dst_port_rejected(self):
        g, v = self._graph()
        with pytest.raises(InPortOutOfRange):
            g.connect(v, 0, g.graph_out_node(), -1)

    def test_set_num_inputs_validates_max_ports(self):
        g, v = self._graph()
        with pytest.raises(ValueError, match="SilenceMask"):
            g.set_num_inputs(v, 100)
        with pytest.raises(ValueError, match="SilenceMask"):
            g.set_num_outputs(v, -1)

    def test_add_node_validates_max_ports(self):
        from firewheel_tpu.nodes import SumNode

        g = AudioGraph(AudioGraphConfig(0, 2))
        with pytest.raises(ValueError, match="SilenceMask"):
            g.add_node(100, 2, SumNode())


class TestActivationRollback:
    def test_arbitrary_activate_exception_rolls_back(self):
        """A plain bug (KeyError) in one node's activate() must roll back
        the already-activated processors and surface as
        NodeActivationFailed (a CompileGraphError)."""
        from firewheel_tpu.core.node import AudioNode, AudioNodeInfo
        from firewheel_tpu.graph.errors import NodeActivationFailed
        from firewheel_tpu.nodes import VolumeNode

        class Broken(AudioNode):
            debug_name = "broken"

            def info(self):
                return AudioNodeInfo(
                    num_max_supported_inputs=2, num_max_supported_outputs=2
                )

            def activate(self, *a):
                raise KeyError("oops, a plain bug")

        g = AudioGraph(AudioGraphConfig(0, 2))
        vn = VolumeNode(100.0)
        v = g.add_node(2, 2, vn)
        b = g.add_node(2, 2, Broken())
        g.connect(v, 0, b, 0)
        g.connect(b, 0, g.graph_out_node(), 0)
        with pytest.raises(NodeActivationFailed):
            g.compile(48000, 128)
        # the volume node was rolled back, not left activated
        entry = g.node_info(v)
        assert entry.weight.activated is False
