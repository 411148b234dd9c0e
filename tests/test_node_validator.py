"""firewheel_tpu.testing: the node contract validator and the naive
reference renderer.

The validator is the public harness for third-party nodes
(docs/EXTENDING.md); these tests pin that (a) every built-in node family
passes it, and (b) each contract violation class is actually caught and
named — a validator that never fails is worse than none.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    AudioNode,
    AudioNodeInfo,
    BlockInfo,
    NodeProcessor,
    ScheduleProgram,
)
from firewheel_tpu.nodes import (
    BeepTestNode,
    EchoNode,
    FilterNode,
    ParametricEQNode,
    StereoPanNode,
    SumNode,
    TremoloNode,
    VolumeNode,
    WaveshaperNode,
)
from firewheel_tpu.testing import (
    NaiveGraphRenderer,
    NodeContractError,
    validate_node,
)

SR, F = 48000, 128

ALL_CHECKS = {
    "activate", "pytrees", "eager", "determinism", "jit", "scan", "vmap",
    "partial_block",
}


@pytest.mark.parametrize(
    "node,n_in,n_out",
    [
        (BeepTestNode(440.0, -12.0, True), 0, 2),
        (VolumeNode(80.0), 2, 2),
        (SumNode(), 4, 2),
        (FilterNode("lowpass", 2000.0), 2, 2),
        (EchoNode(0.05, 0.4), 2, 2),
        (ParametricEQNode(), 2, 2),
        (WaveshaperNode("tanh", 6.0), 2, 2),
        (TremoloNode(5.0, 0.5), 2, 2),
        (StereoPanNode(0.3), 2, 2),
    ],
    ids=lambda v: getattr(v, "debug_name", str(v)),
)
def test_builtins_pass_validation(node, n_in, n_out):
    report = validate_node(node, n_in, n_out)
    assert ALL_CHECKS <= set(report)
    assert all(report[c] == "ok" for c in ALL_CHECKS)


# -- deliberately broken nodes: each violation class must be caught --------


class _BrokenBase(AudioNode):
    def info(self):
        return AudioNodeInfo(1, 64, 1, 64)


def _mk(proc_cls):
    class N(_BrokenBase):
        def activate(self, sample_rate, max_block_frames, ni, no):
            return proc_cls(sample_rate, max_block_frames, ni, no)

    return N()


class _WrongShapeProc(NodeProcessor):
    def kernel(self, params, state, inputs, in_mask, info):
        return inputs[:, :-1], state, in_mask  # one frame short


class _ImpureProc(NodeProcessor):
    def kernel(self, params, state, inputs, in_mask, info):
        # host RNG inside the kernel: non-deterministic across calls
        return (
            inputs + np.float32(np.random.default_rng().standard_normal()),
            state,
            in_mask,
        )


class _StateShapeProc(NodeProcessor):
    def init_state(self):
        return {"z": jnp.zeros((2,), jnp.float32)}

    def kernel(self, params, state, inputs, in_mask, info):
        # state leaf grows every block: breaks packed-state round-trips
        return inputs, {"z": jnp.concatenate([state["z"], state["z"]])}, in_mask


class _UntraceableProc(NodeProcessor):
    def kernel(self, params, state, inputs, in_mask, info):
        if float(jnp.max(jnp.abs(inputs))) > 0.5:  # branches on traced value
            return inputs * 0.5, state, in_mask
        return inputs, state, in_mask


class _FixedFramesProc(NodeProcessor):
    def kernel(self, params, state, inputs, in_mask, info):
        # hard-codes max_block_frames instead of reading inputs.shape[-1]
        out = jnp.zeros((self.num_outputs, self.max_block_frames), jnp.float32)
        return out.at[:, : inputs.shape[-1]].set(inputs), state, in_mask


@pytest.mark.parametrize(
    "proc_cls,check",
    [
        (_WrongShapeProc, "eager"),
        (_ImpureProc, "determinism"),
        (_StateShapeProc, "eager"),
        (_UntraceableProc, "jit"),
        (_FixedFramesProc, "partial_block"),
    ],
    ids=lambda v: getattr(v, "__name__", str(v)),
)
def test_violations_are_caught_and_named(proc_cls, check):
    with pytest.raises(NodeContractError) as ei:
        validate_node(_mk(proc_cls), 2, 2)
    assert ei.value.check == check, (
        f"expected check {check!r}, validator flagged {ei.value.check!r}"
    )


def test_port_count_outside_declared_range():
    with pytest.raises(NodeContractError) as ei:
        validate_node(StereoPanNode(0.0), 3, 2)  # pan is max 2-in
    assert ei.value.check == "activate"


# -- NaiveGraphRenderer: graph-level oracle matches the executor -----------


def test_naive_renderer_matches_executor():
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(75.0))
    pan = g.add_node(2, 2, StereoPanNode(-0.4))
    for a, b in ((beep, vol), (vol, pan)):
        for ch in range(2):
            g.connect(a, ch, b, ch)
    for ch in range(2):
        g.connect(pan, ch, g.graph_out_node(), ch)

    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    # share the compile's processors so params/state init identically
    ref = NaiveGraphRenderer(g, SR, F, processors=dict(pkg.new_node_processors))

    params = prog.collect_params()
    state = prog.init_state()
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    for blk in range(4):
        info = BlockInfo.make(
            stream_time_secs=blk * F / SR, stream_sample=blk * F
        )
        out_e, om_e, state = prog.render_block(params, state, gi, im, info)
        out_r, om_r = ref.render_block(gi, im, info)
        np.testing.assert_allclose(
            np.asarray(out_e), np.asarray(out_r), atol=1e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_e), om_r)


def test_naive_renderer_standalone_activation():
    """Without shared processors it activates its own — still renders the
    same audio for param-identical nodes."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(330.0, -15.0, True))
    for ch in range(2):
        g.connect(beep, ch, g.graph_out_node(), ch)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    ref = NaiveGraphRenderer(g, SR, F)

    out_e, _, _ = prog.render_block(
        prog.collect_params(), prog.init_state(),
        jnp.zeros((0, F), jnp.float32), jnp.zeros((0,), bool),
        BlockInfo.make(),
    )
    out_r, _ = ref.render_block(
        jnp.zeros((0, F), jnp.float32), jnp.zeros((0,), bool),
        BlockInfo.make(),
    )
    np.testing.assert_allclose(
        np.asarray(out_e), np.asarray(out_r), atol=1e-6, rtol=0
    )
