"""Executor tests: schedule lowering, silence propagation, state carry,
scan-chunk equivalence, vmap batching.
"""

import numpy as np
import jax
import jax.numpy as jnp

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    BlockInfo,
    ScheduleProgram,
)
from firewheel_tpu.nodes import (
    BeepTestNode,
    DummyAudioNode,
    HardClipNode,
    SumNode,
    VolumeNode,
)
from firewheel_tpu.nodes.beep_test import phase_inc_fixed
import reference_dsp as ref

SR = 48000
F = 128


def build_beep_volume_graph(percent=100.0, enabled=True):
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, enabled))
    vol = g.add_node(2, 2, VolumeNode(percent))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    return g, beep, vol


def make_program(g):
    pkg = g.compile(SR, F)
    return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR), pkg


def no_stream_in(k=None):
    if k is None:
        return jnp.zeros((0, F), jnp.float32), jnp.zeros((0,), bool)
    return jnp.zeros((k, 0, F), jnp.float32), jnp.zeros((k, 0), bool)


def test_beep_graph_golden():
    g, beep, vol = build_beep_volume_graph()
    prog, pkg = make_program(g)
    state = prog.init_state()
    params = prog.collect_params()
    gi, im = no_stream_in()

    beep_proc = dict(pkg.new_node_processors)[beep]
    phase_q = 0
    for blk in range(4):
        out, om, state = prog.render_block(
            params, state, gi, im, BlockInfo.make(stream_sample=blk * F)
        )
        from firewheel_tpu.nodes.beep_test import phase_inc_fixed

        rbeep, phase_q, _ = ref.ref_beep(
            phase_q,
            True,
            beep_proc._node.gain,
            phase_inc_fixed(beep_proc._node.freq_hz, SR),
            2,
            F,
        )
        np.testing.assert_allclose(np.asarray(out), rbeep, atol=1e-6, rtol=0)
        assert not np.asarray(om).any()


def test_disabled_beep_propagates_silence():
    g, beep, vol = build_beep_volume_graph(enabled=False)
    prog, _ = make_program(g)
    state = prog.init_state()
    gi, im = no_stream_in()
    out, om, state = prog.render_block(
        prog.collect_params(), state, gi, im, BlockInfo.make()
    )
    assert (np.asarray(out) == 0).all()
    assert np.asarray(om).all()


def test_graph_inputs_flow_through():
    g = AudioGraph(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
    clip = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(g.graph_in_node(), 0, clip, 0)
    g.connect(g.graph_in_node(), 1, clip, 1)
    g.connect(clip, 0, g.graph_out_node(), 0)
    g.connect(clip, 1, g.graph_out_node(), 1)
    prog, _ = make_program(g)
    x = np.random.default_rng(0).standard_normal((2, F)).astype(np.float32) * 2
    out, om, _ = prog.render_block(
        prog.collect_params(),
        prog.init_state(),
        jnp.asarray(x),
        jnp.zeros((2,), bool),
        BlockInfo.make(),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.clip(x, -1.0, 1.0), atol=1e-6, rtol=0
    )


def test_graph_input_silence_flag_respected():
    """A silent-flagged graph input must yield silent-flagged output
    (intent of prepare_graph_inputs, schedule.rs:238-242)."""
    g = AudioGraph(AudioGraphConfig(num_graph_inputs=1, num_graph_outputs=1))
    g.connect(g.graph_in_node(), 0, g.graph_out_node(), 0)
    prog, _ = make_program(g)
    out, om, _ = prog.render_block(
        prog.collect_params(),
        prog.init_state(),
        jnp.ones((1, F), jnp.float32),  # nonzero data but flagged silent
        jnp.ones((1,), bool),
        BlockInfo.make(),
    )
    # read_graph_outputs semantics: flagged channels read as zero
    assert (np.asarray(out) == 0).all()
    assert np.asarray(om).all()


def test_unconnected_graph_output_is_silent():
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 1, BeepTestNode(440.0, -12.0, True))
    g.connect(beep, 0, g.graph_out_node(), 0)
    prog, _ = make_program(g)
    gi, im = no_stream_in()
    out, om, _ = prog.render_block(
        prog.collect_params(), prog.init_state(), gi, im, BlockInfo.make()
    )
    out, om = np.asarray(out), np.asarray(om)
    assert (np.abs(out[0]) > 0).any()
    assert (out[1] == 0).all() and om[1] and not om[0]


def test_chunk_equals_blockwise():
    """K blocks via lax.scan == K sequential single-block renders."""
    g, *_ = build_beep_volume_graph(percent=80.0)
    prog, _ = make_program(g)
    params = prog.collect_params()
    gi, im = no_stream_in()

    state_a = prog.init_state()
    blocks = []
    for blk in range(8):
        out, om, state_a = prog.render_block(
            params, state_a, gi, im,
            BlockInfo.make(stream_time_secs=blk * F / SR, stream_sample=blk * F),
        )
        blocks.append(np.asarray(out))
    seq = np.stack(blocks)

    state_b = prog.init_state()
    gis, ims = no_stream_in(8)
    outs, oms, state_b = prog.render_chunk(params, state_b, gis, ims, 0)
    np.testing.assert_allclose(np.asarray(outs), seq, atol=1e-6, rtol=0)
    # carried state identical
    for ka in state_a:
        la = jax.tree.leaves(state_a[ka])
        lb = jax.tree.leaves(state_b[ka])
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_vmap_batching():
    """B independent instances via vmap match B separate runs (params differ
    per instance)."""
    g, beep, vol = build_beep_volume_graph()
    prog, _ = make_program(g)
    from firewheel_tpu.executor import node_key

    B = 4
    base_params = prog.collect_params()
    vol_key = node_key(vol)
    gains = np.linspace(0.2, 1.0, B).astype(np.float32)

    def stack_params(b):
        p = jax.tree.map(lambda x: jnp.asarray(x), base_params)
        p = dict(p)
        p[vol_key] = {"raw_gain": jnp.float32(gains[b])}
        return p

    batched_params = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[stack_params(b) for b in range(B)]
    )
    batched_state = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[prog.init_state() for _ in range(B)]
    )
    gi = jnp.zeros((B, 0, F), jnp.float32)
    im = jnp.zeros((B, 0), bool)
    info = BlockInfo.make()

    vrender = jax.vmap(prog.render_fn, in_axes=(0, 0, 0, 0, None))
    outs, oms, _ = vrender(batched_params, batched_state, gi, im, info)
    outs = np.asarray(outs)

    for b in range(B):
        sp = stack_params(b)
        out, om, _ = prog.render_block(
            sp, prog.init_state(), jnp.zeros((0, F), jnp.float32),
            jnp.zeros((0,), bool), info,
        )
        np.testing.assert_allclose(outs[b], np.asarray(out), atol=2e-6, rtol=0)


def test_dummy_interior_node_outputs_zeros():
    g = AudioGraph(AudioGraphConfig(0, 1))
    d = g.add_node(0, 1, DummyAudioNode())
    g.connect(d, 0, g.graph_out_node(), 0)
    prog, _ = make_program(g)
    gi, im = no_stream_in()
    out, om, _ = prog.render_block(
        prog.collect_params(), prog.init_state(), gi, im, BlockInfo.make()
    )
    assert (np.asarray(out) == 0).all()
    assert not np.asarray(om).any()  # dummy reports non-silent (reference default)


def test_mixer_graph_sum():
    """4 beeps → sum → clip → out; sum order must match the reference."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    beeps = [g.add_node(0, 2, BeepTestNode(200.0 * (i + 1), -12.0, True)) for i in range(4)]
    s = g.add_node(8, 2, SumNode())
    clip = g.add_node(2, 2, HardClipNode(0.0))
    for i, b in enumerate(beeps):
        g.connect(b, 0, s, 2 * i)
        g.connect(b, 1, s, 2 * i + 1)
    g.connect(s, 0, clip, 0)
    g.connect(s, 1, clip, 1)
    g.connect(clip, 0, g.graph_out_node(), 0)
    g.connect(clip, 1, g.graph_out_node(), 1)
    prog, pkg = make_program(g)
    gi, im = no_stream_in()
    out, om, _ = prog.render_block(
        prog.collect_params(), prog.init_state(), gi, im, BlockInfo.make()
    )
    procs = dict(pkg.new_node_processors)
    acc = np.zeros((2, F), np.float32)
    for b in beeps:
        tone, _, _ = ref.ref_beep(0, True, procs[b]._node.gain, phase_inc_fixed(procs[b]._node.freq_hz, SR), 2, F)
        acc = (acc + tone).astype(np.float32)
    expected = np.clip(acc, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6, rtol=0)


class TestStateDonation:
    """Roofline item (ii): donate_state plumbing proven on a non-axon
    backend — the chunk jit aliases the state pytree, the donated input
    buffers are actually released, and outputs are unchanged.  (On the
    axon tunnel donation faults at runtime, so the engine keeps it
    opt-in/off there — CLAUDE.md; the expected TPU win is an HBM
    round-trip per state leaf per dispatch.)"""

    def _program(self, donate):
        from firewheel_tpu import AudioGraph, AudioGraphConfig
        from firewheel_tpu.nodes import BeepTestNode, SumNode, VolumeNode

        g = AudioGraph(AudioGraphConfig(0, 2))
        s = g.add_node(4, 2, SumNode())
        for i, f_ in enumerate([440.0, 660.0]):
            b = g.add_node(0, 2, BeepTestNode(f_, -18.0, True))
            v = g.add_node(2, 2, VolumeNode(80.0))
            g.connect(b, 0, v, 0); g.connect(b, 1, v, 1)
            g.connect(v, 0, s, 2 * i); g.connect(v, 1, s, 2 * i + 1)
        g.connect(s, 0, g.graph_out_node(), 0)
        g.connect(s, 1, g.graph_out_node(), 1)
        pkg = g.compile(SR, F)
        return ScheduleProgram(
            pkg.schedule, dict(pkg.new_node_processors), SR,
            donate_state=donate,
        )

    def test_donated_chunk_matches_and_frees(self):
        import jax

        K = 4
        gi = jnp.zeros((K, 0, F), jnp.float32)
        im = jnp.zeros((K, 0), bool)

        ref = self._program(donate=False)
        r_o, _, r_st = ref.render_chunk(
            ref.collect_params(), ref.init_state(), gi, im, 0
        )

        don = self._program(donate=True)
        st0 = don.init_state()
        d_o, _, d_st = don.render_chunk(don.collect_params(), st0, gi, im, 0)
        np.testing.assert_array_equal(np.asarray(r_o), np.asarray(d_o))
        # a second chunk continues identically from the new state
        r_o2, _, _ = ref.render_chunk(ref.collect_params(), r_st, gi, im, K * F)
        d_o2, _, _ = don.render_chunk(don.collect_params(), d_st, gi, im, K * F)
        np.testing.assert_array_equal(np.asarray(r_o2), np.asarray(d_o2))
        # the donated input state was actually released (buffer aliasing)
        assert any(
            getattr(x, "is_deleted", lambda: False)()
            for x in jax.tree.leaves(st0)
        )
