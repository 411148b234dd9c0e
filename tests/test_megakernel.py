"""Pallas megakernel executor: bit-exact parity with the XLA executor
(interpret mode — see executor_pallas.py for Mosaic toolchain status)."""

import numpy as np
import jax
import pytest

from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.executor_pallas import MegaRenderer, supports_megakernel
from firewheel_tpu.nodes import (
    BeepTestNode,
    ConvolutionReverbNode,
    HardClipNode,
    StereoPanNode,
    SumNode,
    VolumeNode,
)
from firewheel_tpu.parallel import BatchRenderer

SR, F = 48000, 128


def mixer_program():
    g = AudioGraph(AudioGraphConfig(0, 2))
    b1 = g.add_node(0, 2, BeepTestNode(440, -18, True))
    b2 = g.add_node(0, 2, BeepTestNode(660, -18, True))
    v = g.add_node(2, 2, VolumeNode(80.0))
    s = g.add_node(4, 2, SumNode())
    p = g.add_node(2, 2, StereoPanNode(0.2))
    c = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(b1, 0, v, 0); g.connect(b1, 1, v, 1)
    g.connect(v, 0, s, 0); g.connect(v, 1, s, 1)
    g.connect(b2, 0, s, 2); g.connect(b2, 1, s, 3)
    g.connect(s, 0, p, 0); g.connect(s, 1, p, 1)
    g.connect(p, 0, c, 0); g.connect(p, 1, c, 1)
    g.connect(c, 0, g.graph_out_node(), 0); g.connect(c, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)


def test_eligibility():
    prog = mixer_program()
    assert supports_megakernel(prog)

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440, -18, True))
    r = g.add_node(2, 2, ConvolutionReverbNode(np.ones(64, np.float32)))
    g.connect(b, 0, r, 0); g.connect(b, 1, r, 1)
    g.connect(r, 0, g.graph_out_node(), 0); g.connect(r, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog_fft = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    assert not supports_megakernel(prog_fft)  # FFT nodes stay on XLA

    # conv/gather nodes (no Mosaic lowering) are gated out too
    from firewheel_tpu.nodes import BinauralSpatializerNode, FirFilterNode

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 1, BeepTestNode(440, -18, True))
    bi = g.add_node(1, 2, BinauralSpatializerNode())
    g.connect(b, 0, bi, 0)
    g.connect(bi, 0, g.graph_out_node(), 0); g.connect(bi, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    assert not supports_megakernel(
        ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    )

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440, -18, True))
    fir = g.add_node(2, 2, FirFilterNode(np.zeros(9, np.float32)))
    g.connect(b, 0, fir, 0); g.connect(b, 1, fir, 1)
    g.connect(fir, 0, g.graph_out_node(), 0); g.connect(fir, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    assert not supports_megakernel(
        ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    )


def test_eligibility_round3_nodes():
    """On-chip verified (round 3): EQ / waveshaper / tremolo lower through
    Mosaic.  Round 4 reformulated mod-delay (no-feedback) and pitch
    shift into Mosaic-safe forms — they are now ELIGIBLE (parity in
    test_mod_pitch_parity_interpret; flanger feedback stays out)."""
    from firewheel_tpu.nodes import (
        EQBand,
        FilterType,
        ModDelayNode,
        ParametricEQNode,
        PitchShiftNode,
        TremoloNode,
        WaveshaperNode,
    )

    def prog_with(n_io, node):
        g = AudioGraph(AudioGraphConfig(0, 2))
        b = g.add_node(0, n_io, BeepTestNode(440, -18, True))
        n = g.add_node(n_io, n_io, node)
        for c in range(n_io):
            g.connect(b, c, n, c)
            g.connect(n, c, g.graph_out_node(), c)
        pkg = g.compile(SR, F)
        return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    assert supports_megakernel(prog_with(2, ParametricEQNode([
        EQBand(FilterType.PEAKING, 440.0, 1.0, 6.0)])))
    assert supports_megakernel(prog_with(2, WaveshaperNode("tanh", 6.0)))
    assert supports_megakernel(prog_with(2, TremoloNode(4.0, 0.5)))
    assert supports_megakernel(prog_with(2, ModDelayNode.chorus()))
    assert supports_megakernel(prog_with(2, PitchShiftNode(3.0)))


def test_eligibility_dynamics_and_noise():
    """On-chip verified (round 3): compressor/gate/limiter lower through
    Mosaic via ops.dynamics.sample_scan (Mosaic rejects scans with
    extensive outputs; the chain measured 7e-9 parity vs the XLA
    executor on v5e).  Noise stays out: threefry seeding rejects the
    tile-vmapped uint32 seed."""
    from firewheel_tpu.nodes import (
        CompressorNode,
        GateNode,
        LimiterNode,
        NoiseNode,
    )

    def prog_with(node):
        g = AudioGraph(AudioGraphConfig(0, 2))
        b = g.add_node(0, 2, BeepTestNode(440, -18, True))
        n = g.add_node(2, 2, node)
        for c in range(2):
            g.connect(b, c, n, c)
            g.connect(n, c, g.graph_out_node(), c)
        pkg = g.compile(SR, F)
        return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    assert supports_megakernel(prog_with(CompressorNode()))
    assert supports_megakernel(prog_with(GateNode()))
    assert supports_megakernel(prog_with(LimiterNode()))

    g = AudioGraph(AudioGraphConfig(0, 2))
    n = g.add_node(0, 2, NoiseNode("pink"))
    for c in range(2):
        g.connect(n, c, g.graph_out_node(), c)
    pkg = g.compile(SR, F)
    assert not supports_megakernel(
        ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    )


def test_bit_exact_vs_xla_executor():
    prog = mixer_program()
    B, K = 16, 4
    mega = MegaRenderer(prog, batch=B, num_blocks=K, tile=8, interpret=True)
    outs, masks, state2 = mega.render_chunk(
        mega.stack_params(), mega.init_state(), 0
    )

    br = BatchRenderer(prog, batch=B)
    bout, bmask, bstate = br.render_chunk(
        br.stack_params(), br.init_state(), num_blocks=K
    )

    np.testing.assert_array_equal(np.asarray(outs), np.asarray(bout))
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(bmask))
    for key in state2:
        for a, b in zip(jax.tree.leaves(state2[key]), jax.tree.leaves(bstate[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_carries_across_chunks():
    prog = mixer_program()
    mega = MegaRenderer(prog, batch=8, num_blocks=2, tile=8, interpret=True)
    params = mega.stack_params()
    state = mega.init_state()
    o1, _, state = mega.render_chunk(params, state, 0)
    o2, _, state = mega.render_chunk(params, state, 2 * F)

    br = BatchRenderer(prog, batch=8)
    ro, _, rstate = br.render_chunk(br.stack_params(), br.init_state(), num_blocks=4)
    got = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(ro), atol=2e-6)


def test_dynamics_chain_parity_interpret():
    """beep -> compressor -> gate -> limiter through the megakernel
    (interpret mode traces the SAME Mosaic-form kernels — sample_scan's
    iota-masked fori_loop, doubling sliding max) matches the XLA executor."""
    from firewheel_tpu.nodes import CompressorNode, GateNode, LimiterNode

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440, -18, True))
    c = g.add_node(2, 2, CompressorNode(threshold_db=-24.0, ratio=4.0))
    gt = g.add_node(2, 2, GateNode(threshold_db=-40.0, hold_secs=0.005))
    lm = g.add_node(2, 2, LimiterNode(ceiling_db=-6.0, lookahead_secs=0.002))
    prev = b
    for n in (c, gt, lm):
        for ch in range(2):
            g.connect(prev, ch, n, ch)
        prev = n
    for ch in range(2):
        g.connect(prev, ch, g.graph_out_node(), ch)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    assert supports_megakernel(prog)

    B, K = 8, 4
    mega = MegaRenderer(prog, batch=B, num_blocks=K, tile=8, interpret=True)
    outs, masks, st = mega.render_chunk(mega.stack_params(), mega.init_state(), 0)

    br = BatchRenderer(prog, batch=B)
    bout, bmask, bstate = br.render_chunk(
        br.stack_params(), br.init_state(), num_blocks=K
    )
    np.testing.assert_array_equal(np.asarray(outs), np.asarray(bout))
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(bmask))


def test_mod_pitch_parity_interpret():
    """Round-4 reformulations: mod-delay (no feedback) and pitch shift
    join the megakernel — rank-1 flattened gathers (→ 2-D after the tile
    vmap) and a shift-left ring (static-slice concat) instead of the
    cursor+scatter write.  Interpret mode traces the SAME Mosaic-form
    kernels; state parity is checked per-leaf."""
    from firewheel_tpu.nodes import ModDelayNode, PitchShiftNode

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440, -14, True))
    ch = g.add_node(2, 2, ModDelayNode.chorus())
    ps = g.add_node(2, 2, PitchShiftNode(semitones=4.0, mix=0.6))
    cl = g.add_node(2, 2, HardClipNode(0.0))
    chain = [b, ch, ps, cl, g.graph_out_node()]
    for a_, b_ in zip(chain[:-1], chain[1:]):
        g.connect(a_, 0, b_, 0); g.connect(a_, 1, b_, 1)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    assert supports_megakernel(prog)

    B, K = 8, 4
    mega = MegaRenderer(prog, batch=B, num_blocks=K, tile=4, interpret=True)
    outs, masks, mstate = mega.render_chunk(
        mega.stack_params(), mega.init_state(), 0
    )
    br = BatchRenderer(prog, batch=B)
    bout, bmask, bstate = br.render_chunk(
        br.stack_params(), br.init_state(), num_blocks=K
    )
    np.testing.assert_array_equal(np.asarray(outs), np.asarray(bout))
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(bmask))
    for key in mstate:
        ma, xa = mstate[key], bstate[key]
        for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(ma),
            jax.tree_util.tree_leaves_with_path(xa),
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b_),
                err_msg=f"{key}{jax.tree_util.keystr(pa)}",
            )


def test_flanger_feedback_stays_opted_out():
    from firewheel_tpu.nodes import ModDelayNode

    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440, -14, True))
    fl = g.add_node(2, 2, ModDelayNode.flanger())
    g.connect(b, 0, fl, 0); g.connect(b, 1, fl, 1)
    g.connect(fl, 0, g.graph_out_node(), 0)
    g.connect(fl, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    assert not supports_megakernel(prog)
