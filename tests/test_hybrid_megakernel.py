"""Hybrid megakernel: Pallas islands between XLA stages (VERDICT r2 item 4).

The BASELINE effects-chain (sampler → filter → echo → clip → reverb)
could never take the all-or-nothing megakernel; the hybrid partitions the
schedule so every Mosaic-eligible run executes as a Pallas island with
its live buffers as kernel operands, and the rest (FFT reverb, gather
samplers) stays on the exact XLA path.  Stream-input graphs work too —
graph_in rows are just live-in buffers of the first segment (item 4a).

All parity is against the XLA BatchRenderer chunk path (interpret-mode
Pallas on CPU; on-chip measurement in docs/PERF.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.executor_pallas import (
    HybridMegaRenderer,
    partition_schedule,
)
from firewheel_tpu.nodes import (
    BeepTestNode,
    ConvolutionReverbNode,
    EchoNode,
    FilterNode,
    HardClipNode,
    SamplerNode,
    StereoPanNode,
    SumNode,
    VolumeNode,
)
from firewheel_tpu.parallel import BatchRenderer

SR, F = 48000, 128
B, K = 8, 4


def _program(g):
    pkg = g.compile(SR, F)
    return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)


def effects_chain_program():
    """BASELINE config 4: sampler → filter → echo → clip → reverb."""
    rng = np.random.default_rng(3)
    clip_audio = (rng.standard_normal((2, 4096)) * 0.25).astype(np.float32)
    ir = (rng.standard_normal((2, 256)) * np.exp(
        -np.arange(256, dtype=np.float32) / 48.0
    )).astype(np.float32)

    g = AudioGraph(AudioGraphConfig(0, 2))
    sampler_node = SamplerNode(percent_volume=100.0, quality="cubic")
    sampler_node.set_sample(SampleResource(clip_audio))
    sampler_node.play()
    sampler = g.add_node(0, 2, sampler_node)
    filt = g.add_node(2, 2, FilterNode("lowpass", frequency_hz=6000.0, q=0.9))
    echo = g.add_node(2, 2, EchoNode(delay_secs=0.01, feedback=0.35, wet=0.4))
    clip = g.add_node(2, 2, HardClipNode(threshold_db=-3.0))
    rev = g.add_node(2, 2, ConvolutionReverbNode(ir, wet=0.35))
    chain = [sampler, filt, echo, clip, rev, g.graph_out_node()]
    for a, b in zip(chain[:-1], chain[1:]):
        for ch in range(2):
            g.connect(a, ch, b, ch)
    return _program(g)


def stream_in_program():
    """Graph with stream inputs: in → volume → pan → clip → out."""
    g = AudioGraph(AudioGraphConfig(2, 2))
    vol = g.add_node(2, 2, VolumeNode(80.0))
    pan = g.add_node(2, 2, StereoPanNode(0.25))
    clip = g.add_node(2, 2, HardClipNode(0.0))
    chain = [g.graph_in_node(), vol, pan, clip, g.graph_out_node()]
    for a, b in zip(chain[:-1], chain[1:]):
        for ch in range(2):
            g.connect(a, ch, b, ch)
    return _program(g)


def mixer_program():
    """All-eligible source graph: one island end to end."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    b1 = g.add_node(0, 2, BeepTestNode(440, -18, True))
    b2 = g.add_node(0, 2, BeepTestNode(660, -18, True))
    v = g.add_node(2, 2, VolumeNode(80.0))
    s = g.add_node(4, 2, SumNode())
    c = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(b1, 0, v, 0); g.connect(b1, 1, v, 1)
    g.connect(v, 0, s, 0); g.connect(v, 1, s, 1)
    g.connect(b2, 0, s, 2); g.connect(b2, 1, s, 3)
    g.connect(s, 0, c, 0); g.connect(s, 1, c, 1)
    g.connect(c, 0, g.graph_out_node(), 0)
    g.connect(c, 1, g.graph_out_node(), 1)
    return _program(g)


def sampler_pitch_program():
    """sampler (xla) → chorus → pitch → clip (unrolled island) → reverb
    (xla): exercises the per-island static K-loop unroll."""
    from firewheel_tpu.nodes import ModDelayNode, PitchShiftNode

    rng = np.random.default_rng(7)
    clip_audio = (rng.standard_normal((2, 4096)) * 0.25).astype(np.float32)
    ir = (rng.standard_normal((2, 128)) * np.exp(
        -np.arange(128, dtype=np.float32) / 32.0
    )).astype(np.float32)

    g = AudioGraph(AudioGraphConfig(0, 2))
    sampler_node = SamplerNode(percent_volume=100.0, quality="cubic")
    sampler_node.set_sample(SampleResource(clip_audio))
    sampler_node.play()
    sampler = g.add_node(0, 2, sampler_node)
    chorus = g.add_node(2, 2, ModDelayNode.chorus(rate_hz=0.9, mix=0.5))
    pitch = g.add_node(2, 2, PitchShiftNode(semitones=-3.0, mix=0.7))
    clip = g.add_node(2, 2, HardClipNode(-1.0))
    rev = g.add_node(2, 2, ConvolutionReverbNode(ir, wet=0.3))
    chain = [sampler, chorus, pitch, clip, rev, g.graph_out_node()]
    for a, b in zip(chain[:-1], chain[1:]):
        for ch in range(2):
            g.connect(a, ch, b, ch)
    return _program(g)


def round3_effects_program():
    """New-node chain with interleaved eligibility (round 3):
    beep → chorus (xla) → eq → waveshaper → tremolo (island) →
    pitch shift (xla) → out."""
    from firewheel_tpu.nodes import (
        EQBand,
        FilterType,
        ModDelayNode,
        ParametricEQNode,
        PitchShiftNode,
        TremoloNode,
        WaveshaperNode,
    )

    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440, -18, True))
    chorus = g.add_node(2, 2, ModDelayNode.chorus(rate_hz=1.2, mix=0.4))
    eq = g.add_node(2, 2, ParametricEQNode([
        EQBand(FilterType.LOW_SHELF, 150.0, 0.8, 2.0),
        EQBand(FilterType.PEAKING, 2000.0, 1.2, -3.0),
    ]))
    shaper = g.add_node(2, 2, WaveshaperNode("soft", drive_db=6.0, mix=0.7))
    trem = g.add_node(2, 2, TremoloNode(rate_hz=3.0, depth=0.5))
    ps = g.add_node(2, 2, PitchShiftNode(semitones=2.0))
    chain = [beep, chorus, eq, shaper, trem, ps, g.graph_out_node()]
    for a, b in zip(chain[:-1], chain[1:]):
        for ch in range(2):
            g.connect(a, ch, b, ch)
    return _program(g)


def _xla_reference(prog, params, state, graph_in=None, in_mask=None,
                   start_sample=0):
    """Reference: the XLA BatchRenderer chunk path."""
    br = BatchRenderer(prog, batch=B)
    gi = (
        jnp.zeros((B, K, prog.num_graph_inputs, F), jnp.float32)
        if graph_in is None
        else graph_in
    )
    im = (
        jnp.ones((B, K, prog.num_graph_inputs), bool)
        if in_mask is None
        else in_mask
    )
    return br.render_chunk(
        params, state, gi, im, start_sample=start_sample, num_blocks=K
    )


class TestPartition:
    def test_effects_chain_partitions(self):
        prog = effects_chain_program()
        segs = partition_schedule(prog)
        kinds = [k for k, _ in segs]
        # sampler (xla) | filter+echo+clip island | reverb (xla)
        assert kinds == ["xla", "mega", "xla"]
        assert [len(n) for _, n in segs] == [1, 3, 1]

    def test_all_eligible_is_one_island(self):
        prog = mixer_program()
        segs = partition_schedule(prog)
        assert [k for k, _ in segs] == ["mega"]

    def test_round3_chain_partitions(self):
        prog = round3_effects_program()
        segs = partition_schedule(prog)
        kinds = [k for k, _ in segs]
        # round 4: chorus + pitch reformulated Mosaic-safe, so the whole
        # beep→chorus→eq→waveshaper→tremolo→pitch chain is ONE island
        assert kinds == ["mega"]

    def test_unroll_island_partitions(self):
        """A pitch-shift island between XLA stages asks for a statically
        unrolled K loop (megakernel_needs_unroll) without dragging the
        sampler/reverb stages along."""
        prog = sampler_pitch_program()
        segs = partition_schedule(prog)
        assert [k for k, _ in segs] == ["xla", "mega", "xla"]

    def test_min_island_folds_tiny_runs(self):
        prog = effects_chain_program()
        segs = partition_schedule(prog, min_island=5)
        assert [k for k, _ in segs] == ["xla"]


class TestHybridParity:
    def test_effects_chain_matches_xla(self):
        prog = effects_chain_program()
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=4,
                                interpret=True)
        params, state = hy.stack_params(), hy.init_state()
        out_h, om_h, st_h = hy.render_chunk(params, state)
        out_x, om_x, st_x = _xla_reference(prog, params, state)
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_h), np.asarray(om_x))

    def test_stream_input_graph(self):
        prog = stream_in_program()
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=4,
                                interpret=True, min_island=1)
        assert any(k == "mega" for k, _ in hy.segments)
        rng = np.random.default_rng(11)
        gi = jnp.asarray(rng.standard_normal((B, K, 2, F)), jnp.float32) * 0.3
        im = jnp.zeros((B, K, 2), bool)
        params, state = hy.stack_params(), hy.init_state()
        out_h, om_h, _ = hy.render_chunk(params, state, gi, im)
        out_x, om_x, _ = _xla_reference(prog, params, state, gi, im)
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_h), np.asarray(om_x))

    def test_single_island_source_graph(self):
        prog = mixer_program()
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=4,
                                interpret=True)
        params, state = hy.stack_params(), hy.init_state()
        out_h, _, _ = hy.render_chunk(params, state)
        out_x, _, _ = _xla_reference(prog, params, state)
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-6, rtol=0
        )

    def test_round3_chain_matches_xla(self):
        prog = round3_effects_program()
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=4,
                                interpret=True)
        params, state = hy.stack_params(), hy.init_state()
        out_h, om_h, _ = hy.render_chunk(params, state)
        out_x, om_x, _ = _xla_reference(prog, params, state)
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_h), np.asarray(om_x))

    def test_unroll_island_matches_xla(self):
        """Pitch inside an island: the K loop statically unrolls
        (megakernel_needs_unroll) and still matches the XLA chunk path,
        state carry included."""
        prog = sampler_pitch_program()
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=4,
                                interpret=True)
        params, state = hy.stack_params(), hy.init_state()
        out1, om1, st1 = hy.render_chunk(params, state, start_sample=0)
        out2, om2, _ = hy.render_chunk(params, st1, start_sample=K * F)
        xo1, xm1, xs1 = _xla_reference(prog, params, state)
        xo2, xm2, _ = _xla_reference(
            prog, params, xs1, start_sample=K * F
        )
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(xo1), atol=2e-6, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(xo2), atol=2e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om2), np.asarray(xm2))

    def test_state_carries_across_chunks(self):
        prog = effects_chain_program()
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=4,
                                interpret=True)
        params, state = hy.stack_params(), hy.init_state()
        out1, _, st1 = hy.render_chunk(params, state, start_sample=0)
        out2, _, _ = hy.render_chunk(params, st1, start_sample=K * F)

        out_x1, _, sx1 = _xla_reference(prog, params, state)
        out_x2, _, _ = _xla_reference(
            prog, params, sx1, start_sample=K * F
        )
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(out_x2), atol=2e-6, rtol=0
        )


class TestHybridMesh:
    """The winning lowering scales out: the whole per-shard hybrid (XLA
    stages + Pallas islands) runs inside shard_map over a dp axis with
    zero collectives — BatchRenderer's dp story at island speed."""

    def test_dp_sharded_matches_unsharded(self):
        from firewheel_tpu.parallel import make_mesh

        prog = effects_chain_program()
        mesh = make_mesh({"dp": 4})
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=2,
                                interpret=True, mesh=mesh, axis="dp")
        params, state = hy.stack_params(), hy.init_state()
        out_s, om_s, st_s = hy.render_chunk(params, state)

        ref = HybridMegaRenderer(effects_chain_program(), batch=B,
                                 num_blocks=K, tile=2, interpret=True)
        out_u, om_u, _ = ref.render_chunk(ref.stack_params(), ref.init_state())
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_u), atol=1e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_s), np.asarray(om_u))

    def test_dp_sharded_state_carries(self):
        from firewheel_tpu.parallel import make_mesh

        prog = effects_chain_program()
        mesh = make_mesh({"dp": 4})
        hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=2,
                                interpret=True, mesh=mesh, axis="dp")
        params, state = hy.stack_params(), hy.init_state()
        _, _, st1 = hy.render_chunk(params, state)
        out2, _, _ = hy.render_chunk(params, st1, start_sample=K * F)
        ref = HybridMegaRenderer(effects_chain_program(), batch=B,
                                 num_blocks=K, tile=2, interpret=True)
        rp, rs = ref.stack_params(), ref.init_state()
        _, _, rst1 = ref.render_chunk(rp, rs)
        rout2, _, _ = ref.render_chunk(rp, rst1, start_sample=K * F)
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(rout2), atol=1e-6, rtol=0
        )


class TestBatchRendererHybrid:
    """``BatchRenderer(lowering="hybrid")``: the serving front door takes
    the winning lowering — same public contract (stack_params/init_state/
    render_chunk/update_instance/checkpoints), islands underneath."""

    def test_matches_xla_lowering(self):
        prog = effects_chain_program()
        br_h = BatchRenderer(prog, batch=B, lowering="hybrid", tile=4,
                             hybrid_interpret=True)
        br_x = BatchRenderer(effects_chain_program(), batch=B)
        params, state = br_h.stack_params(), br_h.init_state()
        out_h, om_h, st_h = br_h.render_chunk(params, state, num_blocks=K)
        out_x, om_x, st_x = br_x.render_chunk(
            br_x.stack_params(), br_x.init_state(), num_blocks=K
        )
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_h), np.asarray(om_x))

    def test_state_carries_and_stream_inputs(self):
        prog = stream_in_program()
        br_h = BatchRenderer(prog, batch=B, lowering="hybrid", tile=4,
                             hybrid_interpret=True)
        br_x = BatchRenderer(stream_in_program(), batch=B)
        rng = np.random.default_rng(23)
        gi = jnp.asarray(rng.standard_normal((B, K, 2, F)), jnp.float32) * 0.3
        im = jnp.zeros((B, K, 2), bool)
        ph, sh = br_h.stack_params(), br_h.init_state()
        px, sx = br_x.stack_params(), br_x.init_state()
        _, _, sh1 = br_h.render_chunk(ph, sh, gi, im, num_blocks=K)
        _, _, sx1 = br_x.render_chunk(px, sx, gi, im, num_blocks=K)
        out_h, _, _ = br_h.render_chunk(
            ph, sh1, gi, im, start_sample=K * F, num_blocks=K
        )
        out_x, _, _ = br_x.render_chunk(
            px, sx1, gi, im, start_sample=K * F, num_blocks=K
        )
        np.testing.assert_allclose(
            np.asarray(out_h), np.asarray(out_x), atol=2e-6, rtol=0
        )

    def test_dp_mesh_matches_unsharded(self):
        from firewheel_tpu.parallel import make_mesh

        mesh = make_mesh({"dp": 4})
        br_s = BatchRenderer(effects_chain_program(), batch=B, mesh=mesh,
                             lowering="hybrid", tile=2,
                             hybrid_interpret=True)
        br_u = BatchRenderer(effects_chain_program(), batch=B,
                             lowering="hybrid", tile=2,
                             hybrid_interpret=True)
        out_s, om_s, _ = br_s.render_chunk(
            br_s.stack_params(), br_s.init_state(), num_blocks=K
        )
        out_u, om_u, _ = br_u.render_chunk(
            br_u.stack_params(), br_u.init_state(), num_blocks=K
        )
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_u), atol=1e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_s), np.asarray(om_u))

    def test_nonzero_status_rejected(self):
        br = BatchRenderer(effects_chain_program(), batch=B,
                           lowering="hybrid", tile=4,
                           hybrid_interpret=True)
        with pytest.raises(AssertionError, match="status"):
            br.render_chunk(
                br.stack_params(), br.init_state(), num_blocks=K, status=1
            )

    def test_unlowerable_tile_rejected_up_front(self):
        # Mosaic requires the batch tile (second-to-last block dim of
        # lifted 1-D leaves) be a multiple of 8 or the full per-shard
        # batch; interpret mode wouldn't catch it, so __init__ must.
        with pytest.raises(ValueError, match="tile=4"):
            HybridMegaRenderer(effects_chain_program(), batch=B,
                               num_blocks=K, tile=4, interpret=False)
        br = BatchRenderer(effects_chain_program(), batch=16,
                           lowering="hybrid", tile=4)
        with pytest.raises(ValueError, match="tile="):
            br.render_chunk(br.stack_params(), br.init_state(), num_blocks=K)
