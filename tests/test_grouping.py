"""Node-pooling tests: identical consecutive nodes vmap into one trace
(executor._build_plan) with outputs equal to the ungrouped walk."""

import math

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
    Spatializer3DNode,
    SumNode,
    VolumeNode,
)

SR, F = 48000, 128


def build_scene(n_emit=16):
    g = AudioGraph(AudioGraphConfig(0, 2))
    per = n_emit // 4
    sums = [g.add_node(2 * per, 2, SumNode()) for _ in range(4)]
    master = g.add_node(8, 2, SumNode())
    for gi_, s in enumerate(sums):
        g.connect(s, 0, master, 2 * gi_)
        g.connect(s, 1, master, 2 * gi_ + 1)
    for i in range(n_emit):
        a = 2 * math.pi * i / n_emit
        e = g.add_node(0, 1, BeepTestNode(110 * 2 ** ((i % 24) / 12), -30, True))
        sp = g.add_node(
            1, 2, Spatializer3DNode(position=(3 * math.sin(a), 0, -3 * math.cos(a)))
        )
        g.connect(e, 0, sp, 0)
        grp = sums[i // per]
        slot = i % per
        g.connect(sp, 0, grp, 2 * slot)
        g.connect(sp, 1, grp, 2 * slot + 1)
    g.connect(master, 0, g.graph_out_node(), 0)
    g.connect(master, 1, g.graph_out_node(), 1)
    return g


def programs(n_emit=16):
    g1 = build_scene(n_emit)
    pkg1 = g1.compile(SR, F)
    grouped = ScheduleProgram(
        pkg1.schedule, dict(pkg1.new_node_processors), SR, group_nodes=True
    )
    g2 = build_scene(n_emit)
    pkg2 = g2.compile(SR, F)
    ungrouped = ScheduleProgram(
        pkg2.schedule, dict(pkg2.new_node_processors), SR, group_nodes=False
    )
    return grouped, ungrouped


def test_plan_pools_identical_nodes():
    grouped, ungrouped = programs(16)
    kinds = [(k, len(m)) for k, m in grouped._plan]
    group_sizes = [n for k, n in kinds if k == "group"]
    assert max(group_sizes) >= 16  # the 16 beeps pooled (and 16 spatializers)
    assert all(k == "single" for k, m in ungrouped._plan)


def test_grouped_outputs_match_ungrouped():
    grouped, ungrouped = programs(16)
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    sg, su = grouped.init_state(), ungrouped.init_state()
    for blk in range(3):
        info = BlockInfo.make(stream_sample=blk * F)
        og, mg, sg = grouped.render_block(
            grouped.collect_params(), sg, gi, im, info
        )
        ou, mu, su = ungrouped.render_block(
            ungrouped.collect_params(), su, gi, im, info
        )
        np.testing.assert_allclose(
            np.asarray(og), np.asarray(ou), atol=1e-6, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(mg), np.asarray(mu))


def test_dependent_chain_not_pooled():
    """Two volumes in series must NOT share a group (data dependency)."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440, -12, True))
    v1 = g.add_node(2, 2, VolumeNode(80.0))
    v2 = g.add_node(2, 2, VolumeNode(50.0))
    g.connect(b, 0, v1, 0); g.connect(b, 1, v1, 1)
    g.connect(v1, 0, v2, 0); g.connect(v1, 1, v2, 1)
    g.connect(v2, 0, g.graph_out_node(), 0); g.connect(v2, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    for kind, members in prog._plan:
        if kind == "group":
            names = {type(prog._procs[members[0].id.__repr__()]).__name__}
            assert "VolumeProcessor" not in names or len(members) == 1
    # and the rendered chain is still correct: 0.64 * 0.25 gains settle
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    st = prog.init_state()
    out = None
    for blk in range(60):
        out, _, st = prog.render_block(
            prog.collect_params(), st, gi, im, BlockInfo.make(stream_sample=blk * F)
        )
    amp = float(np.abs(np.asarray(out)).max())
    expect = 0.25118864 * 0.64 * 0.25
    assert abs(amp - expect) < 1e-3


def test_packed_path_matches_unpacked():
    grouped, _ = programs(8)
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    state = grouped.init_state()
    packed = grouped.pack_state(state)

    # unpacked reference
    o_ref, m_ref, st2 = grouped.render_block(
        grouped.collect_params(), state, gi, im, BlockInfo.make()
    )
    # packed path (single block)
    o_p, m_p, packed = grouped.render_packed(
        grouped.collect_params(), packed, gi, im, 0, blocks=1
    )
    np.testing.assert_allclose(
        np.asarray(o_p)[0], np.asarray(o_ref), atol=1e-6, rtol=0
    )
    # round-trip: unpacked state equals the reference's new state
    st_p = grouped.unpack_state(packed)
    for k in st2:
        for a, b in zip(jax.tree.leaves(st2[k]), jax.tree.leaves(st_p[k])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


def test_poolable_samplers_group_and_match():
    """64-voice-mixer pattern: poolable samplers vmap into one trace and
    produce the same audio as unpooled ones."""
    from firewheel_tpu.core.sample_resource import SampleResource
    from firewheel_tpu.nodes import LoopRange, SamplerNode

    rng = np.random.default_rng(0)
    clips = [
        SampleResource(
            (rng.standard_normal((1, 2000)) * 0.2).astype(np.float32),
            device=False,
        )
        for _ in range(8)
    ]

    def build(poolable):
        g = AudioGraph(AudioGraphConfig(0, 2))
        s = g.add_node(16, 2, SumNode())
        nodes = []
        for i in range(8):
            smp = g.add_node(0, 2, SamplerNode(80.0, poolable=poolable))
            g.connect(smp, 0, s, 2 * i)
            g.connect(smp, 1, s, 2 * i + 1)
            nodes.append(smp)
        g.connect(s, 0, g.graph_out_node(), 0)
        g.connect(s, 1, g.graph_out_node(), 1)
        for i, nid in enumerate(nodes):
            n = g.node(nid)
            n.set_sample(clips[i])
            n.set_loop_range(LoopRange.FULL)
            n.set_playback_rate(2 ** ((i % 5 - 2) / 12))
            n.play()
        pkg = g.compile(SR, F)
        return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    pooled = build(True)
    plain = build(False)
    sizes = [len(m) for k, m in pooled._plan if k == "group"]
    assert 8 in sizes, f"samplers did not pool: {pooled._plan}"

    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    sp, su = pooled.init_state(), plain.init_state()
    for blk in range(4):
        info = BlockInfo.make(stream_sample=blk * F)
        op, mp, sp = pooled.render_block(pooled.collect_params(), sp, gi, im, info)
        ou, mu, su = plain.render_block(plain.collect_params(), su, gi, im, info)
        np.testing.assert_allclose(
            np.asarray(op), np.asarray(ou), atol=1e-6, rtol=0
        )
