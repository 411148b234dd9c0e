"""Differential fuzzer: random node DAGs, compiled executor vs an
independent eager interpreter.

The reference validates its compiler with hand-picked graphs
(``crates/firewheel-graph/src/graph/compiler.rs`` inline tests, ported in
``tests/test_compiler.py``).  This goes further: generate random DAGs over
the node palette, render them through the full pipeline
(``AudioGraph.compile`` -> ``ScheduleProgram.render_block``: topo sort,
buffer allocation/aliasing/generations, SSA lowering, node pooling vmap,
silence-mask threading, graph-out zeroing) and compare block-by-block
against a *naive interpreter* that shares none of that machinery — it walks
the builder's own wiring records in creation order with one dedicated
buffer per (node, port), calling each ``NodeProcessor.kernel`` eagerly.

Any disagreement localizes a structural bug: buffer aliasing clobbers,
wrong schedule order, pooling mixing up member params/state, mask
mis-threading, or unconnected-port mishandling.  Seeds are fixed so
failures reproduce.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    BlockInfo,
    ScheduleProgram,
)
from firewheel_tpu.executor import node_key
from firewheel_tpu.nodes import (
    BeepTestNode,
    DelayCompNode,
    EchoNode,
    FilterNode,
    HardClipNode,
    MonoToStereoNode,
    NoiseNode,
    ParametricEQNode,
    StereoPanNode,
    StereoToMonoNode,
    StereoWidthNode,
    SumNode,
    TremoloNode,
    VolumeNode,
    WaveshaperNode,
)

SR = 48000
F = 128
BLOCKS = 5

# Each entry: name, builder(rng) -> (AudioNode, num_inputs, num_outputs).
# Port counts are fixed per type to configurations every node accepts.
PALETTE = [
    ("beep", lambda r: (BeepTestNode(float(r.uniform(80, 2000)),
                                     float(r.uniform(-24, -6)),
                                     bool(r.random() < 0.8)), 0, 2)),
    ("noise", lambda r: (NoiseNode("pink" if r.random() < 0.5 else "white",
                                   float(r.uniform(-30, -12)),
                                   seed=int(r.integers(0, 2**31))), 0, 2)),
    ("volume", lambda r: (VolumeNode(float(r.uniform(0, 150))), 2, 2)),
    ("sum", lambda r: (SumNode(), 4, 2)),
    ("hard_clip", lambda r: (HardClipNode(float(r.uniform(-12, 0))), 2, 2)),
    ("filter", lambda r: (FilterNode(
        ["lowpass", "highpass", "bandpass", "peaking"][int(r.integers(4))],
        float(r.uniform(100, 8000)), float(r.uniform(0.5, 4.0)),
        float(r.uniform(-9, 9))), 2, 2)),
    ("echo", lambda r: (EchoNode(float(r.uniform(0.01, 0.08)),
                                 float(r.uniform(0.0, 0.8)),
                                 float(r.uniform(0.2, 1.0))), 2, 2)),
    ("delay_comp", lambda r: (DelayCompNode(int(r.integers(0, 256))), 2, 2)),
    ("eq", lambda r: (ParametricEQNode(), 2, 2)),
    ("waveshaper", lambda r: (WaveshaperNode(
        ["tanh", "atan", "soft"][int(r.integers(3))],
        float(r.uniform(0, 18))), 2, 2)),
    ("stereo_width", lambda r: (StereoWidthNode(float(r.uniform(0, 2))), 2, 2)),
    ("pan", lambda r: (StereoPanNode(float(r.uniform(-1, 1))), 2, 2)),
    ("mono2stereo", lambda r: (MonoToStereoNode(), 1, 2)),
    ("stereo2mono", lambda r: (StereoToMonoNode(), 2, 1)),
    ("tremolo", lambda r: (TremoloNode(float(r.uniform(0.5, 12.0)),
                                       float(r.uniform(0, 1))), 2, 2)),
]


def build_random_graph(rng, graph_factory=None):
    """Random DAG: nodes wire only to earlier nodes, so creation order is
    itself a valid (independent) topological order for the interpreter.
    Input ports connect with p=0.85 (some stay dangling -> cleared+silent);
    outputs fan out freely; ManyToOne never occurs (each input port takes
    at most one edge, like the reference's graph contract).

    ``graph_factory(n_in_ch)``: build into a caller-owned graph (e.g. a
    GraphContext's) instead of a fresh AudioGraph."""
    n_in_ch = int(rng.choice([0, 2]))
    if graph_factory is None:
        g = AudioGraph(AudioGraphConfig(n_in_ch, 2))
    else:
        g = graph_factory(n_in_ch)
    g.fuzz_num_inputs = n_in_ch
    kin = node_key(g.graph_in_node())

    avail = [(kin, g.graph_in_node(), p) for p in range(n_in_ch)]
    created = []  # (key, NodeID, n_in, n_out)
    edges = {}  # (dst_key, dst_port) -> (src_key, src_port)

    for _ in range(int(rng.integers(3, 10))):
        _, mk = PALETTE[int(rng.integers(len(PALETTE)))]
        node, n_in, n_out = mk(rng)
        nid = g.add_node(n_in, n_out, node)
        k = node_key(nid)
        for port in range(n_in):
            if avail and rng.random() < 0.85:
                sk, sid, sp = avail[int(rng.integers(len(avail)))]
                g.connect(sid, sp, nid, port)
                edges[(k, port)] = (sk, sp)
        created.append((k, nid, n_in, n_out))
        avail.extend((k, nid, p) for p in range(n_out))

    for port in range(2):
        if avail and rng.random() < 0.95:
            sk, sid, sp = avail[int(rng.integers(len(avail)))]
            g.connect(sid, sp, g.graph_out_node(), port)
            edges[("out", port)] = (sk, sp)
    return g, created, edges


# The naive-interpreter oracle is a public testing utility now
# (firewheel_tpu/testing.py); these fuzzers keep feeding it their OWN
# wiring records so the oracle side still shares nothing with the
# compiler/executor under test.
from firewheel_tpu.testing import interpret_block  # noqa: E402


def run_differential(seed):
    rng = np.random.default_rng(seed)
    g, created, edges = build_random_graph(rng)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    procs = {node_key(nid): proc for nid, proc in pkg.new_node_processors}
    kin = node_key(g.graph_in_node())

    n_in_ch = g.fuzz_num_inputs
    params = prog.collect_params()
    exec_state = prog.init_state()
    interp_state = {k: v for k, v in prog.init_state().items()}

    for blk in range(BLOCKS):
        gi = jnp.asarray(
            rng.standard_normal((n_in_ch, F)).astype(np.float32) * 0.3
        )
        im = jnp.asarray(rng.random(n_in_ch) < 0.25)
        info = BlockInfo.make(
            stream_time_secs=blk * F / SR, stream_sample=blk * F
        )

        out_e, om_e, exec_state = prog.render_block(
            params, exec_state, gi, im, info
        )
        out_i, om_i, interp_state = interpret_block(
            created, edges, procs, params, interp_state, gi, im, info, kin
        )

        np.testing.assert_allclose(
            np.asarray(out_e), np.asarray(out_i), atol=1e-5, rtol=0,
            err_msg=f"seed={seed} block={blk} graph="
                    f"{[k for k, *_ in created]} edges={edges}",
        )
        np.testing.assert_array_equal(
            np.asarray(om_e), om_i,
            err_msg=f"seed={seed} block={blk}: out_mask diverged",
        )


@pytest.mark.parametrize("seed", range(12))
def test_random_graph_differential(seed):
    run_differential(seed)


def test_pooling_heavy_differential():
    """Many identical parallel voices force large pooled vmap groups in the
    executor plan — the naive interpreter never pools, so any member
    params/state mix-up in the pooling path diverges here."""
    rng = np.random.default_rng(1234)
    g = AudioGraph(AudioGraphConfig(0, 2))
    g.fuzz_num_inputs = 0
    kin = node_key(g.graph_in_node())
    created, edges = [], {}

    n_voices = 6
    sum_id = g.add_node(2 * n_voices, 2, SumNode())
    ksum = node_key(sum_id)
    for v in range(n_voices):
        beep = g.add_node(0, 2, BeepTestNode(220.0 * (v + 1), -18.0, True))
        vol = g.add_node(2, 2, VolumeNode(40.0 + 10.0 * v))
        kb, kv = node_key(beep), node_key(vol)
        for ch in range(2):
            g.connect(beep, ch, vol, ch)
            g.connect(vol, ch, sum_id, 2 * v + ch)
            edges[(kv, ch)] = (kb, ch)
            edges[(ksum, 2 * v + ch)] = (kv, ch)
        created.append((kb, beep, 0, 2))
        created.append((kv, vol, 2, 2))
    created.append((ksum, sum_id, 2 * n_voices, 2))
    for ch in range(2):
        g.connect(sum_id, ch, g.graph_out_node(), ch)
        edges[("out", ch)] = (ksum, ch)

    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    procs = {node_key(nid): proc for nid, proc in pkg.new_node_processors}
    params = prog.collect_params()
    exec_state = prog.init_state()
    interp_state = prog.init_state()
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    for blk in range(BLOCKS):
        info = BlockInfo.make(
            stream_time_secs=blk * F / SR, stream_sample=blk * F
        )
        out_e, om_e, exec_state = prog.render_block(
            params, exec_state, gi, im, info
        )
        out_i, om_i, interp_state = interpret_block(
            created, edges, procs, params, interp_state, gi, im, info, kin
        )
        np.testing.assert_allclose(
            np.asarray(out_e), np.asarray(out_i), atol=1e-5, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(om_e), om_i)


def test_palette_covers_every_entry_somewhere():
    """The 12 fixed seeds should collectively exercise most of the palette
    (guards against a rng change silently shrinking coverage)."""
    names = set()
    for seed in range(12):
        rng = np.random.default_rng(seed)
        g, created, _ = build_random_graph(rng)
        pkg = g.compile(SR, F)
        for nid, proc in pkg.new_node_processors:
            names.add(type(proc).__name__)
    assert len(names) >= 8, f"only {sorted(names)} exercised"
