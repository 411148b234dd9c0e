"""Differential fuzzer for LIVE GRAPH EDITS.

`test_differential_fuzz` checks static random DAGs; this drives the part
the reference calls its core UX — mutate the graph while the stream runs
(``crates/firewheel-graph/src/context.rs:118-127`` recompiles per frame;
``processor.rs:167-206`` hot-swaps with state round-trip).  Random edit
sequences (add node / remove node / connect / disconnect / live param set)
run against the full stack: ``GraphContext.update`` recompile →
``FirewheelProcessor`` synchronous state-migrating swap → packed-path
dispatch — while the naive eager interpreter from the static fuzzer
mirrors every edit in its own wiring records and carries its own state
dict across edits.

Divergence localizes migration bugs: state lost or mis-keyed across a
swap, stale processors surviving removal, buffer re-allocation breaking
surviving nodes, params mis-collected after a topology change.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import GraphContext, UpdateStatus
from firewheel_tpu.core.node import BlockInfo, stream_time_from_sample
from firewheel_tpu.executor import clear_program_cache, node_key
from firewheel_tpu.processor import ProcessorStatus

from test_differential_fuzz import F, PALETTE, SR, interpret_block


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_program_cache()
    yield
    clear_program_cache()


class GraphModel:
    """Builder-side mirror: creation-ordered node records + explicit edge
    list.  The interpreter renders from THESE records, never from the
    compiled schedule, so the two sides share no wiring state."""

    def __init__(self, g):
        self.g = g
        self.created = []  # {key, nid, n_in, n_out, node}
        self.edges = []  # (src_nid, sp, dst_nid, dp); dst may be graph_out

    def _has_edge_into(self, dst_nid, dp):
        return any(d == dst_nid and p == dp for _, _, d, p in self.edges)

    def add(self, rng):
        _, mk = PALETTE[int(rng.integers(len(PALETTE)))]
        node, n_in, n_out = mk(rng)
        nid = self.g.add_node(n_in, n_out, node)
        rec = {"key": node_key(nid), "nid": nid, "n_in": n_in,
               "n_out": n_out, "node": node}
        for port in range(n_in):
            if self.created and rng.random() < 0.7:
                src = self.created[int(rng.integers(len(self.created)))]
                sp = int(rng.integers(src["n_out"]))
                self.g.connect(src["nid"], sp, nid, port)
                self.edges.append((src["nid"], sp, nid, port))
        self.created.append(rec)

    def remove(self, rng):
        if len(self.created) < 2:
            return
        i = int(rng.integers(len(self.created)))
        rec = self.created.pop(i)
        self.g.remove_node(rec["nid"])  # cascades edge removal
        self.edges = [e for e in self.edges
                      if e[0] != rec["nid"] and e[2] != rec["nid"]]

    def connect(self, rng):
        go = self.g.graph_out_node()
        # dst: a created node (inputs wired only from EARLIER nodes, so
        # the DAG invariant and the interpreter's creation-order walk
        # both hold) or a graph_out port (any src).
        choices = []
        for i, rec in enumerate(self.created):
            if i == 0:
                continue
            for dp in range(rec["n_in"]):
                if not self._has_edge_into(rec["nid"], dp):
                    choices.append((i, rec["nid"], dp))
        for dp in range(2):
            if not self._has_edge_into(go, dp):
                choices.append((len(self.created), go, dp))
        if not choices:
            return
        i, dst_nid, dp = choices[int(rng.integers(len(choices)))]
        pool = self.created[:i]
        if not pool:
            return
        src = pool[int(rng.integers(len(pool)))]
        sp = int(rng.integers(src["n_out"]))
        self.g.connect(src["nid"], sp, dst_nid, dp)
        self.edges.append((src["nid"], sp, dst_nid, dp))

    def disconnect(self, rng):
        if not self.edges:
            return
        e = self.edges.pop(int(rng.integers(len(self.edges))))
        self.g.disconnect(*e)

    def poke_param(self, rng):
        if not self.created:
            return
        rec = self.created[int(rng.integers(len(self.created)))]
        node = rec["node"]
        for name, lo, hi in (
            ("set_percent_volume", 0.0, 150.0),
            ("set_frequency", 100.0, 8000.0),
            ("set_gain_db", -24.0, 6.0),
            ("set_feedback", 0.0, 0.8),
            ("set_width", 0.0, 2.0),
            ("set_pan", -1.0, 1.0),
            ("set_drive_db", 0.0, 18.0),
            ("set_depth", 0.0, 1.0),
        ):
            setter = getattr(node, name, None)
            if setter is not None:
                setter(float(rng.uniform(lo, hi)))
                return

    def interp_edges(self):
        go = self.g.graph_out_node()
        out = {}
        for s, sp, d, dp in self.edges:
            dst = ("out", dp) if d == go else (node_key(d), dp)
            out[dst] = (node_key(s), sp)
        return out

    def interp_created(self):
        return [(r["key"], r["nid"], r["n_in"], r["n_out"])
                for r in self.created]


def render_and_compare(proc, model, interp_state, sample, kin, seed, tag):
    out = np.zeros(F * 2, np.float32)
    st = proc.process_interleaved(
        np.zeros(0, np.float32), out, 0, 2, F, sample / SR
    )
    assert st == ProcessorStatus.OK

    procs = {node_key(nid): p for nid, p in proc._processors.items()}
    live = {r["key"] for r in model.created}
    for k in list(interp_state):
        if k not in live:
            del interp_state[k]  # removed node: state dropped (both sides)
    for rec in model.created:
        if rec["key"] not in interp_state:
            interp_state[rec["key"]] = procs[rec["key"]].init_state()
    params = {k: p.collect_params() for k, p in procs.items()}

    info = BlockInfo(
        stream_time_from_sample(jnp.uint32(sample), float(SR)),
        jnp.asarray(sample, jnp.uint32),
        jnp.asarray(0, jnp.uint32),
    )
    rows, _om, new_state = interpret_block(
        model.interp_created(), model.interp_edges(), procs, params,
        interp_state, jnp.zeros((0, F), jnp.float32),
        jnp.zeros((0,), bool), info, kin,
    )
    interp_state.clear()
    interp_state.update(new_state)

    ref = np.zeros(F * 2, np.float32)
    ref[0::2] = np.asarray(rows[0])
    ref[1::2] = np.asarray(rows[1])
    np.testing.assert_allclose(
        out, ref, atol=1e-5, rtol=0,
        err_msg=f"seed={seed} {tag}: stream diverged from interpreter "
                f"(nodes={[r['key'] for r in model.created]}, "
                f"edges={model.edges})",
    )


OPS = ("add", "remove", "connect", "disconnect", "param", "param")


def run_edit_differential(seed, rounds=7):
    rng = np.random.default_rng(seed)
    cx = GraphContext()
    model = GraphModel(cx.graph)
    kin = node_key(cx.graph.graph_in_node())

    for _ in range(int(rng.integers(2, 5))):
        model.add(rng)
    model.connect(rng)
    model.connect(rng)

    proc = cx.activate(SR, 0, 2, F)
    res = cx.update()
    assert res.status == UpdateStatus.ACTIVE and res.graph_error is None

    interp_state = {}
    sample = 0
    for blk in range(2):
        render_and_compare(proc, model, interp_state, sample, kin, seed,
                           f"init blk{blk}")
        sample += F

    for rnd in range(rounds):
        for _ in range(int(rng.integers(1, 3))):
            op = OPS[int(rng.integers(len(OPS)))]
            getattr(model, {"add": "add", "remove": "remove",
                            "connect": "connect",
                            "disconnect": "disconnect",
                            "param": "poke_param"}[op])(rng)
        res = cx.update()
        assert res.status == UpdateStatus.ACTIVE, res
        assert res.graph_error is None, res.graph_error
        for blk in range(2):
            render_and_compare(proc, model, interp_state, sample, kin, seed,
                               f"round{rnd} blk{blk}")
            sample += F

    cx.deactivate(stream_is_running=False)


@pytest.mark.parametrize("seed", range(4))
def test_live_edit_differential(seed):
    run_edit_differential(seed)
