"""Testing utilities for node authors and framework validation.

The reference's extension story is "custom audio nodes"
(``DESIGN_DOC.md:29``); its validation story is inline unit tests against
hand-built graphs (``crates/firewheel-graph/src/graph/compiler/
schedule.rs:392-711``).  This module ships both, TPU-flavored:

* :func:`validate_node` — a contract harness for third-party
  :class:`~firewheel_tpu.core.node.AudioNode` implementations.  It
  exercises every way the executor will call a kernel — eager, under
  ``jit``, chained through ``lax.scan`` (the chunk dispatch), batched
  under ``vmap`` (instance batching / node pooling), and at partial block
  sizes — and fails with a named check the moment a kernel breaks the
  purity/shape/trace rules in ``docs/EXTENDING.md``.

* :class:`NaiveGraphRenderer` — a slow, obviously-correct reference
  renderer: walks the graph's own wiring records in its own Kahn order
  with one dedicated buffer per (node, port) and eager per-node kernel
  calls.  It shares NO machinery with the compiled path (no buffer
  allocator, no SSA lowering, no pooling, no packing), which makes it the
  differential oracle the fuzz suites (``tests/test_differential_*.py``)
  compare the real executor against — and a debugging aid: render the
  same graph both ways and diff per block.

* :func:`interpret_block` — the functional core of the naive renderer,
  for callers that keep their own wiring records (the fuzzers do, so the
  oracle does not even trust ``AudioGraph``'s edge store).
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

import numpy as np
import jax
import jax.numpy as jnp

from .core.node import AudioNode, BlockInfo, NodeProcessor
from .executor import node_key

__all__ = [
    "NodeContractError",
    "interpret_block",
    "NaiveGraphRenderer",
    "validate_node",
]


class NodeContractError(AssertionError):
    """A custom node violated the kernel contract; ``check`` names the
    failing stage (see :func:`validate_node`)."""

    def __init__(self, check: str, message: str):
        super().__init__(f"[{check}] {message}")
        self.check = check


# ---------------------------------------------------------------------------
# The naive interpreter
# ---------------------------------------------------------------------------

def interpret_block(
    created: Iterable[tuple],
    edges: Mapping[tuple, tuple],
    procs: Mapping[str, NodeProcessor],
    params: Mapping[str, Any],
    state: Mapping[str, Any],
    graph_in,
    in_mask,
    info: BlockInfo,
    graph_in_key: str,
    num_graph_outputs: int = 2,
    frames: int | None = None,
):
    """Render ONE block by walking ``created`` in the given order.

    ``created``: node records in a valid topological order — tuples whose
    FIRST element is the node key and LAST TWO are ``(n_in, n_out)``
    (extra middle elements are ignored, so the fuzzers' richer records
    pass through unchanged).
    ``edges``: ``{(dst_key, dst_port) | ("out", out_port): (src_key,
    src_port)}`` — at most one source per input port, exactly like the
    graph contract (ManyToOne is a compile error, compiler.rs:363-365).
    Unconnected inputs read cleared+silent; unconnected graph outputs are
    silent; flagged graph-out channels read zero (schedule.rs:255-313
    semantics).

    Returns ``(out [num_graph_outputs, frames], out_flags bool[...],
    new_state)``.
    """
    if frames is None:
        shape = getattr(graph_in, "shape", ())
        if len(shape) == 2:
            frames = shape[1]
        else:
            raise ValueError("frames required when graph_in is not [Ni, F]")
    row = {(graph_in_key, p): graph_in[p] for p in range(graph_in.shape[0])}
    flag = {
        (graph_in_key, p): bool(in_mask[p]) for p in range(graph_in.shape[0])
    }
    zeros = jnp.zeros((frames,), jnp.float32)
    new_state = dict(state)

    for rec in created:
        k, n_in, n_out = rec[0], rec[-2], rec[-1]
        if k not in params:
            continue  # not activated/scheduled (e.g. dormancy-pruned)
        rows, fl = [], []
        for port in range(n_in):
            src = edges.get((k, port))
            if src is None:
                rows.append(zeros)
                fl.append(True)
            else:
                rows.append(row[src])
                fl.append(flag[src])
        inputs = (
            jnp.stack(rows) if rows else jnp.zeros((0, frames), jnp.float32)
        )
        mask = jnp.asarray(np.array(fl, dtype=bool))
        outs, st, om = procs[k].kernel(params[k], state[k], inputs, mask, info)
        new_state[k] = st
        om = np.asarray(om)
        for p in range(n_out):
            row[(k, p)] = outs[p]
            flag[(k, p)] = bool(om[p])

    out_rows, out_flags = [], []
    for port in range(num_graph_outputs):
        src = edges.get(("out", port))
        if src is None:
            out_rows.append(zeros)
            out_flags.append(True)
        else:
            r, f = row[src], flag[src]
            out_rows.append(jnp.zeros_like(r) if f else r)
            out_flags.append(f)
    out = (
        jnp.stack(out_rows)
        if out_rows
        else jnp.zeros((0, frames), jnp.float32)
    )
    return out, np.array(out_flags, dtype=bool), new_state


class NaiveGraphRenderer:
    """Reference renderer over an :class:`AudioGraph`: eager, per-node,
    no compiled machinery.  Typical uses::

        ref = NaiveGraphRenderer(graph, 48000, 128)
        out, mask = ref.render_block(graph_in, in_mask)

    Compare against the compiled path to localize a bug, or use it as the
    golden side of a custom-node integration test.  O(nodes) dispatches
    per block — orders of magnitude slower than the executor; never use
    it for actual rendering.

    ``processors``: pass the compile's activated processors
    (``{NodeID: proc}``) to share live params with a running engine;
    defaults to activating a fresh set from the graph's nodes.
    """

    def __init__(
        self,
        graph,
        sample_rate: int,
        max_block_frames: int,
        processors: Mapping | None = None,
    ):
        self.graph = graph
        self.sample_rate = int(sample_rate)
        self.max_block_frames = int(max_block_frames)
        gin, gout = graph.graph_in_node(), graph.graph_out_node()
        self._gin_key = node_key(gin)

        entries = {e.id: e for e in graph.nodes()}
        self.num_graph_inputs = entries[gin].num_outputs
        self.num_graph_outputs = entries[gout].num_inputs

        # Own wiring records + own Kahn order (independent of the
        # compiler's topo sort).
        self._edges = {}
        indeg = {nid: 0 for nid in entries}
        adj = {nid: [] for nid in entries}
        for e in graph.edges():
            dst = (
                ("out", e.dst_port)
                if e.dst_node == gout
                else (node_key(e.dst_node), e.dst_port)
            )
            self._edges[dst] = (node_key(e.src_node), e.src_port)
            indeg[e.dst_node] += 1
            adj[e.src_node].append(e.dst_node)
        slot = lambda n: (n.idx.slot, n.idx.generation)  # noqa: E731
        ready = sorted(
            (nid for nid, d in indeg.items() if d == 0), key=slot
        )
        order = []
        while ready:
            nid = ready.pop(0)
            order.append(nid)
            for dst in adj[nid]:
                indeg[dst] -= 1
                if indeg[dst] == 0:
                    ready.append(dst)
            ready.sort(key=slot)
        assert len(order) == len(entries), "cycle in graph"

        self._created = []
        self._procs = {}
        for nid in order:
            if nid in (gin, gout):
                continue
            ent = entries[nid]
            k = node_key(nid)
            proc = (
                processors.get(nid)
                if processors is not None
                else ent.weight.node.activate(
                    sample_rate, max_block_frames,
                    ent.num_inputs, ent.num_outputs,
                )
            )
            assert proc is not None, f"no processor for {k}"
            self._procs[k] = proc
            self._created.append((k, ent.num_inputs, ent.num_outputs))

        self.state = {k: p.init_state() for k, p in self._procs.items()}
        self._sample = 0

    def collect_params(self):
        return {k: p.collect_params() for k, p in self._procs.items()}

    def render_block(self, graph_in=None, in_mask=None, info=None):
        """Render one max_block_frames block; advances internal state and
        the stream clock (when ``info`` is not given)."""
        frames = self.max_block_frames
        if graph_in is None:
            graph_in = jnp.zeros((self.num_graph_inputs, frames), jnp.float32)
            in_mask = jnp.ones((self.num_graph_inputs,), bool)
        if info is None:
            info = BlockInfo.make(
                stream_time_secs=self._sample / self.sample_rate,
                stream_sample=self._sample,
            )
            self._sample += frames
        out, flags, self.state = interpret_block(
            self._created, self._edges, self._procs, self.collect_params(),
            self.state, jnp.asarray(graph_in), jnp.asarray(in_mask), info,
            self._gin_key, self.num_graph_outputs, frames,
        )
        return out, flags


# ---------------------------------------------------------------------------
# The node contract validator
# ---------------------------------------------------------------------------

def _fail(check, msg):
    raise NodeContractError(check, msg)


def validate_node(
    node: AudioNode,
    num_inputs: int,
    num_outputs: int,
    *,
    sample_rate: int = 48000,
    max_block_frames: int = 128,
    blocks: int = 4,
    batch: int = 3,
    atol: float = 1e-5,
    seed: int = 0,
) -> dict:
    """Validate a custom node against the executor's kernel contract.

    Runs the checks in order and raises :class:`NodeContractError` (an
    ``AssertionError`` subclass, pytest-friendly) naming the first failed
    check; returns ``{check_name: "ok"}`` for all passed checks.  Checks,
    in the order the executor relies on them:

    - ``activate``       — ``info()`` ranges admit the port counts;
      ``activate`` returns a :class:`NodeProcessor`.
    - ``pytrees``        — ``init_state``/``collect_params`` are valid
      JAX pytrees.
    - ``eager``          — one kernel call: output ``f32[num_outputs,
      F]``, mask ``bool[num_outputs]``, state' matches state's tree
      structure and leaf shapes/dtypes (a structure change would retrace
      every dispatch and break packed-state round-tripping).
    - ``determinism``    — identical (params, state, inputs) → identical
      outputs (impure kernels break replay/checkpointing).
    - ``jit``            — the kernel traces under ``jax.jit`` and matches
      eager.
    - ``scan``           — ``lax.scan`` block chaining over ``blocks``
      blocks matches sequential eager calls (the chunk dispatch).
    - ``vmap``           — batching over ``batch`` instances matches
      per-instance calls (instance batching and node pooling).
    - ``partial_block``  — the kernel accepts ``F//2`` frames (the
      executor compiles dedicated smaller programs for stream-buffer
      remainders, processor.rs:95-158 analog).

    Megakernel (Mosaic) eligibility is NOT checked here — it requires a
    real TPU backend; see docs/EXTENDING.md for the static playbook and
    ``tests/test_megakernel.py`` for the on-chip facts.
    """
    report = {}
    rng = np.random.default_rng(seed)
    F = int(max_block_frames)

    # -- activate ----------------------------------------------------------
    info_obj = node.info()
    if not (
        info_obj.num_min_supported_inputs
        <= num_inputs
        <= info_obj.num_max_supported_inputs
    ):
        _fail(
            "activate",
            f"num_inputs={num_inputs} outside the node's declared "
            f"[{info_obj.num_min_supported_inputs}, "
            f"{info_obj.num_max_supported_inputs}]",
        )
    if not (
        info_obj.num_min_supported_outputs
        <= num_outputs
        <= info_obj.num_max_supported_outputs
    ):
        _fail(
            "activate",
            f"num_outputs={num_outputs} outside the node's declared "
            f"[{info_obj.num_min_supported_outputs}, "
            f"{info_obj.num_max_supported_outputs}]",
        )
    proc = node.activate(sample_rate, F, num_inputs, num_outputs)
    if not isinstance(proc, NodeProcessor):
        _fail("activate", f"activate returned {type(proc).__name__}, "
                          "not a NodeProcessor")
    report["activate"] = "ok"

    # -- pytrees -----------------------------------------------------------
    try:
        state0 = proc.init_state()
        state_leaves = jax.tree.leaves(state0)
        params = proc.collect_params()
        jax.tree.leaves(params)
    except Exception as e:  # noqa: BLE001 - reported with context
        _fail("pytrees", f"init_state/collect_params raised: {e!r}")
    report["pytrees"] = "ok"

    def make_inputs(frames, key=None):
        r = rng if key is None else np.random.default_rng(key)
        x = r.standard_normal((num_inputs, frames)).astype(np.float32) * 0.3
        return jnp.asarray(x), jnp.zeros((num_inputs,), bool)

    def make_info(sample):
        return BlockInfo.make(
            stream_time_secs=sample / sample_rate, stream_sample=sample
        )

    # -- eager -------------------------------------------------------------
    x0, m0 = make_inputs(F, key=seed)
    try:
        out, st1, om = proc.kernel(params, state0, x0, m0, make_info(0))
    except Exception as e:  # noqa: BLE001
        _fail("eager", f"kernel raised on a plain eager call: {e!r}")
    out = jnp.asarray(out)
    if out.shape != (num_outputs, F) or out.dtype != jnp.float32:
        _fail(
            "eager",
            f"output is {out.dtype}{list(out.shape)}, expected "
            f"float32[{num_outputs}, {F}] — fill every output row",
        )
    om_arr = np.asarray(om)
    if om_arr.shape != (num_outputs,) or om_arr.dtype != np.bool_:
        _fail(
            "eager",
            f"out_mask is {om_arr.dtype}{list(om_arr.shape)}, expected "
            f"bool[{num_outputs}]",
        )
    if jax.tree.structure(st1) != jax.tree.structure(state0):
        _fail(
            "eager",
            "state' tree structure differs from init_state() — state must "
            f"be shape-stable ({jax.tree.structure(state0)} -> "
            f"{jax.tree.structure(st1)})",
        )
    for a, b in zip(state_leaves, jax.tree.leaves(st1)):
        a, b = jnp.asarray(a), jnp.asarray(b)
        if a.shape != b.shape or a.dtype != b.dtype:
            _fail(
                "eager",
                f"state leaf changed shape/dtype across a block: "
                f"{a.dtype}{list(a.shape)} -> {b.dtype}{list(b.shape)}",
            )
    report["eager"] = "ok"

    # -- determinism -------------------------------------------------------
    out2, st2, _ = proc.kernel(params, state0, x0, m0, make_info(0))
    if not np.array_equal(
        np.asarray(out), np.asarray(out2), equal_nan=True
    ):
        _fail(
            "determinism",
            "two identical kernel calls produced different outputs — "
            "kernels must be pure (host RNG/side effects belong in "
            "collect_params or state)",
        )
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        if not np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True):
            _fail("determinism", "state' differs across identical calls")
    report["determinism"] = "ok"

    # -- jit ---------------------------------------------------------------
    try:
        jout, jst, jom = jax.jit(proc.kernel)(
            params, state0, x0, m0, make_info(0)
        )
    except Exception as e:  # noqa: BLE001
        _fail(
            "jit",
            f"kernel failed to trace under jit: {e!r} — no Python "
            "branching on traced values, no side effects, static shapes",
        )
    np_ok = np.allclose(np.asarray(jout), np.asarray(out), atol=atol)
    if not np_ok:
        _fail("jit", "jit output diverged from eager beyond atol "
                     f"{atol} — kernel likely closes over mutable state")
    report["jit"] = "ok"

    # -- scan (chunk dispatch) --------------------------------------------
    xs = jnp.stack(
        [make_inputs(F)[0] for _ in range(blocks)]
    )
    samples = jnp.arange(blocks, dtype=jnp.uint32) * jnp.uint32(F)

    def body(st, xk):
        x, s = xk
        o, st, om_ = proc.kernel(
            params, st, x, m0,
            BlockInfo(
                stream_time_secs=s.astype(jnp.float32)
                / jnp.float32(sample_rate),
                stream_sample=s,
                stream_status=jnp.uint32(0),
            ),
        )
        return st, o

    try:
        st_scan, outs_scan = jax.lax.scan(body, state0, (xs, samples))
    except Exception as e:  # noqa: BLE001
        _fail("scan", f"kernel failed under lax.scan block chaining: {e!r}")
    st_seq = state0
    for b in range(blocks):
        o_seq, st_seq, _ = proc.kernel(
            params, st_seq, xs[b],
            m0,
            BlockInfo(
                stream_time_secs=jnp.float32(b * F / sample_rate),
                stream_sample=jnp.uint32(b * F),
                stream_status=jnp.uint32(0),
            ),
        )
        if not np.allclose(
            np.asarray(outs_scan[b]), np.asarray(o_seq), atol=atol
        ):
            _fail(
                "scan",
                f"block {b}: scan-chained output diverged from sequential "
                f"calls beyond atol {atol} — state is not threading "
                "correctly through the carry",
            )
    report["scan"] = "ok"

    # -- vmap (instance batching / pooling) --------------------------------
    tile = lambda t: jax.tree.map(  # noqa: E731
        lambda x: jnp.stack([jnp.asarray(x)] * batch), t
    )
    xb = jnp.stack([make_inputs(F)[0] for _ in range(batch)])
    try:
        ob, sb, omb = jax.vmap(proc.kernel, in_axes=(0, 0, 0, 0, None))(
            tile(params), tile(state0), xb,
            jnp.stack([m0] * batch), make_info(0),
        )
    except Exception as e:  # noqa: BLE001
        _fail("vmap", f"kernel failed under vmap batching: {e!r}")
    for i in range(batch):
        o_i, _, _ = proc.kernel(params, state0, xb[i], m0, make_info(0))
        if not np.allclose(np.asarray(ob[i]), np.asarray(o_i), atol=atol):
            _fail(
                "vmap",
                f"instance {i}: vmapped output diverged from the "
                f"per-instance call beyond atol {atol}",
            )
    report["vmap"] = "ok"

    # -- partial blocks ----------------------------------------------------
    half = max(1, F // 2)
    xh, mh = make_inputs(half)
    try:
        oh, _, _ = proc.kernel(params, state0, xh, mh, make_info(0))
    except Exception as e:  # noqa: BLE001
        _fail(
            "partial_block",
            f"kernel raised at frames={half} (< max_block_frames): {e!r} "
            "— stream-buffer remainders dispatch smaller blocks; size "
            "state off max_block_frames but compute off inputs.shape[-1]",
        )
    if jnp.asarray(oh).shape != (num_outputs, half):
        _fail(
            "partial_block",
            f"output at frames={half} has shape "
            f"{list(jnp.asarray(oh).shape)}, expected "
            f"[{num_outputs}, {half}]",
        )
    report["partial_block"] = "ok"

    report["supports_megakernel"] = (
        "declared (verify on-chip; docs/EXTENDING.md playbook)"
        if proc.supports_megakernel
        else "opted out"
    )
    return report
