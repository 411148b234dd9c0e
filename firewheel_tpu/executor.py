"""Schedule executor: lowers a :class:`CompiledSchedule` to fused XLA programs.

This replaces the reference's interpreted hot loop
(``CompiledSchedule::process``, ``schedule.rs:289-343`` walking node
processors per block).  Here the walk happens once, at *trace* time: each
scheduled node's kernel is inlined in topological order over SSA values (one
per arena buffer), producing a single XLA computation that fuses the whole
graph.  Buffer reuse — the reference's greedy allocator — comes for free from
XLA's buffer assignment; the schedule's buffer indices serve as the SSA
naming scheme connecting producers to consumers.

Silence flags (``buffer_silence_flags``, schedule.rs:202) become traced
booleans threaded alongside the SSA values; graph outputs honor them exactly
like ``read_graph_outputs`` (schedule.rs:255-287) by forcing flagged
channels to zero.

Three program shapes are provided:

* ``render_block``  — one block: the direct ``process_block`` analog.
* ``render_chunk``  — K blocks chained through ``lax.scan`` (recurrent state
  carried), amortizing dispatch overhead: the TPU analog of rendering many
  blocks per wakeup.
* both are pure and vmap-compatible: batching over independent graph
  instances is ``jax.vmap`` over the leading axis of (params, state,
  graph_in).

Design note — why the graph_in node is special-cased: the reference fills
graph-input buffers and flags in ``prepare_graph_inputs`` (schedule.rs:213-253)
but then lets the graph_in dummy's process clobber the flags to non-silent in
the same pass (schedule.rs:338-341 with the dummy's default mask).  We keep
the documented intent: graph-input silence flags propagate.
"""

from __future__ import annotations

import functools
import sys
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .core.node import (
    stream_time_from_sample, wrap_stream_sample, BlockInfo, NodeProcessor,
)
from .graph.compiler import CompiledSchedule, NodeID

__all__ = ["node_key", "ScheduleProgram"]


def node_key(node_id: NodeID) -> str:
    """Stable string key for state/param pytrees (dicts with string keys keep
    jit-friendly pytree structure)."""
    return repr(node_id)


class PerBlock:
    """A param leaf carrying a per-block timeline: shape ``[K, ...]`` with
    one value per block of a K-block chunk dispatch.

    The reference applies params every block (an atomic load per
    ``process``, volume.rs:92); chunked dispatch quantizes that to one
    snapshot per chunk (~85 ms at the headline K=32).  Timeline leaves ride
    the chunk scan's ``xs`` and are spliced into the param tree per block,
    restoring block-accurate (2.67 ms) control latency inside a chunk.
    Processors opt in with ``collect_timeline = True``; their
    ``collect_params(blocks=K, start_sample=..., frames=..., consume=...)``
    returns PerBlock leaves whenever ``start_sample`` is given."""

    __slots__ = ("values",)

    def __init__(self, values):
        self.values = np.asarray(values)


def _split_timelines(tree):
    """Replace PerBlock leaves by their block-0 value (structure
    placeholder) and collect the full ``[K, ...]`` timelines keyed by
    flatten index — the index vocabulary both sides of the jit share."""
    leaves, treedef = jax.tree.flatten(
        tree, is_leaf=lambda x: isinstance(x, PerBlock)
    )
    static, timelines = [], {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, PerBlock):
            static.append(leaf.values[0])
            timelines[i] = leaf.values
        else:
            static.append(leaf)
    return jax.tree.unflatten(treedef, static), timelines




_RETRY_ERRORS = ("UNIMPLEMENTED", "INTERNAL", "UNAVAILABLE")


def _perturb_inputs(tree, mode: int):
    """Semantically-inert float-input perturbation that changes the traced
    instruction stream (and thus the serialized module's instruction order).

    Round-1 evidence (docs/KNOWN_ISSUES.md): a module that fails server-side
    with a sticky spurious ``UNIMPLEMENTED`` compiles fine when the SAME ops
    are emitted in a different order — so the escalation path after a plain
    retry and a rename is to re-trace with extra no-op float ops prepended.
    ``mode`` 1 adds 0.0 to every float leaf; mode 2 multiplies by 1.0 —
    both exact identities in IEEE for finite and non-finite values alike
    (x+0.0 preserves NaN/Inf; only -0.0 + 0.0 -> +0.0 differs, and silence
    is sign-agnostic).
    """

    def nudge(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x + jnp.zeros((), x.dtype) if mode == 1 else x * jnp.ones((), x.dtype)
        return x

    return jax.tree.map(nudge, tree)


class _ResilientJit:
    """jit wrapper that survives transient backend compile faults.

    The axon TPU tunnel intermittently fails session-initial compiles with
    spurious ``UNIMPLEMENTED`` errors, and the failure can be sticky for the
    exact serialized module (name + source-location metadata + instruction
    order).  Observed empirically (docs/KNOWN_ISSUES.md): the same program
    re-emitted with an ordering-only difference — zero op-histogram change —
    compiles and runs correctly seconds later on the same chip.  Escalation
    ladder on a retryable error:

    1. retry under a renamed trampoline (fresh compile request + new
       metadata → new server cache key; covers transient faults);
    2. retry with the jaxpr re-emitted in a permuted equation order
       (``jaxpr_shuffle.shuffled`` seed 1 — the transformation the round-1
       evidence says unsticks the server);
    3. same, seed 2 (a different permutation);
    4. retry with add-zero input perturbation (changes the op histogram
       itself, in case the module's exact op multiset is what's poisoned);
    5. retry with multiply-by-one input perturbation (a different
       histogram change, last resort).

    Healthy backends never hit the retry path; the shuffle preserves the
    SSA dataflow exactly and the perturbation is an exact float identity —
    both golden-tested in tests/test_resilient_jit.py.
    """

    _MAX_ATTEMPTS = 5

    def __init__(self, fn, name: str, donate_argnums=(), **jit_kwargs):
        """``jit_kwargs`` pass through to ``jax.jit`` (e.g.
        ``out_shardings`` for the mesh-path renderers) on the primary jit
        and on every retry rebuild."""
        self._fn = fn
        self._name = name
        self._donate = donate_argnums
        self._jit_kwargs = jit_kwargs
        self._jit = jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)
        self._ok = False
        self._attempt = 0

    def _rebuild(self, attempt: int):
        from .jaxpr_shuffle import shuffled

        fn = self._fn
        if attempt in (2, 3):
            fn = shuffled(fn, attempt - 1)
        perturb_mode = {4: 1, 5: 2}.get(attempt, 0)

        def trampoline(*a, __fn=fn, __mode=perturb_mode):
            if __mode:
                a = _perturb_inputs(a, __mode)
            return __fn(*a)

        trampoline.__name__ = f"{self._name}_retry{attempt}"
        trampoline.__qualname__ = trampoline.__name__
        return jax.jit(
            trampoline, donate_argnums=self._donate, **self._jit_kwargs
        )

    def lower(self, *args, **kwargs):
        """Passthrough to the current jit's ``lower`` (cost-model probes)."""
        return self._jit.lower(*args, **kwargs)

    def __call__(self, *args):
        if self._ok:
            return self._jit(*args)
        while True:
            try:
                out = self._jit(*args)
                # Backends with deferred/async error reporting (the axon
                # tunnel) surface compile/execute faults only when a result
                # is awaited — without this sync the ladder would "succeed"
                # and the fault would explode later in caller code.  Only
                # the first (unconfirmed) call pays the sync; the hot path
                # stays fully async.  Retries assume no donated args
                # (donation is opt-in and off on faulting backends).
                jax.block_until_ready(out)
                self._ok = True
                return out
            except Exception as e:  # pragma: no cover - backend-dependent
                msg = str(e)
                if self._attempt >= self._MAX_ATTEMPTS or not any(
                    k in msg for k in _RETRY_ERRORS
                ):
                    raise
                self._attempt += 1
                print(
                    f"[firewheel_tpu] {self._name}: retryable backend fault "
                    f"(attempt {self._attempt}/{self._MAX_ATTEMPTS}): "
                    f"{msg.splitlines()[0][:120]}",
                    file=sys.stderr,
                    flush=True,
                )
                self._jit = self._rebuild(self._attempt)



# ---------------------------------------------------------------------------
# Cross-program compile cache
# ---------------------------------------------------------------------------
# Live topology edits build a FRESH ScheduleProgram, and a fresh jit means a
# fresh XLA compile — seconds locally, minutes over the axon tunnel (the
# reference recompiles in microseconds, context.rs:118-127).  But two
# schedules that are *isomorphic* — same node kernels in the same order with
# the same buffer wiring, all per-node differences living in params/state —
# trace to the IDENTICAL computation.  ``NodeProcessor.group_key`` is
# exactly that contract ("behaviorally identical given the same (params,
# state, inputs)"), so a schedule whose every node has a non-None group_key
# gets a canonical signature, and programs with equal signatures SHARE their
# compiled packed-path executables + packers.  Editing a graph back to a
# previously-seen shape (add voice, remove it, re-add it — the egui-editor
# pattern) then installs in milliseconds: the "schedule-shape bucketing"
# compile cache from VERDICT r2 item 1.
#
# The packed hot path makes this possible by keying its pytrees CANONICALLY
# (schedule position, "n0017") instead of by NodeID, so arena indices never
# leak into the traced structure; the public API (collect_params /
# state_dict / node_key indexing) stays NodeID-keyed and is translated at
# the render_packed boundary.  Unpacked paths (render_block/render_chunk —
# the BatchRenderer/mesh entries) keep per-program jits: they are not on the
# live-edit path.
_PROGRAM_CACHE: dict = {}
#: LRU bound.  Each cached donor pins its whole graph — processors, node
#: objects (incl. sampler clips / reverb IRs / FIR taps), packers, and
#: compiled executables — until evicted, because the shared jitted steps
#: close over the donor program.  16 covers any realistic editor shape
#: envelope; long-lived hosts cycling through many topologies can call
#: :func:`clear_program_cache` at scene boundaries.
_PROGRAM_CACHE_MAX = 16


def clear_program_cache() -> None:
    """Drop all shared compiled-program artifacts (mainly for tests and
    scene changes — releases every donor program the cache pins)."""
    _PROGRAM_CACHE.clear()


class ScheduleProgram:
    """A compiled schedule bound to node processors, lowered to JAX fns.

    Pure-functional contract::

        out, out_mask, state' = render_block(params, state, graph_in,
                                             in_mask, info)

    with ``graph_in: f32[num_graph_inputs, F]``, ``out: f32[num_graph_outputs, F]``.
    """

    def __init__(
        self,
        schedule: CompiledSchedule,
        processors: dict[NodeID, NodeProcessor],
        sample_rate: int,
        donate_state: bool = False,
        group_nodes: bool = True,
        share_compiled: bool = True,
        strip_masks: bool = False,
    ):
        """``group_nodes``: pool behaviorally-identical consecutive nodes
        into one vmapped trace (see :meth:`NodeProcessor.group_key`).  A
        128-emitter scene then traces ONE spatializer instead of 128 —
        program size and compile time shrink by the pool factor; outputs
        agree to ~1 ulp (vmap batches the same ops; fused transcendentals
        may round differently)."""
        # Buffer donation of the state pytree is a minor win (state is tiny
        # next to audio buffers) and is unsupported on some backends (e.g.
        # the axon TPU tunnel), so it is opt-in.
        self._donate = (1,) if donate_state else ()
        #: measurement-only ablation (see _flag_ops): constant-fold the
        #: silence-mask threading away; audio values are unchanged, output
        #: masks are meaningless.  Used by the PERF.md silence-cost A/B.
        self._strip_masks = bool(strip_masks)
        self.schedule = schedule
        self.sample_rate = int(sample_rate)
        self.max_block_frames = schedule.max_block_frames
        # Keyed copies for pytree plumbing.  Restricted to SCHEDULED nodes:
        # with dormancy pruning (graph.prune_dormant) the caller's
        # processor dict may hold activated-but-unscheduled nodes — their
        # state is parked host-side by GraphProcessor, not threaded
        # through the program.
        scheduled = {node_key(sn.id) for sn in schedule.schedule}
        self._procs: dict[str, NodeProcessor] = {
            node_key(nid): proc
            for nid, proc in processors.items()
            if node_key(nid) in scheduled
        }
        graph_in_node = schedule.schedule[0]
        graph_out_node = schedule.schedule[-1]
        self.num_graph_inputs = len(graph_in_node.output_buffers)
        self.num_graph_outputs = len(graph_out_node.input_buffers)
        self._group_nodes = bool(group_nodes)
        self._plan = self._build_plan(group_nodes)
        self._plan_ungrouped = (
            self._plan if not group_nodes else None
        )  # built lazily for the megakernel (see _render)

        # canonical (schedule-position) keys for the packed hot path; real
        # NodeID keys stay the public pytree vocabulary
        self._canon: dict[str, str] = {
            node_key(sn.id): f"n{i:04d}"
            for i, sn in enumerate(schedule.schedule)
        }
        self._canon_inv = {v: k for k, v in self._canon.items()}

        self._jit_block = _ResilientJit(
            functools.partial(self._render, self.max_block_frames),
            "render_block",
            donate_argnums=self._donate,
        )
        self._jit_chunk_cache: dict[int, Callable] = {}
        self._jit_partial_cache: dict[int, Callable] = {}
        # packed-path machinery (built lazily from example pytrees)
        self._param_packer = None
        self._state_packer = None
        self._jit_packed_cache: dict = {}

        #: canonical shape signature, or None when some node opts out of
        #: the behavioral-identity contract (group_key() is None)
        self.signature = self._compute_signature() if share_compiled else None
        if self.signature is not None:
            donor = _PROGRAM_CACHE.get(self.signature)
            if donor is not None:
                # adopt the donor's packed-path artifacts: every warmed
                # (frames, blocks) program and both packers are shared, so
                # re-entering a previously-compiled shape costs a dispatch,
                # not a compile.  Re-insert for LRU recency.
                self._param_packer = donor._param_packer
                self._state_packer = donor._state_packer
                self._jit_packed_cache = donor._jit_packed_cache
                _PROGRAM_CACHE.pop(self.signature, None)
                _PROGRAM_CACHE[self.signature] = donor
            else:
                if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
                    _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
                _PROGRAM_CACHE[self.signature] = self

    # -- canonical keying / signature ------------------------------------------
    def _to_canon(self, tree: dict) -> dict:
        return {self._canon[k]: v for k, v in tree.items()}

    def _to_real(self, tree: dict) -> dict:
        return {self._canon_inv[k]: v for k, v in tree.items()}

    def _compute_signature(self):
        """Canonical shape signature: node kernels in schedule order + the
        buffer wiring under first-use renumbering.  Two programs with equal
        signatures trace to identical computations over the canon-keyed
        packed pytrees (the ``signature_key`` behavioral-identity
        contract; ``group_key`` additionally gates pooling)."""
        renum: dict[int, int] = {}

        def canon_buf(b: int) -> int:
            if b not in renum:
                renum[b] = len(renum)
            return renum[b]

        grenum: dict = {}

        def canon_group(gk):
            # pooling groups CONSECUTIVE nodes with EQUAL group_key values
            # (_pooling_plan), so the signature must capture the value-
            # equality classes — not just eligibility — or two programs
            # with different partitions (hence different packed layouts)
            # would alias in the donor compile cache.  First-use
            # renumbering keeps equal-structure programs cache-equal.
            if gk is None:
                return None
            if gk not in grenum:
                grenum[gk] = len(grenum)
            return grenum[gk]

        entries = []
        for sn in self.schedule.schedule:
            proc = self._procs.get(node_key(sn.id))
            if proc is None:
                entry = ("<sentinel>",)
            else:
                sk = proc.signature_key()
                if sk is None:
                    return None
                try:
                    # with pooling off the plan never reads group_key —
                    # don't let it fragment the cache
                    cg = (
                        canon_group(proc.group_key())
                        if self._group_nodes
                        else None
                    )
                except TypeError:  # unhashable group_key opts the program out
                    return None
                entry = (
                    type(proc).__name__,
                    proc.num_inputs,
                    proc.num_outputs,
                    proc.sample_rate,
                    proc.max_block_frames,
                    sk,
                    cg,
                )
            ins = tuple(
                ("clear",)
                if ib.should_clear
                else ("buf", canon_buf(ib.buffer_index))
                for ib in sn.input_buffers
            )
            outs = tuple(canon_buf(ob.buffer_index) for ob in sn.output_buffers)
            entries.append((entry, ins, outs))
        sig = (
            self.max_block_frames,
            self.sample_rate,
            bool(self._donate),
            self._group_nodes,
            self._strip_masks,
            tuple(entries),
        )
        try:
            hash(sig)
        except TypeError:  # an unhashable group_key opts the program out
            return None
        return sig

    # -- state / params ------------------------------------------------------
    def init_state(self) -> dict[str, Any]:
        state = {key: proc.init_state() for key, proc in self._procs.items()}
        if self._donate:
            # XLA dedups identical constants (two nodes' jnp.zeros share ONE
            # buffer); donating aliased buffers twice is an error — de-alias
            state = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
        return state

    def collect_params(
        self,
        blocks: float = 1,
        start_sample: int | None = None,
        frames: int | None = None,
        consume: bool = True,
    ) -> dict[str, Any]:
        """Host-side param snapshot for the next dispatch (the lock-free
        param channel; volume.rs:92's atomic load analog).

        ``blocks``: how many blocks the upcoming dispatch renders — host-side
        prefetchers (the streaming sampler's window) advance their shadow
        clocks by it.  Processors opt in by accepting a ``blocks`` kwarg.

        ``start_sample``: the dispatch window's first absolute sample.
        When given, timeline-capable processors (``collect_timeline``)
        return :class:`PerBlock` leaves covering the window — scheduled
        param changes land on their exact block.  ``consume=False`` is the
        side-effect-free variant for warmup compiles: prefetchers don't
        advance, scheduled sets aren't consumed, and timeline leaves come
        back as constant vectors (same traced structure as the hot path).
        """
        out = {}
        f = self.max_block_frames if frames is None else int(frames)
        k = max(1, int(np.ceil(blocks)))
        for key, proc in self._procs.items():
            if getattr(proc, "collect_timeline", False):
                out[key] = proc.collect_params(
                    blocks=k,
                    start_sample=start_sample,
                    frames=f,
                    consume=consume,
                )
            elif getattr(proc, "collect_accepts_blocks", False):
                out[key] = proc.collect_params(
                    blocks=blocks if consume else 0
                )
            else:
                out[key] = proc.collect_params()
        return out

    # -- node pooling ----------------------------------------------------------
    def _build_plan(self, group_nodes: bool):
        """Partition the interior schedule into singles and vmappable groups.

        A group is a run of consecutive entries whose processors share a
        grouping signature and with no data dependency inside the run (a
        member never consumes a buffer another member produced).
        """
        interior = self.schedule.schedule[1:-1]
        plan: list[tuple[str, list]] = []
        i = 0
        while i < len(interior):
            sn = interior[i]
            proc = self._procs[node_key(sn.id)]
            gk = proc.group_key() if group_nodes else None
            if gk is None:
                plan.append(("single", [sn]))
                i += 1
                continue
            sig = (
                type(proc).__name__,
                proc.num_inputs,
                proc.num_outputs,
                proc.sample_rate,
                proc.max_block_frames,
                gk,
            )
            members = [sn]
            produced = {ob.buffer_index for ob in sn.output_buffers}
            j = i + 1
            while j < len(interior):
                cand = interior[j]
                cproc = self._procs[node_key(cand.id)]
                cgk = cproc.group_key()
                if cgk is None:
                    break
                csig = (
                    type(cproc).__name__,
                    cproc.num_inputs,
                    cproc.num_outputs,
                    cproc.sample_rate,
                    cproc.max_block_frames,
                    cgk,
                )
                if csig != sig:
                    break
                if any(
                    (not ib.should_clear) and ib.buffer_index in produced
                    for ib in cand.input_buffers
                ):
                    break  # intra-group dependency
                members.append(cand)
                produced.update(ob.buffer_index for ob in cand.output_buffers)
                j += 1
            plan.append(("group" if len(members) > 1 else "single", members))
            i = j
        return plan

    # -- tracing -------------------------------------------------------------
    def _flag_ops(self, pad_empty: bool):
        """Per-buffer silence-flag representation: plain bools on the XLA
        path, f32 0/1 scalars in Mosaic-safe (``pad_empty``) traces — see
        the :meth:`_render` docstring for the probed Mosaic rules.

        ``strip_masks`` (measurement ablation): every stored flag becomes
        the not-silent constant, so XLA constant-folds the entire mask
        threading out of the program — the A/B that bounds what silence
        semantics cost the fused executable (docs/PERF.md)."""
        if self._strip_masks:
            const = jnp.float32(0.0) if pad_empty else jnp.asarray(False)

            def flag_store(_):
                return const

            def flag_is_set(f):
                return f != jnp.float32(0.0) if pad_empty else f

            return flag_store, flag_is_set, const
        if pad_empty:
            from .core.node import flag_f32 as flag_store

            def flag_is_set(f):
                return f != jnp.float32(0.0)

            return flag_store, flag_is_set, jnp.float32(1.0)

        def flag_store(b):
            return b

        def flag_is_set(f):
            return f

        return flag_store, flag_is_set, jnp.asarray(True)

    def plan_for(self, pad_empty: bool):
        """The execution plan: pooled groups on the XLA path; strictly
        ungrouped under Mosaic (member-vmap SIGABRTs the Mosaic compiler)."""
        if pad_empty:
            if self._plan_ungrouped is None:
                self._plan_ungrouped = self._build_plan(False)
            return self._plan_ungrouped
        return self._plan

    def _walk_segment(self, frames, plan, params, state, bufs, flags,
                      info: BlockInfo, pad_empty: bool, new_state: dict):
        """Execute plan entries in schedule order against explicit buffer/
        flag environments (mutated in place).  Factored out of
        :meth:`_render` so the hybrid megakernel
        (``executor_pallas.HybridMegaRenderer``) can run sub-schedule
        segments with live-in/live-out buffers as kernel operands."""
        flag_store, flag_is_set, _true_flag = self._flag_ops(pad_empty)
        zeros_row = jnp.zeros((frames,), jnp.float32)

        def gather_inputs(sn):
            in_rows, in_flags = [], []
            for ib in sn.input_buffers:
                if ib.should_clear:
                    # Unconnected input: cleared + silent (schedule.rs:310-313).
                    in_rows.append(zeros_row)
                    in_flags.append(_true_flag)
                else:
                    in_rows.append(bufs[ib.buffer_index])
                    in_flags.append(flags[ib.buffer_index])
            if not in_rows and pad_empty:
                return zeros_row[None, :], jnp.ones((1,), bool)
            inputs = (
                jnp.stack(in_rows)
                if in_rows
                else jnp.zeros((0, frames), jnp.float32)
            )
            if pad_empty:
                # f32 stack + compare: a natural-layout i1 Mosaic accepts
                mask = (
                    flag_is_set(jnp.stack(in_flags))
                    if in_flags
                    else jnp.zeros((0,), bool)
                )
            else:
                mask = (
                    jnp.stack(in_flags) if in_flags else jnp.zeros((0,), bool)
                )
            return inputs, mask

        def scatter_outputs(sn, outputs, out_mask):
            for j, ob in enumerate(sn.output_buffers):
                bufs[ob.buffer_index] = outputs[j]
                flags[ob.buffer_index] = flag_store(out_mask[j])

        for kind, members in plan:
            if kind == "single":
                sn = members[0]
                key = node_key(sn.id)
                proc = self._procs[key]
                inputs, mask = gather_inputs(sn)
                outputs, st, out_mask = proc.kernel(
                    params[key], state[key], inputs, mask, info
                )
                new_state[key] = st
                scatter_outputs(sn, outputs, out_mask)
                continue

            keys = [node_key(sn.id) for sn in members]
            proc0 = self._procs[keys[0]]
            gathered = [gather_inputs(sn) for sn in members]
            inputs_g = jnp.stack([g[0] for g in gathered])
            mask_g = jnp.stack([g[1] for g in gathered])
            params_g = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[params[k] for k in keys],
            )
            state_g = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[state[k] for k in keys],
            )
            outs_g, st_g, om_g = jax.vmap(
                proc0.kernel, in_axes=(0, 0, 0, 0, None)
            )(params_g, state_g, inputs_g, mask_g, info)
            for j, (sn, key) in enumerate(zip(members, keys)):
                new_state[key] = jax.tree.map(lambda x: x[j], st_g)
                scatter_outputs(sn, outs_g[j], om_g[j])

    def _render(self, frames: int, params, state, graph_in, in_mask,
                info: BlockInfo, pad_empty: bool = False):
        """Trace one block through the schedule (schedule.rs:289-343).

        ``pad_empty``: Mosaic-safe tracing mode for the Pallas megakernel.
        Two Mosaic limits shape it (probed on v5e, jax 0.9):

        * zero-size arrays feeding ops fail MLIR typing — zero-row input
          stacks (source nodes) pad to one dead zero row.  Node kernels key
          behavior off their declared port counts, never off
          ``inputs.shape[0]``, so the extra silent row is inert.
        * i1 vectors built by stacking *replicated* boolean scalars need an
          ``i1->i32`` vreg relayout Mosaic rejects ("Invalid vector
          register cast") — so silence flags ride between nodes as f32 0/1
          scalars; kernel-input masks are rebuilt with a ``!= 0`` compare
          (a natural-layout i1, which Mosaic supports), and the graph-out
          mask returns as an f32 0/1 vector instead of bool.
        * node pooling's member-vmap SIGABRTs the Mosaic compiler — the
          megakernel traces the ungrouped plan (pooling only shrinks
          compile time; outputs are equivalent).
        """
        sched = self.schedule.schedule
        bufs: dict[int, jnp.ndarray] = {}
        flags: dict[int, jnp.ndarray] = {}
        new_state: dict[str, Any] = {}

        flag_store, flag_is_set, _true_flag = self._flag_ops(pad_empty)

        # Graph inputs (prepare_graph_inputs, schedule.rs:213-253).
        for i, ob in enumerate(sched[0].output_buffers):
            bufs[ob.buffer_index] = graph_in[i]
            flags[ob.buffer_index] = flag_store(in_mask[i])
        key0 = node_key(sched[0].id)
        if key0 in self._procs:
            new_state[key0] = state[key0]

        zeros_row = jnp.zeros((frames,), jnp.float32)

        # Interior nodes, in schedule order (identical pools vmapped).
        self._walk_segment(
            frames, self.plan_for(pad_empty), params, state, bufs, flags,
            info, pad_empty, new_state,
        )

        # Graph outputs (read_graph_outputs, schedule.rs:255-287): flagged
        # channels read as zero, exactly like interleave-with-mask.
        out_rows, out_flags = [], []
        for ib in sched[-1].input_buffers:
            if ib.should_clear:
                out_rows.append(zeros_row)
                out_flags.append(_true_flag)
            else:
                row, f = bufs[ib.buffer_index], flags[ib.buffer_index]
                out_rows.append(
                    jnp.where(flag_is_set(f), jnp.zeros_like(row), row)
                )
                out_flags.append(f)
        key_out = node_key(sched[-1].id)
        if key_out in self._procs:
            new_state[key_out] = state[key_out]

        out = (
            jnp.stack(out_rows)
            if out_rows
            else jnp.zeros((0, frames), jnp.float32)
        )
        if pad_empty:
            # mosaic mode: the mask returns as f32 0/1 (the caller — the
            # megakernel — compares != 0 outside the kernel)
            out_mask = (
                jnp.stack(out_flags)
                if out_flags
                else jnp.zeros((0,), jnp.float32)
            )
        else:
            out_mask = (
                jnp.stack(out_flags) if out_flags else jnp.zeros((0,), bool)
            )
        return out, out_mask, new_state

    # -- packed render path ----------------------------------------------------
    # Dispatching hundreds of per-node scalar leaves as separate jit args
    # costs per-argument marshaling that dominates on remote transports
    # (~2 ms/arg over the axon tunnel).  The packed path moves O(4) stacked
    # arrays per dispatch instead and keeps recurrent state packed between
    # calls (see packing.py).  This is the streaming processor's hot path.

    def _ensure_packers(self, params_example, state_example):
        if self._param_packer is None:
            from .packing import Packer

            self._param_packer = Packer(params_example)
            self._state_packer = Packer(state_example)

    def pack_state(self, state):
        """→ opaque packed state (keep between packed render calls).

        ``state`` is NodeID-keyed (the public vocabulary); the packed
        representation is canon-keyed so isomorphic schedules share
        compiled programs (see the program-cache note above).  Keys for
        nodes outside the schedule (dormancy-pruned) are ignored — the
        GraphProcessor parks that state host-side."""
        canon = self._to_canon(
            {k: v for k, v in state.items() if k in self._canon}
        )
        # structure-only snapshot — prefetching processors (the streaming
        # sampler) must not advance their shadow clocks here and no
        # scheduled command may be consumed; consume=False is the
        # side-effect-free protocol for BOTH collect flavors (blocks=0
        # alone is not enough: the timeline path floors blocks to 1);
        # timeline leaves reduce to their placeholder for the packer
        example = _split_timelines(
            self._to_canon(self.collect_params(blocks=0, consume=False))
        )[0]
        self._ensure_packers(example, canon)
        return self._state_packer.pack(canon)

    def unpack_state(self, packed_state):
        return self._to_real(self._state_packer.unpack(*packed_state))

    def _packed_fn(self, frames: int, blocks: int):
        """Jitted packed step: ``blocks`` blocks of size ``frames``."""
        key = (frames, blocks)
        fn = self._jit_packed_cache.get(key)
        if fn is not None:
            return fn
        ppack, spack = self._param_packer, self._state_packer
        sr = float(self.sample_rate)

        def stepped(
            pgroups, ppass, timelines, sgroups, spass, gi, im, start_sample, status
        ):
            # canon-keyed on the wire; the owner's NodeID keys inside the
            # trace (a zero-op pytree re-keying)
            canon_params = ppack.unpack(pgroups, ppass)
            state = self._to_real(spack.unpack(sgroups, spass))
            if blocks == 1:
                params = self._to_real(canon_params)
                info = BlockInfo(
                    stream_time_secs=stream_time_from_sample(start_sample, sr),
                    stream_sample=start_sample,
                    stream_status=status,
                )
                out, om, state = self._render(
                    frames, params, state, gi, im, info
                )
                outs, oms = out[None], om[None]
            else:
                # clocks vectorized outside the scan (see chunk_fn: uint32
                # bit-ops in the body pessimize TPU loop compilation)
                samples = start_sample + jnp.uint32(frames) * jnp.arange(
                    blocks, dtype=jnp.uint32
                )
                times = stream_time_from_sample(samples, sr)

                def body(st, xs):
                    gi_k, im_k, sample, t, tl_k = xs
                    p = canon_params
                    if tl_k:
                        # splice this block's timeline values over their
                        # placeholders (indices share the canon flatten
                        # order both sides of the jit)
                        leaves, tdef = jax.tree.flatten(p)
                        for i, v in tl_k.items():
                            leaves[i] = v
                        p = jax.tree.unflatten(tdef, leaves)
                    info = BlockInfo(
                        stream_time_secs=t,
                        stream_sample=sample,
                        stream_status=status,
                    )
                    out, om, st = self._render(
                        frames, self._to_real(p), st, gi_k, im_k, info
                    )
                    return st, (out, om)

                state, (outs, oms) = jax.lax.scan(
                    body, state, (gi, im, samples, times, timelines)
                )
            sg, sp = spack.repack_traced(self._to_canon(state))
            return outs, oms, sg, sp

        fn = _ResilientJit(stepped, f"stepped{frames}x{blocks}")
        self._jit_packed_cache[key] = fn
        return fn

    def render_packed(
        self,
        params,
        packed_state,
        graph_in,
        in_mask,
        start_sample,
        status=0,
        frames: int | None = None,
        blocks: int = 1,
    ):
        """Packed-path render: ``blocks`` blocks in one dispatch.

        ``graph_in``: ``[Ni, frames]`` when blocks == 1, else
        ``[blocks, Ni, frames]``.  Returns ``(outs [blocks, No, frames],
        out_masks [blocks, No], packed_state')``.
        """
        frames = self.max_block_frames if frames is None else frames
        if self._param_packer is None:
            raise RuntimeError("call pack_state() before render_packed()")
        canon, timelines = _split_timelines(self._to_canon(params))
        if blocks == 1:
            timelines = {}  # the placeholder already IS block 0's value
        else:
            for i, v in timelines.items():
                assert v.shape[0] == blocks, (
                    f"timeline leaf {i}: {v.shape[0]} entries for a "
                    f"{blocks}-block dispatch"
                )
        pgroups, ppass = self._param_packer.pack(canon)
        sgroups, spass = packed_state
        fn = self._packed_fn(frames, blocks)
        outs, oms, sg, sp = fn(
            pgroups,
            ppass,
            timelines,
            sgroups,
            spass,
            jnp.asarray(graph_in),
            jnp.asarray(in_mask),
            wrap_stream_sample(start_sample),
            jnp.asarray(status, jnp.uint32),
        )
        return outs, oms, (sg, sp)

    def warmup(self, params, state) -> None:
        """Compile the block renderer by executing one throwaway block.

        Rendering is pure, so executing with the current state and silent
        inputs and *discarding* the results advances nothing.  (A plain
        ``lower().compile()`` is not enough: some backends — e.g. the axon
        TPU tunnel — defer the real device compile to first execution.)
        """
        gi = jnp.zeros((self.num_graph_inputs, self.max_block_frames), jnp.float32)
        im = jnp.zeros((self.num_graph_inputs,), bool)
        info = BlockInfo.make()
        if self._donate:
            # the block program donates its state argument — warm up on a
            # copy so the caller's state survives the throwaway render
            state = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
        out, _, _ = self._jit_block(params, state, gi, im, info)
        jax.block_until_ready(out)

    # -- public render entry points ------------------------------------------
    @property
    def render_fn(self):
        """Unjitted pure fn ``(params, state, graph_in, in_mask, info)`` —
        compose with vmap/shard_map/scan as needed."""
        return functools.partial(self._render, self.max_block_frames)

    def render_block(self, params, state, graph_in, in_mask, info: BlockInfo):
        """Jitted single-block render (donates ``state``)."""
        return self._jit_block(params, state, graph_in, in_mask, info)

    def render_partial_block(self, frames: int, params, state, graph_in,
                             in_mask, info: BlockInfo):
        """Jitted render of a block shorter than ``max_block_frames`` (stream
        tails): a dedicated program per size so state advances by exactly
        ``frames``."""
        fn = self._jit_partial_cache.get(frames)
        if fn is None:
            fn = _ResilientJit(
                functools.partial(self._render, frames), f"partial{frames}"
            )
            self._jit_partial_cache[frames] = fn
        return fn(params, state, graph_in, in_mask, info)

    def chunk_fn(self, num_blocks: int):
        """Build ``(params, state, graph_in[K,Ni,F], in_mask[K,Ni],
        start_sample, status) -> (out[K,No,F], out_mask[K,No], state')``:
        K blocks chained via ``lax.scan``.  Stream time/sample advance per
        block exactly as the streaming clock would."""
        frames = self.max_block_frames
        render = self.render_fn
        sr = float(self.sample_rate)

        def chunk(params, state, graph_in, in_mask, start_sample, status):
            # Per-block clocks computed ONCE, vectorized, outside the scan
            # (uint32 bit-ops inside the scan body pessimize XLA's loop
            # compilation on TPU — measured 26x slower steady-state); the
            # body just reads its slice from xs.
            start = wrap_stream_sample(start_sample)
            k = graph_in.shape[0]
            samples = start + jnp.uint32(frames) * jnp.arange(k, dtype=jnp.uint32)
            times = stream_time_from_sample(samples, sr)

            def body(st, xs):
                gi, im, sample, t = xs
                info = BlockInfo(
                    stream_time_secs=t,
                    stream_sample=sample,
                    stream_status=status,
                )
                out, om, st = render(params, st, gi, im, info)
                return st, (out, om)

            state, (outs, masks) = jax.lax.scan(
                body, state, (graph_in, in_mask, samples, times)
            )
            return outs, masks, state

        return chunk

    def render_chunk(self, params, state, graph_in, in_mask, start_sample=0, status=0):
        """Jitted K-block scan render (K inferred from ``graph_in.shape[0]``)."""
        k = graph_in.shape[0]
        jitted = self._jit_chunk_cache.get(k)
        if jitted is None:
            jitted = _ResilientJit(
                self.chunk_fn(k), f"chunk{k}", donate_argnums=self._donate
            )
            self._jit_chunk_cache[k] = jitted
        return jitted(
            params,
            state,
            graph_in,
            in_mask,
            wrap_stream_sample(start_sample),
            jnp.asarray(status, jnp.uint32),
        )
