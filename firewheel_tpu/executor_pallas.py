"""Pallas megakernel executor: the whole compiled schedule in one TPU kernel.

STATUS: **EXPERIMENTAL (demoted, round 5)**.  Measured across rounds 2–4
the XLA lowering (:class:`~firewheel_tpu.executor.ScheduleProgram` /
:class:`~firewheel_tpu.parallel.BatchRenderer`) beat this path at every
matched configuration outside the tunnel's drift envelope
(docs/PERF.md "Megakernel: demoted to experimental").  Kept in-tree for
its guarantees — provable VMEM residency across deep serial chains,
explicit scheduling control — not throughput; bit-exactness vs the XLA
executor stays CI-tested (tests/test_megakernel.py,
tests/test_hybrid_megakernel.py).

This was the north-star lowering (BASELINE.json): "the firewheel-graph
compiler's topological schedule lowers to a single fused XLA computation
that processes many 2^k-sample blocks (and many game instances) in parallel,
with firewheel-core node kernels implemented as Pallas kernels over
[batch, channels, block] buffers".

Where :class:`~firewheel_tpu.executor.ScheduleProgram` hands XLA the traced
schedule and trusts its fusion, the megakernel makes the locality explicit:

* the batch axis tiles over the Pallas **grid** — each program instance owns
  a ``TILE``-instance slice of every param/state leaf, resident in VMEM;
* the K-block loop runs **inside** the kernel (``fori_loop``), so recurrent
  state never round-trips HBM between blocks;
* the schedule walk itself is the same SSA unrolling as the XLA path —
  node kernels are pure jnp and trace inside the kernel body, vmapped over
  the tile.

Scope: :class:`MegaRenderer` (v1) takes whole graphs with no stream
inputs and only Mosaic-lowerable kernels (``supports_megakernel``).
:class:`HybridMegaRenderer` (round 3) lifts both limits: the schedule
partitions into megakernel *islands* (maximal runs of eligible nodes,
live buffers crossing the cut as kernel operands) chained with exact XLA
stages for the rest (FFT reverb, gather samplers/spatializers), and
stream-input graphs feed graph_in rows as the first segment's live-ins —
so the BASELINE effects-chain renders with its filter→echo→clip core in
a guaranteed-fusion Pallas island.

Booleans (masks, latches) are carried as int8 across the kernel boundary
(Mosaic's VMEM tiling does not take bool arrays) and cast back inside.

Status (round 2): **compiles and runs on real v5e hardware** and is
bit-exact against the XLA executor both in interpret mode and on-chip
(tests/test_megakernel.py; measured numbers in docs/PERF.md).  Reaching
Mosaic compatibility took a family of kernel-code rules, all probed
empirically on v5e / jax 0.9 and folded into the engine:

* no zero-size arrays feeding ops (``_render(pad_empty=True)`` pads
  source-node input stacks to one dead row);
* silence flags ride between nodes as f32 0/1 scalars — i1 vectors may
  only arise as natural-layout compares or select predicates (never from
  stacking/reshaping replicated bools, and never converted i1→numeric);
* wide value selects with scalar predicates become exact 0/1 multiply
  blends (``core.node.gate`` / ``flag_f32``; smoother values blend);
* iota must be integer (f32 ``arange`` becomes int iota + cast), negative
  indexing must be positive static (else CLIP-mode gather), and
  ``lax.associative_scan`` is replaced by the Hillis–Steele doubling scan
  (``ops.iir._hs_affine_scan`` — associative_scan's recursion emits
  zero-size strided slices);
* masks store as one 128-lane f32 row per block (tiny-lane dynamic-index
  stores need 128-multiple offsets);
* node pooling's member-vmap SIGABRTs the Mosaic compiler — the
  megakernel traces the ungrouped plan.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .core.node import BlockInfo, wrap_stream_sample
from .executor import ScheduleProgram

__all__ = [
    "supports_megakernel",
    "MegaRenderer",
    "HybridMegaRenderer",
    "partition_schedule",
]

# Eligibility is declared per processor class via the
# ``NodeProcessor.supports_megakernel`` attribute (True by default) so
# third-party nodes can opt out — in-tree opt-outs: FFT/conv kernels
# (reverb, FIR, binaural), gather samplers, mod-delay feedback mode
# (its sub-block scan emits per-step ys), and noise (threefry seeding
# rejects the tile-vmapped uint32 seed).  The round-3 verified-on-chip
# failures were reformulated in round 4 and now lower: mod-delay's
# fractional tap and pitch-shift's dual taps ride the 128-wide tiled
# rank-1 gather (``ops.gather.mosaic_gather_1d``; direct
# take_along_axis was a 3-D gather under the tile vmap, "Only 2D
# gather is supported"), and pitch's ring write is shift-left
# static-slice concat (ANY cursor-positioned vmapped
# dynamic_update_slice batches to scatter, which Mosaic can't lower).
# Both verified on the real chip 2026-08-19 at 0.0 parity vs the XLA
# executor, K=4 with state carry.  Mosaic also rejects ``lax.scan``
# with extensive outputs (per-step ys) — kernels that emit per-sample
# recurrences (dynamics, pink noise) ride ``ops.dynamics.sample_scan``,
# which re-emits the loop as iota-masked ``fori_loop`` writes under
# ``core.trace_mode.MOSAIC`` (verified on-chip: compressor→gate→limiter
# chain at 7e-9 parity vs XLA).


def supports_megakernel(program: ScheduleProgram) -> bool:
    if program.num_graph_inputs != 0:
        return False
    # read off the instance so both class- and instance-level opt-outs
    # (config-dependent kernels) are honored
    return all(
        getattr(p, "supports_megakernel", True)
        for p in program._procs.values()
    )


def _needs_unroll(program: ScheduleProgram) -> bool:
    """True when any node asks for a statically unrolled K-block loop
    (``megakernel_needs_unroll``) — see :class:`MegaRenderer`."""
    return any(
        getattr(p, "megakernel_needs_unroll", False)
        for p in program._procs.values()
    )


def _to_kernel_dtype(x):
    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        return x.astype(jnp.int8)
    return x


def _from_kernel_dtype(x, like):
    if like.dtype == jnp.bool_:
        return x.astype(jnp.bool_)
    return x


class MegaRenderer:
    """Batched K-block renderer backed by a single Pallas kernel.

    API parallels :class:`~firewheel_tpu.parallel.BatchRenderer`:
    ``render_chunk(params, state, start_sample)`` with batch-stacked
    params/state → ``(outs [B, K, No, F], out_masks [B, K, No], state')``.
    """

    def __init__(
        self,
        program: ScheduleProgram,
        batch: int,
        num_blocks: int,
        tile: int = 8,
        interpret: bool = False,
        unroll: bool | None = None,
    ):
        assert supports_megakernel(program), (
            "graph not eligible for the megakernel (stream inputs, reverb "
            "or sampler nodes) — use BatchRenderer"
        )
        assert batch % tile == 0, f"batch {batch} % tile {tile} != 0"
        self.program = program
        self.batch = batch
        self.num_blocks = num_blocks
        self.tile = tile
        self.interpret = interpret
        # unroll=None → auto: statically unroll the K-block loop when any
        # node requests it (pitch shift: its gather-heavy body compiles at
        # trip count 1 but SIGABRTs libtpu inside a real fori_loop —
        # probed 2026-08-19); static k also makes out_ref stores static.
        self.unroll = (
            _needs_unroll(program) if unroll is None else bool(unroll)
        )
        self._built = None

    # -- pytree plumbing -------------------------------------------------------
    def stack_params(self, params_list=None):
        if params_list is None:
            params_list = [self.program.collect_params()] * self.batch
        return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)

    def init_state(self):
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[self.program.init_state() for _ in range(self.batch)],
        )

    def _build(self, params, state):
        f = self.program.max_block_frames
        n_go = self.program.num_graph_outputs
        k_blocks = self.num_blocks
        tile = self.tile
        sr = float(self.program.sample_rate)
        program = self.program

        def render(p, s, gi, im, info):
            # pad_empty: Mosaic rejects zero-size arrays feeding ops —
            # source nodes trace with one dead zero input row instead
            return program._render(f, p, s, gi, im, info, pad_empty=True)

        p_leaves, p_def = jax.tree.flatten(params)
        s_leaves, s_def = jax.tree.flatten(state)
        n_p, n_s = len(p_leaves), len(s_leaves)

        p_templates = [jnp.asarray(x) for x in p_leaves]
        s_templates = [jnp.asarray(x) for x in s_leaves]
        # Mosaic requires rank >= 2 VMEM blocks: per-instance scalars [B]
        # ride as [B, 1] and are squeezed back inside the kernel.
        p_expand = [x.ndim == 1 for x in p_templates]
        s_expand = [x.ndim == 1 for x in s_templates]

        def lift(x):
            x = _to_kernel_dtype(x)
            return x[:, None] if x.ndim == 1 else x

        def kernel(start_ref, start_time_ref, *refs):
            # refs: n_p param refs, n_s state refs | outs, masks, n_s state'
            p_refs = refs[:n_p]
            s_refs = refs[n_p : n_p + n_s]
            out_ref = refs[n_p + n_s]
            mask_ref = refs[n_p + n_s + 1]
            s_out_refs = refs[n_p + n_s + 2 :]

            def read(r, t, expanded):
                v = r[...]
                if expanded:
                    v = v[:, 0]
                return _from_kernel_dtype(v, t)

            params_t = jax.tree.unflatten(
                p_def,
                [
                    read(r, t, e)
                    for r, t, e in zip(p_refs, p_templates, p_expand)
                ],
            )
            state0 = [
                read(r, t, e)
                for r, t, e in zip(s_refs, s_templates, s_expand)
            ]
            # ni == 0 for megakernel-eligible graphs; a 1-row zero buffer
            # keeps every in-kernel array non-empty (the graph_in loop
            # reads exactly ni rows, so the pad row is inert)
            gi = jnp.zeros((1, f), jnp.float32)
            im = jnp.ones((1,), bool)

            def one_instance(p, s, sample, t_secs):
                info = BlockInfo(
                    stream_time_secs=t_secs,
                    stream_sample=sample,
                    stream_status=jnp.zeros((), jnp.uint32),
                )
                out, om, s2 = render(p, jax.tree.unflatten(s_def, s), gi, im, info)
                return out, om, jax.tree.leaves(s2)

            def block_step(k, carry):
                s_leaves_cur = carry
                ku = jnp.asarray(k)  # traced int (fori) or static (unroll)
                sample = start_ref[0] + (ku * f).astype(jnp.uint32)
                t_secs = start_time_ref[0] + ku.astype(
                    jnp.float32
                ) * jnp.float32(f / sr)
                outs, oms, s_next = jax.vmap(
                    one_instance, in_axes=(0, 0, None, None)
                )(params_t, s_leaves_cur, sample, t_secs)
                out_ref[:, k] = outs
                # In mosaic mode the render returns the mask as f32 0/1
                # (pad_empty contract — i1 relayouts are unsupported); it
                # rides as one full 128-lane f32 row per block (tiny-lane
                # stores need 128-multiple dynamic offsets).  n_go <= 64 <
                # 128 always (MAX_PORTS).
                row = jnp.concatenate(
                    [oms, jnp.zeros((oms.shape[0], 128 - n_go), jnp.float32)],
                    axis=1,
                )
                mask_ref[:, k] = row
                return s_next

            carry = [jnp.asarray(s) for s in state0]
            if self.unroll:
                for k in range(k_blocks):
                    carry = block_step(k, carry)
                s_final = carry
            else:
                s_final = jax.lax.fori_loop(0, k_blocks, block_step, carry)
            for r, v, e in zip(s_out_refs, s_final, s_expand):
                v = _to_kernel_dtype(v)
                r[...] = v[:, None] if e else v

        grid = (self.batch // tile,)

        def leaf_spec(leaf):
            trailing = tuple(leaf.shape[1:]) if leaf.ndim > 1 else (1,)
            shape = (tile,) + trailing
            return pl.BlockSpec(
                shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1),
                memory_space=pl.ANY if self.interpret else pltpu.VMEM,
            )

        in_specs = [leaf_spec(x) for x in p_leaves] + [
            leaf_spec(x) for x in s_leaves
        ]
        out_specs = [
            pl.BlockSpec(
                (tile, k_blocks, n_go, f),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pl.ANY if self.interpret else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, k_blocks, 128),
                lambda i, *_: (i, 0, 0),
                memory_space=pl.ANY if self.interpret else pltpu.VMEM,
            ),
        ] + [leaf_spec(x) for x in s_leaves]

        def lifted_shape(x):
            shape = x.shape if x.ndim > 1 else (x.shape[0], 1)
            return jax.ShapeDtypeStruct(
                shape, jnp.int8 if x.dtype == jnp.bool_ else x.dtype
            )

        out_shapes = [
            jax.ShapeDtypeStruct(
                (self.batch, k_blocks, n_go, f), jnp.float32
            ),
            jax.ShapeDtypeStruct((self.batch, k_blocks, 128), jnp.float32),
        ] + [lifted_shape(x) for x in s_templates]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        )

        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=self.interpret,
        )

        def run(params, state, start_sample):
            from .ops.iir import mosaic_safe_scans

            pl_ = [lift(x) for x in jax.tree.leaves(params)]
            sl_ = [lift(x) for x in jax.tree.leaves(state)]
            from .core.node import stream_time_from_sample

            start = jnp.asarray([start_sample], jnp.uint32)
            # split-precision clock (core.node): a direct f32 cast of the
            # sample count quantizes past 2^25 samples (~12 min) and would
            # diverge from the XLA executor's stream_time_secs
            start_time = stream_time_from_sample(start, sr)
            # trace-time context: IIR scans emit their Mosaic-compilable
            # (Hillis-Steele) form only inside the megakernel; the XLA
            # executor keeps the cheaper associative_scan
            with mosaic_safe_scans():
                results = call(start, start_time, *pl_, *sl_)
            outs = results[0]
            masks = results[1][:, :, :n_go] != 0.0
            s_out = [
                _from_kernel_dtype(x[:, 0] if e else x, t)
                for x, t, e in zip(results[2:], s_templates, s_expand)
            ]
            return (
                outs,
                masks.astype(bool),
                jax.tree.unflatten(s_def, s_out),
            )

        return jax.jit(run)

    def render_chunk(self, params, state, start_sample=0):
        if self._built is None:
            self._built = self._build(params, state)
        return self._built(params, state, wrap_stream_sample(start_sample))


# ---------------------------------------------------------------------------
# Hybrid partition: megakernel islands between XLA stages
# ---------------------------------------------------------------------------
# Not every node family lowers through Mosaic (FFT reverb, gather-based
# samplers/spatializers), but a schedule is feed-forward dataflow — so any
# contiguous run of eligible nodes can run as a Pallas island with its
# *live* buffers (values crossing the cut) as kernel operands, while the
# ineligible nodes run as ordinary XLA scan stages around it.  K-block
# staging is exact: each segment's state is private to its own nodes, so
# rendering K blocks segment-by-segment produces the same values as full
# per-block interleaving.  This also subsumes stream-input graphs (VERDICT
# r2 item 4a): graph_in rows are just live-in buffers of the first segment.

from .executor import node_key  # noqa: E402


def _mosaic_eligible(proc) -> bool:
    return bool(getattr(proc, "supports_megakernel", True))


def partition_schedule(program: ScheduleProgram, min_island: int = 2):
    """Split the interior schedule into ``('mega'|'xla', [ScheduledNode])``
    segments: maximal runs of Mosaic-eligible nodes become islands;
    runs shorter than ``min_island`` fold into XLA (a one-node kernel
    launch isn't worth its VMEM round-trip)."""
    segs: list[tuple[str, list]] = []
    for sn in program.schedule.schedule[1:-1]:
        proc = program._procs[node_key(sn.id)]
        kind = "mega" if _mosaic_eligible(proc) else "xla"
        if segs and segs[-1][0] == kind:
            segs[-1][1].append(sn)
        else:
            segs.append((kind, [sn]))
    merged: list[tuple[str, list]] = []
    for kind, nodes in segs:
        if kind == "mega" and len(nodes) < min_island:
            kind = "xla"
        if merged and merged[-1][0] == kind:
            merged[-1][1].extend(nodes)
        else:
            merged.append((kind, nodes))
    return merged


def _live_sets(program: ScheduleProgram, segs):
    """Per-segment live-in / live-out buffer indices, respecting the
    allocator's buffer-index reuse (reaching definitions, in schedule
    order).  Segment -1 is graph_in; graph_out's reads extend the final
    writers' live-outs."""
    sched = program.schedule.schedule
    last_writer: dict[int, int] = {}
    live_in = [set() for _ in segs]
    live_out: dict[int, set] = {i: set() for i in range(-1, len(segs))}
    for ob in sched[0].output_buffers:
        last_writer[ob.buffer_index] = -1
    for i, (_, nodes) in enumerate(segs):
        for sn in nodes:
            for ib in sn.input_buffers:
                if ib.should_clear:
                    continue
                w = last_writer[ib.buffer_index]
                if w != i:
                    live_in[i].add(ib.buffer_index)
                    live_out[w].add(ib.buffer_index)
            for ob in sn.output_buffers:
                last_writer[ob.buffer_index] = i
    out_bufs = []
    for ib in sched[-1].input_buffers:
        if ib.should_clear:
            out_bufs.append(None)
            continue
        w = last_writer[ib.buffer_index]
        live_out[w].add(ib.buffer_index)
        out_bufs.append(ib.buffer_index)
    return (
        [sorted(s) for s in live_in],
        {i: sorted(s) for i, s in live_out.items()},
        out_bufs,
    )


class HybridMegaRenderer:
    """Batched K-block renderer that chains megakernel islands and XLA
    stages over one compiled schedule.

    The BASELINE effects-chain (sampler → filter → echo → clip → reverb)
    renders as XLA(sampler) → Pallas(filter·echo·clip) → XLA(reverb):
    the guaranteed-fusion path covers everything Mosaic can lower, and the
    rest keeps the XLA executor's exact semantics.  API mirrors
    :class:`MegaRenderer`; graphs with stream inputs are supported
    (``render_chunk(..., graph_in=[B,K,Ni,F], in_mask=[B,K,Ni])``).
    """

    def __init__(
        self,
        program: ScheduleProgram,
        batch: int,
        num_blocks: int,
        tile: int = 8,
        min_island: int = 2,
        interpret: bool = False,
        mesh=None,
        axis: str = "dp",
    ):
        """``mesh``/``axis``: shard the batch over a device mesh axis — the
        whole per-shard hybrid (XLA stages + Pallas islands) runs inside
        ``shard_map`` with zero collectives, exactly the BatchRenderer dp
        story but with the winning lowering."""
        self.program = program
        self.batch = batch
        self.num_blocks = num_blocks
        self.tile = tile
        self.interpret = interpret
        self.mesh = mesh
        self.axis = axis
        self._shards = int(mesh.shape[axis]) if mesh is not None else 1
        assert batch % self._shards == 0, (
            f"batch {batch} must divide over mesh axis {axis}={self._shards}"
        )
        assert (batch // self._shards) % tile == 0, (
            f"per-shard batch {batch // self._shards} % tile {tile} != 0"
        )
        # Mosaic constraint: 1-D param/state leaves lift to [B, 1], putting
        # the batch tile in the block's second-to-last dim — which must be
        # divisible by 8 or equal the (per-shard) array dim.  Interpret mode
        # does not enforce this, so check here rather than at first dispatch
        # on-chip.
        if not interpret and tile % 8 != 0 and tile != batch // self._shards:
            raise ValueError(
                f"tile={tile} is not lowerable on TPU: it must be a multiple "
                f"of 8 or equal to the per-shard batch "
                f"({batch // self._shards})"
            )
        self.segments = partition_schedule(program, min_island)
        self._live_in, self._live_out, self._out_bufs = _live_sets(
            program, self.segments
        )
        self._built = None

    # -- pytree plumbing (same conventions as MegaRenderer) -------------------
    def stack_params(self, params_list=None):
        if params_list is None:
            params_list = [self.program.collect_params()] * self.batch
        return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)

    def init_state(self):
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[self.program.init_state() for _ in range(self.batch)],
        )

    # -- per-segment executors -------------------------------------------------
    def _seg_keys(self, nodes):
        return [node_key(sn.id) for sn in nodes]

    def _xla_segment(self, seg_idx, nodes):
        """(params_seg, state_seg, env_rows [K,n_in,F], env_flags [K,n_in],
        samples [K], times [K]) -> (out_rows [K,n_out,F], out_flags,
        state_seg') for ONE instance; vmapped over batch by the driver."""
        program = self.program
        f = program.max_block_frames
        in_bufs = self._live_in[seg_idx]
        out_bufs = self._live_out[seg_idx]
        plan = [("single", [sn]) for sn in nodes]

        def run(params_seg, state_seg, env_rows, env_flags, samples, times):
            def body(st, xs):
                rows_k, flags_k, sample, t = xs
                bufs = {b: rows_k[j] for j, b in enumerate(in_bufs)}
                flags = {b: flags_k[j] for j, b in enumerate(in_bufs)}
                info = BlockInfo(
                    stream_time_secs=t,
                    stream_sample=sample,
                    stream_status=jnp.zeros((), jnp.uint32),
                )
                new_state: dict = {}
                program._walk_segment(
                    f, plan, params_seg, st, bufs, flags, info, False,
                    new_state,
                )
                outs = (
                    jnp.stack([bufs[b] for b in out_bufs])
                    if out_bufs
                    else jnp.zeros((0, f), jnp.float32)
                )
                oflags = (
                    jnp.stack([flags[b] for b in out_bufs])
                    if out_bufs
                    else jnp.zeros((0,), bool)
                )
                return new_state, (outs, oflags)

            state2, (out_rows, out_flags) = jax.lax.scan(
                body, state_seg, (env_rows, env_flags, samples, times)
            )
            return out_rows, out_flags, state2

        return run

    def _mega_segment(self, seg_idx, nodes, params_seg, state_seg, batch):
        """Pallas island: the segment's nodes walk inside one kernel, K
        blocks looped in VMEM, batch tiled over the grid.  Live-in rows/
        flags are kernel operands; live-outs and per-node state leave
        through VMEM outputs."""
        program = self.program
        f = program.max_block_frames
        k_blocks = self.num_blocks
        tile = self.tile
        sr = float(program.sample_rate)
        in_bufs = self._live_in[seg_idx]
        out_bufs = self._live_out[seg_idx]
        n_in = len(in_bufs)
        n_out = len(out_bufs)
        assert n_in <= 128 and n_out <= 128, "live cut exceeds flag lanes"
        plan = [("single", [sn]) for sn in nodes]
        keys = self._seg_keys(nodes)
        # per-island static unroll when any member node requests it
        # (see MegaRenderer.__init__)
        unroll_seg = any(
            getattr(program._procs[k], "megakernel_needs_unroll", False)
            for k in keys
        )

        p_leaves, p_def = jax.tree.flatten(params_seg)
        s_leaves, s_def = jax.tree.flatten(state_seg)
        n_p, n_s = len(p_leaves), len(s_leaves)
        p_templates = [jnp.asarray(x) for x in p_leaves]
        s_templates = [jnp.asarray(x) for x in s_leaves]
        p_expand = [x.ndim == 1 for x in p_templates]
        s_expand = [x.ndim == 1 for x in s_templates]

        def lift(x):
            x = _to_kernel_dtype(x)
            return x[:, None] if x.ndim == 1 else x

        def kernel(start_ref, start_time_ref, *refs):
            p_refs = refs[:n_p]
            s_refs = refs[n_p : n_p + n_s]
            env_ref = refs[n_p + n_s]          # [tile, K, max(n_in,1), F]
            envf_ref = refs[n_p + n_s + 1]     # [tile, K, 128] f32 0/1
            out_ref = refs[n_p + n_s + 2]      # [tile, K, max(n_out,1), F]
            outf_ref = refs[n_p + n_s + 3]     # [tile, K, 128] f32 0/1
            s_out_refs = refs[n_p + n_s + 4 :]

            def read(r, t, expanded):
                v = r[...]
                if expanded:
                    v = v[:, 0]
                return _from_kernel_dtype(v, t)

            params_t = jax.tree.unflatten(
                p_def,
                [
                    read(r, t, e)
                    for r, t, e in zip(p_refs, p_templates, p_expand)
                ],
            )
            state0 = [
                read(r, t, e)
                for r, t, e in zip(s_refs, s_templates, s_expand)
            ]

            def one_instance(p, s, rows, fl_row, sample, t_secs):
                # seed the env from the operand rows; flags ride as f32
                # scalars (the pad_empty contract)
                bufs = {b: rows[j] for j, b in enumerate(in_bufs)}
                flags = {b: fl_row[j] for j, b in enumerate(in_bufs)}
                info = BlockInfo(
                    stream_time_secs=t_secs,
                    stream_sample=sample,
                    stream_status=jnp.zeros((), jnp.uint32),
                )
                new_state: dict = {}
                program._walk_segment(
                    f, plan, p, jax.tree.unflatten(s_def, s), bufs, flags,
                    info, True, new_state,
                )
                outs = (
                    jnp.stack([bufs[b] for b in out_bufs])
                    if out_bufs
                    else jnp.zeros((1, f), jnp.float32)
                )
                oflags = jnp.stack(
                    [flags[b] for b in out_bufs] + [jnp.float32(0.0)] * (128 - n_out)
                )
                return outs, oflags, jax.tree.leaves(new_state)

            def block_step(k, carry):
                s_cur = carry
                ku = jnp.asarray(k)  # traced int (fori) or static (unroll)
                sample = start_ref[0] + (ku * f).astype(jnp.uint32)
                t_secs = start_time_ref[0] + ku.astype(
                    jnp.float32
                ) * jnp.float32(f / sr)
                rows = env_ref[:, k]
                fl = envf_ref[:, k]
                outs, oflags, s_next = jax.vmap(
                    one_instance, in_axes=(0, 0, 0, 0, None, None)
                )(params_t, s_cur, rows, fl, sample, t_secs)
                out_ref[:, k] = outs
                outf_ref[:, k] = oflags
                return s_next

            carry = [jnp.asarray(s) for s in state0]
            if unroll_seg:
                for k in range(k_blocks):
                    carry = block_step(k, carry)
                s_final = carry
            else:
                s_final = jax.lax.fori_loop(0, k_blocks, block_step, carry)
            for r, v, e in zip(s_out_refs, s_final, s_expand):
                v = _to_kernel_dtype(v)
                r[...] = v[:, None] if e else v

        grid = (batch // tile,)

        def leaf_spec(leaf):
            trailing = tuple(leaf.shape[1:]) if leaf.ndim > 1 else (1,)
            shape = (tile,) + trailing
            return pl.BlockSpec(
                shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1),
                memory_space=pl.ANY if self.interpret else pltpu.VMEM,
            )

        def big_spec(shape):
            return pl.BlockSpec(
                (tile,) + shape, lambda i, *_: (i,) + (0,) * len(shape),
                memory_space=pl.ANY if self.interpret else pltpu.VMEM,
            )

        in_specs = (
            [leaf_spec(x) for x in p_leaves]
            + [leaf_spec(x) for x in s_leaves]
            + [
                big_spec((k_blocks, max(n_in, 1), f)),
                big_spec((k_blocks, 128)),
            ]
        )
        out_specs = [
            big_spec((k_blocks, max(n_out, 1), f)),
            big_spec((k_blocks, 128)),
        ] + [leaf_spec(x) for x in s_leaves]

        def lifted_shape(x):
            shape = x.shape if x.ndim > 1 else (x.shape[0], 1)
            return jax.ShapeDtypeStruct(
                shape, jnp.int8 if x.dtype == jnp.bool_ else x.dtype
            )

        out_shapes = [
            jax.ShapeDtypeStruct(
                (batch, k_blocks, max(n_out, 1), f), jnp.float32
            ),
            jax.ShapeDtypeStruct((batch, k_blocks, 128), jnp.float32),
        ] + [lifted_shape(x) for x in s_templates]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=self.interpret,
        )

        def run(params_seg, state_seg, env_rows, env_flags, start, start_time):
            from .ops.iir import mosaic_safe_scans

            pl_ = [lift(x) for x in jax.tree.leaves(params_seg)]
            sl_ = [lift(x) for x in jax.tree.leaves(state_seg)]
            with mosaic_safe_scans():
                results = call(start, start_time, *pl_, *sl_, env_rows, env_flags)
            out_rows = results[0][:, :, :n_out] if n_out else results[0][:, :, :0]
            out_flags = results[1][:, :, :n_out] != 0.0
            s_out = [
                _from_kernel_dtype(x[:, 0] if e else x, t)
                for x, t, e in zip(results[2:], s_templates, s_expand)
            ]
            return out_rows, out_flags, jax.tree.unflatten(s_def, s_out)

        return run

    # -- driver ---------------------------------------------------------------
    def _build(self, params, state):
        program = self.program
        f = program.max_block_frames
        k_blocks = self.num_blocks
        sched = program.schedule.schedule
        n_gi = program.num_graph_inputs
        gi_bufs = [ob.buffer_index for ob in sched[0].output_buffers]
        seg_keys = [self._seg_keys(nodes) for _, nodes in self.segments]
        key0, key_out = node_key(sched[0].id), node_key(sched[-1].id)

        # pre-build mega callables OUTSIDE the jit (pallas_call objects);
        # under a mesh each shard runs the hybrid on its LOCAL batch slice
        lb = self.batch // self._shards
        mega_runs = {}
        for i, (kind, nodes) in enumerate(self.segments):
            if kind == "mega":
                pseg = {k: jax.tree.map(lambda x: x[0], params[k]) for k in seg_keys[i]}
                sseg = {k: jax.tree.map(lambda x: x[0], state[k]) for k in seg_keys[i]}
                pseg = jax.tree.map(lambda x: jnp.stack([x] * lb), pseg)
                sseg = jax.tree.map(lambda x: jnp.stack([x] * lb), sseg)
                mega_runs[i] = self._mega_segment(i, nodes, pseg, sseg, lb)

        sr = float(program.sample_rate)

        from .core.node import stream_time_from_sample

        def run(params, state, graph_in, in_mask, start_sample):
            start = wrap_stream_sample(start_sample)
            samples = start + jnp.uint32(f) * jnp.arange(
                k_blocks, dtype=jnp.uint32
            )
            # same split-precision clock as the XLA chunk path (chunk_fn)
            times = stream_time_from_sample(samples, sr)

            env: dict[int, Any] = {}     # buf -> [B, K, F]
            fenv: dict[int, Any] = {}    # buf -> [B, K] bool
            for j, b in enumerate(gi_bufs):
                env[b] = graph_in[:, :, j]
                fenv[b] = in_mask[:, :, j]

            new_state = {}
            if key0 in program._procs:
                new_state[key0] = state[key0]
            if key_out in program._procs:
                new_state[key_out] = state[key_out]

            for i, (kind, nodes) in enumerate(self.segments):
                in_bufs = self._live_in[i]
                out_bufs = self._live_out[i]
                pseg = {k: params[k] for k in seg_keys[i]}
                sseg = {k: state[k] for k in seg_keys[i]}
                if kind == "xla":
                    rows = (
                        jnp.stack([env[b] for b in in_bufs], axis=2)
                        if in_bufs
                        else jnp.zeros((lb, k_blocks, 0, f), jnp.float32)
                    )
                    flr = (
                        jnp.stack([fenv[b] for b in in_bufs], axis=2)
                        if in_bufs
                        else jnp.zeros((lb, k_blocks, 0), bool)
                    )
                    seg_fn = self._xla_segment(i, nodes)
                    out_rows, out_flags, s2 = jax.vmap(
                        seg_fn, in_axes=(0, 0, 0, 0, None, None)
                    )(pseg, sseg, rows, flr, samples, times)
                else:
                    rows = (
                        jnp.stack([env[b] for b in in_bufs], axis=2)
                        if in_bufs
                        else jnp.zeros((lb, k_blocks, 1, f), jnp.float32)
                    )
                    flr_narrow = (
                        jnp.stack(
                            [fenv[b].astype(jnp.float32) for b in in_bufs],
                            axis=2,
                        )
                        if in_bufs
                        else jnp.zeros((lb, k_blocks, 0), jnp.float32)
                    )
                    flr = jnp.concatenate(
                        [
                            flr_narrow,
                            jnp.zeros(
                                (lb, k_blocks, 128 - len(in_bufs)),
                                jnp.float32,
                            ),
                        ],
                        axis=2,
                    )
                    start_v = jnp.asarray([start_sample], jnp.uint32)
                    # same split-precision clock as the XLA segments of
                    # this very dispatch (times above)
                    start_t = stream_time_from_sample(start_v, sr)
                    out_rows, out_flags, s2 = mega_runs[i](
                        pseg, sseg, rows, flr, start_v, start_t
                    )
                for j, b in enumerate(out_bufs):
                    env[b] = out_rows[:, :, j] if kind == "mega" else out_rows[:, :, j]
                    fenv[b] = out_flags[:, :, j]
                new_state.update(s2)

            # graph outputs: flagged channels read as zero
            out_rows, out_flags = [], []
            for b in self._out_bufs:
                if b is None:
                    out_rows.append(
                        jnp.zeros((lb, k_blocks, f), jnp.float32)
                    )
                    out_flags.append(
                        jnp.ones((lb, k_blocks), bool)
                    )
                else:
                    row, fl = env[b], fenv[b]
                    out_rows.append(
                        jnp.where(fl[..., None], jnp.zeros_like(row), row)
                    )
                    out_flags.append(fl)
            out = (
                jnp.stack(out_rows, axis=2)
                if out_rows
                else jnp.zeros((lb, k_blocks, 0, f), jnp.float32)
            )
            om = (
                jnp.stack(out_flags, axis=2)
                if out_flags
                else jnp.zeros((lb, k_blocks, 0), bool)
            )
            return out, om, new_state

        if self.mesh is None:
            return jax.jit(run)
        from jax.sharding import PartitionSpec as P

        bspec = P(self.axis)
        smapped = jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(bspec, bspec, bspec, bspec, P()),
            out_specs=(bspec, bspec, bspec),
            check_vma=False,
        )
        return jax.jit(smapped)

    def render_chunk(self, params, state, graph_in=None, in_mask=None,
                     start_sample=0):
        n_gi = self.program.num_graph_inputs
        f = self.program.max_block_frames
        if graph_in is None:
            graph_in = jnp.zeros(
                (self.batch, self.num_blocks, n_gi, f), jnp.float32
            )
        if in_mask is None:
            in_mask = jnp.ones((self.batch, self.num_blocks, n_gi), bool)
        if self._built is None:
            self._built = self._build(params, state)
        return self._built(
            params, state, graph_in, in_mask,
            wrap_stream_sample(start_sample),
        )
