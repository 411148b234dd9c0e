"""Pallas megakernel executor: the whole compiled schedule in one TPU kernel.

This is the north-star lowering (BASELINE.json): "the firewheel-graph
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

Scope (v1): graphs with no stream inputs (source graphs — the benchmark
mixer qualifies) and nodes whose kernels avoid FFTs and data-dependent
gathers (reverb and the samplers stay on the XLA path; Mosaic cannot lower
them).  ``supports_megakernel(program)`` reports eligibility.

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

from .core.node import BlockInfo
from .executor import ScheduleProgram

__all__ = ["supports_megakernel", "MegaRenderer"]

# node kernels known to lower through Mosaic (no FFT, no dynamic gather)
_UNSUPPORTED_PROCS = (
    # conv_general_dilated / FFT / data-dependent gathers have no Mosaic
    # lowering inside this kernel; these nodes stay on the XLA executor
    "ConvolutionReverbProcessor",
    "FirFilterProcessor",
    "BinauralSpatializerProcessor",
    "SamplerProcessor",
    "StreamingSamplerProcessor",
)


def supports_megakernel(program: ScheduleProgram) -> bool:
    if program.num_graph_inputs != 0:
        return False
    return not any(
        type(p).__name__ in _UNSUPPORTED_PROCS
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
                sample = start_ref[0] + (k * f).astype(jnp.uint32)
                t_secs = start_time_ref[0] + k.astype(jnp.float32) * jnp.float32(
                    f / sr
                )
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

            s_final = jax.lax.fori_loop(
                0, k_blocks, block_step, [jnp.asarray(s) for s in state0]
            )
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
            start = jnp.asarray([start_sample], jnp.uint32)
            start_time = (
                jnp.asarray([start_sample], jnp.float32) / jnp.float32(sr)
            )
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
        return self._built(params, state, jnp.asarray(start_sample, jnp.uint32))
