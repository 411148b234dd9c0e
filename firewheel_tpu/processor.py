"""The graph processor: the render-side executor with live schedule swaps.

Mirrors ``crates/firewheel-graph/src/processor.rs`` (``FirewheelProcessor``):
it owns the node processors and their recurrent state, receives compiled
schedules over a bounded channel, chunks stream buffers into blocks, and
ships retired schedules/processors back to the context thread so nothing is
deallocated on the render path (processor.rs:167-206, 251-263).

TPU twist: "processing a block" is dispatching the fused XLA program
(:class:`~firewheel_tpu.executor.ScheduleProgram`); node state is a pytree
dict that *migrates* across schedule swaps — surviving nodes keep their
state arrays (the ``ScheduleHeapData`` round-trip made functional), new
nodes get ``init_state()``, removed nodes' processors are returned for
deactivation off the hot path.
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp

from .channels import ChannelFull, MessageChannel
from .core.interleave import deinterleave, interleave, interleave_stereo
from .core.node import BlockInfo, NodeProcessor, StreamStatus
from .core.silence_mask import SilenceMask, mask_from_bools, mask_to_bools
from .executor import ScheduleProgram, node_key
from .graph.compiler import NodeID
from .graph.graph import SchedulePackage

log = logging.getLogger(__name__)

__all__ = [
    "ProcessorStatus",
    "ContextToProcessorMsg",
    "ProcessorToContextMsg",
    "GraphProcessor",
]


class ProcessorStatus(enum.Enum):
    """processor.rs:11-16."""

    OK = "ok"
    DROP_PROCESSOR = "drop_processor"


@dataclasses.dataclass
class _InflightChunk:
    """Device handles of one launched-but-unfetched chunk dispatch
    (:meth:`GraphProcessor.dispatch_interleaved`).  ``outs``/``oms`` are
    device arrays of shape [k, n_go, frames] / [k, n_go]; ``n_go`` is
    captured because a schedule swap may change the program's port count
    before the fetch."""

    outs: Any
    oms: Any
    k: int
    n_go: int


@dataclasses.dataclass
class ContextToProcessorMsg:
    """processor.rs:265-268: NewSchedule(package) | Stop."""

    new_schedule: Optional[SchedulePackage] = None
    stop: bool = False


@dataclasses.dataclass
class ProcessorToContextMsg:
    """processor.rs:270-277: ReturnSchedule(package) | Dropped{...}."""

    returned_schedule: Optional[SchedulePackage] = None
    dropped_nodes: Optional[dict[NodeID, NodeProcessor]] = None
    dropped_user_cx: Any = None
    is_dropped: bool = False


@dataclasses.dataclass
class _PendingSchedule:
    """A staged schedule compiling in the background while the old one
    keeps rendering (the deferred-install half of the live-edit story;
    the reference swaps next block because its compile is microseconds,
    context.rs:118-127 — ours is an XLA compile, so the swap waits until
    the incoming programs are executable)."""

    package: SchedulePackage
    program: ScheduleProgram
    #: processors added then removed while pending (deactivate via the
    #: returned package, never installed)
    extra_removed: list
    #: throwaway packed state used for warmup compiles
    packed_state: Any
    #: dispatch sizes still to compile, in install order (1 first so the
    #: swap can happen ASAP; larger chunk sizes keep warming after install)
    to_warm: list
    warmed: set


class GraphProcessor:
    """Render-side half of the engine (FirewheelProcessor analog)."""

    def __init__(
        self,
        from_ctx: MessageChannel,
        to_ctx: MessageChannel,
        num_stream_in_channels: int,
        num_stream_out_channels: int,
        sample_rate: int,
        max_block_frames: int,
        user_cx: Any = None,
        chunk_blocks: int = 1,
        deferred_swap: bool = False,
    ):
        """``chunk_blocks``: when > 1, runs of that many full blocks render
        as ONE device dispatch (``lax.scan``), amortizing dispatch overhead
        at the cost of message-polling/param granularity (the reference
        polls per block, processor.rs:214; chunking polls per chunk).
        Essential on high-RTT transports.

        ``deferred_swap``: stage incoming schedules instead of installing
        them immediately — the OLD schedule keeps rendering while the new
        one's programs compile (driven by :meth:`advance_pending`, one
        compile step per call), and the state-migrating swap happens only
        once the new size-1 program is executable.  The streaming backend
        turns this on; direct processor use keeps the reference's
        install-next-block semantics."""
        assert num_stream_in_channels <= 64
        assert num_stream_out_channels <= 64
        chunk_blocks = max(1, int(chunk_blocks))
        # dispatch sizes are powers of two; a non-pow2 setting would warm a
        # program the hot path never uses and silently disable chunking
        self.chunk_blocks = 1 << (chunk_blocks.bit_length() - 1)
        # Chunk sizes with compiled programs.  After warmup() has run,
        # dispatch never strays outside this set (zero mid-stream compiles);
        # without a warmup (direct GraphProcessor use) sizes compile lazily.
        self._warmed_sizes: set[int] = {1}
        self._strict_sizes = False
        self._from_ctx = from_ctx
        self._to_ctx = to_ctx
        self.num_stream_in_channels = num_stream_in_channels
        self.num_stream_out_channels = num_stream_out_channels
        self.sample_rate = int(sample_rate)
        self.max_block_frames = int(max_block_frames)
        self.user_cx = user_cx
        self.deferred_swap = bool(deferred_swap)
        self._warmup_full = False

        self._processors: dict[NodeID, NodeProcessor] = {}
        self._package: Optional[SchedulePackage] = None
        self._program: Optional[ScheduleProgram] = None
        self._pending: Optional[_PendingSchedule] = None
        #: frozen state of activated-but-unscheduled nodes (dormancy
        #: pruning) — revived when a recompile reschedules them
        self._parked_state: dict[str, Any] = {}
        #: last-seen device event-counter totals, keyed
        #: ``(node_key, event_name)`` — the poll_events() baseline
        self._event_totals: dict[tuple, np.ndarray] = {}
        # recurrent state lives PACKED between dispatches (see packing.py);
        # unpacked views are materialized on demand (migration, readback)
        self._packed_state = None
        self._running = True


    # -- message pump (processor.rs:167-206) ----------------------------------
    def poll_messages(self) -> None:
        while True:
            msg = self._from_ctx.pop()
            if msg is None:
                return
            if msg.stop:
                self._running = False
            elif msg.new_schedule is not None:
                self._install_schedule(msg.new_schedule)

    def _install_schedule(self, new_package: SchedulePackage) -> None:
        assert new_package.schedule.max_block_frames == self.max_block_frames
        if self._program is not None and self.deferred_swap:
            self._stage_schedule(new_package)
        else:
            self._swap_schedule(new_package)

    def _swap_schedule(
        self,
        new_package: SchedulePackage,
        program: Optional[ScheduleProgram] = None,
        warmed: Optional[set] = None,
        extra_removed: tuple = (),
    ) -> None:
        old_package = self._package
        state = self.state_dict()  # unpack surviving state for migration

        # Retire removed nodes: processors go back for deactivation
        # (processor.rs:176-193); their state is dropped.
        if old_package is not None:
            for node_id in new_package.nodes_to_remove:
                proc = self._processors.pop(node_id, None)
                if proc is not None:
                    old_package.removed_node_processors.append((node_id, proc))
                state.pop(node_key(node_id), None)
            old_package.removed_node_processors.extend(extra_removed)
            try:
                self._to_ctx.push(
                    ProcessorToContextMsg(returned_schedule=old_package)
                )
            except ChannelFull:  # pragma: no cover
                log.error("processor→context channel full; dropping schedule")

        # Install new processors + init their state.
        for node_id, proc in new_package.new_node_processors:
            assert node_id not in self._processors
            self._processors[node_id] = proc
            state[node_key(node_id)] = proc.init_state()
        new_package.new_node_processors = []

        if warmed is None:
            self._warmed_sizes = {1}
            self._strict_sizes = False
        else:
            # deferred install: only compiled sizes are dispatchable — the
            # hot path floors its chunk size into this set, so a not-yet
            # warmed chunk program degrades throughput, never stalls
            self._warmed_sizes = {1} | warmed
            self._strict_sizes = True
        self._package = new_package
        self._program = program or ScheduleProgram(
            new_package.schedule, self._processors, self.sample_rate
        )
        # Split surviving state: scheduled nodes ride the packed hot path;
        # activated-but-unscheduled nodes (dormancy pruning,
        # graph.prune_dormant) PARK host-side and resume frozen when a
        # recompile brings them back; removed nodes drop entirely.
        live = {node_key(nid) for nid in self._processors}
        sched = {node_key(sn.id) for sn in new_package.schedule.schedule}
        for k in list(state):
            if k not in live:
                state.pop(k)
                self._parked_state.pop(k, None)
            elif k not in sched:
                self._parked_state[k] = state.pop(k)
        for k in sched & set(self._parked_state):
            state.setdefault(k, self._parked_state.pop(k))
        # drop event baselines of removed nodes — a later node reusing the
        # arena id starts its counters at 0, and a stale baseline would
        # wrap into a bogus huge delta on the first poll
        self._event_totals = {
            kn: v for kn, v in self._event_totals.items() if kn[0] in live
        }
        self._packed_state = self._program.pack_state(state)

    # -- deferred install (live-edit path) -------------------------------------
    def _stage_schedule(self, new_package: SchedulePackage) -> None:
        """Stage an incoming schedule: build its program (adopting cached
        executables when the shape was seen before) and queue its warmup;
        the old schedule keeps rendering until :meth:`advance_pending`
        finishes the size-1 compile."""
        extra_removed: list = []
        if self._pending is not None and self._pending.package is None:
            # the pending is only tail-warming an ALREADY-INSTALLED
            # program (package handed over at install) — there is nothing
            # to merge; just stop warming the superseded chunk sizes
            self._pending = None
        if self._pending is not None:
            # merge: the superseded pending was never installed, so its
            # adds/removes fold into the new package relative to the LIVE
            # processor set
            prev = self._pending.package
            extra_removed = self._pending.extra_removed
            dead = set(new_package.nodes_to_remove)
            merged_new = []
            for nid, proc in (
                prev.new_node_processors + new_package.new_node_processors
            ):
                if nid in dead:
                    extra_removed.append((nid, proc))
                else:
                    merged_new.append((nid, proc))
            removals = list(
                dict.fromkeys(
                    prev.nodes_to_remove + new_package.nodes_to_remove
                )
            )
            new_package.nodes_to_remove = removals
            new_package.new_node_processors = merged_new
            self._pending = None

        future = dict(self._processors)
        for nid in new_package.nodes_to_remove:
            future.pop(nid, None)
        future.update(dict(new_package.new_node_processors))

        program = ScheduleProgram(
            new_package.schedule, future, self.sample_rate
        )
        warm_state = program.pack_state(
            {node_key(nid): proc.init_state() for nid, proc in future.items()}
        )

        sizes = [1]
        k = 2
        while k <= self.chunk_blocks:
            if self._warmup_full or k == self.chunk_blocks:
                sizes.append(k)
            k *= 2
        self._pending = _PendingSchedule(
            package=new_package,
            program=program,
            extra_removed=extra_removed,
            packed_state=warm_state,
            to_warm=sizes,
            warmed=set(),
        )

    def has_pending(self) -> bool:
        return self._pending is not None

    def advance_pending(self, max_steps: int = 1) -> bool:
        """Compile up to ``max_steps`` programs of the staged schedule;
        install it (state-migrating swap) as soon as its size-1 program is
        executable.  Returns True while work remains.  Called between
        stream buffers — "background" compilation rides the single device
        thread (the axon hazard forbids a compile thread), so each step
        blocks for one compile, but the stream keeps serving the OLD
        schedule between steps and the swap itself is instant."""
        pend = self._pending
        if pend is None:
            return False
        f = self.max_block_frames
        n_gi = pend.program.num_graph_inputs
        for _ in range(max_steps):
            if not pend.to_warm:
                break
            k = pend.to_warm[0]
            if k == 1:
                gi = np.zeros((n_gi, f), np.float32)
                im = np.ones((n_gi,), bool)
            else:
                gi = np.zeros((k, n_gi, f), np.float32)
                im = np.ones((k, n_gi), bool)
            try:
                # rendering is pure: executing with throwaway state
                # compiles the program and advances nothing (consume=False:
                # no scheduled sets eaten, no prefetch clocks advanced)
                params = pend.program.collect_params(
                    blocks=k, start_sample=0, consume=False
                )
                pend.program.render_packed(
                    params, pend.packed_state, gi, im, 0, blocks=k
                )
            except Exception as e:  # pragma: no cover - backend-dependent
                log.error(
                    "pending-schedule compile failed (%s); keeping the "
                    "running schedule",
                    e,
                )
                # return the stale package so the context can reconcile
                self._swap_abandoned_pending()
                return False
            pend.to_warm.pop(0)
            pend.warmed.add(k)
            if pend.package is None:
                # tail-warming an already-installed program: the freshly
                # compiled chunk size becomes dispatchable immediately
                self._warmed_sizes.add(k)
                if not pend.to_warm:
                    self._pending = None
                    return False
            elif 1 in pend.warmed:
                # install at the earliest executable moment; remaining
                # chunk sizes keep compiling on later calls
                self._finalize_pending()
                pend = self._pending
                if pend is None:
                    return False
        return self._pending is not None

    def _finalize_pending(self) -> None:
        pend = self._pending
        assert pend is not None
        self._pending = None
        self._swap_schedule(
            pend.package,
            program=pend.program,
            warmed=set(pend.warmed),
            extra_removed=tuple(pend.extra_removed),
        )
        if pend.to_warm:
            # keep a tail-warming pending (package already installed)
            pend.package = None
            pend.extra_removed = []
            self._pending = pend

    def _swap_abandoned_pending(self) -> None:
        """A pending compile failed: drop it, handing its never-installed
        processors back for deactivation."""
        pend = self._pending
        self._pending = None
        if pend is None or pend.package is None:
            return
        try:
            self._to_ctx.push(
                ProcessorToContextMsg(
                    returned_schedule=SchedulePackage(
                        pend.package.schedule,
                        [],
                        [],
                        removed_node_processors=list(
                            pend.package.new_node_processors
                        )
                        + list(pend.extra_removed),
                    )
                )
            )
        except ChannelFull:  # pragma: no cover
            log.error("could not return abandoned pending schedule")

    def state_dict(self) -> dict:
        """Unpacked per-node state dict (for migration/checkpointing);
        the steady-state representation stays packed.  Includes parked
        (dormancy-pruned) nodes so checkpoints carry the whole graph."""
        if self._packed_state is None or self._program is None:
            return dict(self._parked_state)
        out = dict(self._parked_state)
        out.update(self._program.unpack_state(self._packed_state))
        return out

    def set_state_dict(self, state: dict) -> None:
        assert self._program is not None
        scheduled = set(self._program._procs)
        for k, v in state.items():
            if k not in scheduled and k in self._parked_state:
                self._parked_state[k] = v
        self._packed_state = self._program.pack_state(state)
        # restored state carries device-side sequence numbers a freshly
        # built node graph doesn't know about — let each processor adopt
        # them so no spurious command edge fires on the first block
        for nid, proc in self._processors.items():
            st = state.get(node_key(nid))
            if st is not None:
                proc.resync_from_state(st)
        # restored counters carry their pre-checkpoint totals; re-baseline
        # so the next poll_events() reports only NEW events, not a stale
        # burst of everything that happened before the checkpoint
        self._sync_event_baselines()

    def _host_state_snapshot(self) -> dict:
        """State dict for host-side reads (event polling): packed group
        arrays are fetched to host ONCE each and unpacked with numpy —
        no per-leaf device slice dispatches (the poll cost is a handful
        of small transfers however many nodes the graph has).
        Passthrough leaves (large device buffers) stay lazy."""
        if self._packed_state is None or self._program is None:
            return dict(self._parked_state)
        groups, passthrough = self._packed_state
        host_groups = {k: np.asarray(v) for k, v in groups.items()}
        out = dict(self._parked_state)
        out.update(
            self._program._to_real(
                self._program._state_packer.unpack(host_groups, passthrough)
            )
        )
        return out

    def _sync_event_baselines(self) -> None:
        """Set every event-counter baseline to the current device totals
        (without emitting events)."""
        state = None
        for nid, proc in self._processors.items():
            counters = proc.event_counters()
            if not counters:
                continue
            if state is None:
                state = self._host_state_snapshot()
            st = state.get(node_key(nid))
            if st is None:
                continue
            for name, leaf in counters.items():
                if leaf in st:
                    self._event_totals[(node_key(nid), name)] = (
                        np.atleast_1d(np.asarray(st[leaf])).astype(np.uint32)
                    )

    def poll_events(self):
        """Drain pending node events (``list[NodeEvent]``).

        Diffs each declared device event counter
        (:meth:`NodeProcessor.event_counters`) against its last-polled
        total and emits one :class:`~firewheel_tpu.core.events.NodeEvent`
        per active (node, event[, lane]) stream — the host half of the
        TPU-native notification design (``core/events.py``; the
        reference's TODO'd finish-notify, sampler.rs:496,513).  Poll at
        the game's frame rate; cost is a handful of scalar device
        fetches, zero render-path impact.  Counters migrate across live
        schedule swaps, so no event is lost over a topology edit."""
        from .core.events import NodeEvent, diff_counters

        out: list = []
        state = None
        for nid, proc in self._processors.items():
            counters = proc.event_counters()
            if not counters:
                continue
            if state is None:
                state = self._host_state_snapshot()
            st = state.get(node_key(nid))
            if st is None:
                continue
            for name, leaf in counters.items():
                if leaf not in st:
                    continue
                raw = np.asarray(st[leaf])
                scalar = raw.ndim == 0
                cur = np.atleast_1d(raw).astype(np.uint32)
                bkey = (node_key(nid), name)
                prev = self._event_totals.get(bkey)
                if prev is None or prev.shape != cur.shape:
                    prev = np.zeros_like(cur)
                delta = diff_counters(prev, cur)
                self._event_totals[bkey] = cur
                for lane in np.nonzero(delta)[0]:
                    out.append(
                        NodeEvent(
                            node_id=nid,
                            name=name,
                            count=int(delta[lane]),
                            total=int(cur[lane]),
                            lane=None if scalar else int(lane),
                        )
                    )
        return out

    def node_state(self, node_id: NodeID):
        """Host copy of a node's current recurrent state (e.g. for meter
        readback).  Returns None for unknown/stateless nodes."""
        import jax

        st = self.state_dict().get(node_key(node_id))
        if st is None:
            return None
        return jax.tree.map(lambda x: np.asarray(x), st)

    def warmup(self, full: bool = False) -> None:
        """Install any pending schedule and compile its programs so stream
        buffers don't stall on XLA compilation.

        Default: the 1-block and full-chunk programs (what a continuous
        stream dispatches).  ``full=True`` also compiles every power-of-two
        tail size — zero mid-stream compiles ever, at the cost of a longer
        activate (for strict-latency deployments)."""
        self._warmup_full = self._warmup_full or bool(full)
        self.poll_messages()
        # a staged schedule warms to completion here (warmup is the
        # blocking entry point — activation, tests)
        while self.advance_pending(max_steps=8):
            pass
        if self._program is not None:
            try:
                program = self._program
                n_gi = program.num_graph_inputs
                f = self.max_block_frames
                # results discarded — rendering is pure
                sizes = {1, self.chunk_blocks}
                if full:
                    k = 1
                    while k <= self.chunk_blocks:
                        sizes.add(k)
                        k *= 2
                for k in sorted(sizes):
                    if k == 1:
                        gi = np.zeros((n_gi, f), np.float32)
                        im = np.ones((n_gi,), bool)
                    else:
                        gi = np.zeros((k, n_gi, f), np.float32)
                        im = np.ones((k, n_gi), bool)
                    # side-effect-free collect WITH a start sample: the
                    # warmed trace must match the hot path's (timeline
                    # leaves present), without consuming scheduled sets or
                    # advancing prefetch clocks
                    params = program.collect_params(
                        blocks=k, start_sample=0, consume=False
                    )
                    program.render_packed(
                        params, self._packed_state, gi, im, 0, blocks=k
                    )
                    self._warmed_sizes.add(k)
                self._strict_sizes = True
            except Exception as e:  # pragma: no cover
                log.warning("warmup compile failed: %s", e)

    # -- hot path (processor.rs:61-165) ---------------------------------------
    def process_interleaved(
        self,
        input_buffer: np.ndarray,
        output_buffer: np.ndarray,
        num_in_channels: int,
        num_out_channels: int,
        frames: int,
        stream_time_secs: float,
        stream_status: StreamStatus = StreamStatus.NONE,
    ) -> ProcessorStatus:
        if not self._running:
            output_buffer[:] = 0.0
            return ProcessorStatus.DROP_PROCESSOR

        if self._program is None:
            self.poll_messages()
            if not self._running:
                output_buffer[:] = 0.0
                return ProcessorStatus.DROP_PROCESSOR

        if self._program is None or frames == 0:
            output_buffer[:] = 0.0
            return ProcessorStatus.OK

        assert input_buffer.size == frames * num_in_channels
        assert output_buffer.size == frames * num_out_channels

        program = self._program
        n_gi = program.num_graph_inputs
        n_go = program.num_graph_outputs

        frames_processed = 0
        while frames_processed < frames:
            self.poll_messages()
            if not self._running:
                output_buffer[frames_processed * num_out_channels :] = 0.0
                break
            program = self._program
            # A schedule swap can change the graph's port counts mid-buffer
            # (poll_messages above) — re-read them with the fresh program.
            n_gi = program.num_graph_inputs
            n_go = program.num_graph_outputs

            # Chunked fast path: K whole blocks in one dispatch.  K is
            # quantized to a power of two, then restricted to the warmed
            # program set so streams NEVER compile mid-buffer (warmup
            # compiles {1, chunk} by default, every power of two with
            # warmup_full=True).
            remaining_blocks = (frames - frames_processed) // self.max_block_frames
            k = 0
            if self.chunk_blocks > 1 and remaining_blocks >= 2:
                k = min(remaining_blocks, self.chunk_blocks)
                k = 1 << (k.bit_length() - 1)  # floor to power of two
                if self._strict_sizes:
                    while k > 1 and k not in self._warmed_sizes:
                        k //= 2
            if k > 1:
                frames_processed += self._process_chunk(
                    program,
                    input_buffer,
                    output_buffer,
                    num_in_channels,
                    num_out_channels,
                    frames_processed,
                    k,
                    stream_time_secs,
                    stream_status,
                )
                continue

            block = min(frames - frames_processed, self.max_block_frames)

            # prepare graph inputs: deinterleave + silence mask
            # (processor.rs:99-115 → schedule.rs:213)
            gi = np.zeros((n_gi, self.max_block_frames), np.float32)
            if n_gi > 0 and num_in_channels > 0:
                mask = deinterleave(
                    gi[:, :block],
                    input_buffer[
                        frames_processed * num_in_channels : (frames_processed + block)
                        * num_in_channels
                    ],
                    num_in_channels,
                    True,
                )
            else:
                mask = SilenceMask.new_all_silent(n_gi)
            im = mask_to_bools(mask, n_gi)

            sample = frames_processed + int(
                round(stream_time_secs * self.sample_rate)
            )
            # Packed path (see executor.render_packed): O(4) device buffers
            # per dispatch instead of O(nodes); blocks shorter than
            # max_block_frames get a dedicated program per size so state
            # advances by exactly `block` frames (processor.rs:95-158).
            outs, oms, self._packed_state = program.render_packed(
                program.collect_params(
                    blocks=block / self.max_block_frames,
                    start_sample=sample,
                    frames=block,
                ),
                self._packed_state,
                gi[:, :block],
                im,
                np.uint32(sample & 0xFFFFFFFF),
                status=np.uint32(int(stream_status)),
                frames=block,
                blocks=1,
            )
            out_np = np.asarray(outs)[0]
            om = np.asarray(oms)[0]

            out_mask = mask_from_bools(np.asarray(om))
            out_view = output_buffer[
                frames_processed * num_out_channels : (frames_processed + block)
                * num_out_channels
            ]
            if n_go == 2 and num_out_channels == 2:
                interleave_stereo(
                    out_np[0, :block], out_np[1, :block], out_view, out_mask
                )
            else:
                interleave(
                    out_np[:, :block], out_view, num_out_channels, out_mask
                )

            frames_processed += block

        return ProcessorStatus.OK if self._running else ProcessorStatus.DROP_PROCESSOR

    def _process_chunk(
        self,
        program,
        input_buffer,
        output_buffer,
        num_in_channels,
        num_out_channels,
        frames_processed,
        k,
        stream_time_secs,
        stream_status,
    ) -> int:
        """Render ``k`` full blocks in one ``lax.scan`` dispatch."""
        inflight = self._dispatch_chunk(
            program,
            input_buffer,
            num_in_channels,
            frames_processed,
            k,
            stream_time_secs,
            stream_status,
        )
        self._finish_chunk(
            inflight, output_buffer, num_out_channels, frames_processed
        )
        return k * self.max_block_frames

    def _dispatch_chunk(
        self,
        program,
        input_buffer,
        num_in_channels,
        frames_processed,
        k,
        stream_time_secs,
        stream_status,
    ) -> _InflightChunk:
        """Async half of :meth:`_process_chunk`: stage params, deinterleave
        graph inputs, and launch the ``k``-block dispatch.  Returns device
        handles WITHOUT synchronizing — the companion :meth:`_finish_chunk`
        fetches and interleaves, so a caller may overlap the device render
        (and the device→host transfer of the *previous* chunk) with host
        work.  ``self._packed_state`` advances to the in-flight handle
        immediately: later dispatches chain on it device-side."""
        f = self.max_block_frames
        n_gi = program.num_graph_inputs

        gi = np.zeros((k, n_gi, f), np.float32)
        im = np.ones((k, n_gi), bool)
        if n_gi > 0 and num_in_channels > 0:
            for b in range(k):
                off = frames_processed + b * f
                mask = deinterleave(
                    gi[b],
                    input_buffer[
                        off * num_in_channels : (off + f) * num_in_channels
                    ],
                    num_in_channels,
                    True,
                )
                im[b] = mask_to_bools(mask, n_gi)

        start_sample = frames_processed + int(
            round(stream_time_secs * self.sample_rate)
        )
        outs, oms, self._packed_state = program.render_packed(
            program.collect_params(blocks=k, start_sample=start_sample),
            self._packed_state,
            gi,
            im,
            np.uint32(start_sample & 0xFFFFFFFF),
            status=np.uint32(int(stream_status)),
            blocks=k,
        )
        return _InflightChunk(outs, oms, k, program.num_graph_outputs)

    def _finish_chunk(
        self,
        inflight: "_InflightChunk",
        output_buffer,
        num_out_channels,
        frames_processed: int = 0,
    ) -> None:
        """Sync half: fetch the chunk's device outputs (full arrays — see
        CLAUDE.md on slice fetches after chained dispatches) and interleave
        into ``output_buffer`` starting at ``frames_processed``."""
        f = self.max_block_frames
        n_go = inflight.n_go
        outs = np.asarray(inflight.outs)
        oms = np.asarray(inflight.oms)

        for b in range(inflight.k):
            off = frames_processed + b * f
            out_view = output_buffer[
                off * num_out_channels : (off + f) * num_out_channels
            ]
            out_mask = mask_from_bools(oms[b])
            if n_go == 2 and num_out_channels == 2:
                interleave_stereo(outs[b, 0], outs[b, 1], out_view, out_mask)
            else:
                interleave(outs[b], out_view, num_out_channels, out_mask)

    def dispatch_interleaved(
        self,
        input_buffer: np.ndarray,
        num_in_channels: int,
        frames: int,
        stream_time_secs: float,
        stream_status: StreamStatus = StreamStatus.NONE,
    ) -> Optional["_InflightChunk"]:
        """Pipelined render entry: launch ONE whole-chunk dispatch for
        ``frames`` and return an in-flight handle, or ``None`` when the
        span cannot ride a single warmed chunk program (odd sizes, chunking
        disabled, processor stopping) — the caller must then fall back to
        the synchronous :meth:`process_interleaved`.

        Motivation (round-4 soak): over a high-latency device link the
        synchronous path serializes [dispatch → sync → fetch] per chunk;
        fetching chunk *t* while *t+1* renders hides one of the two
        round-trips (docs/PERF.md "Pipelined offline pumping").  On a
        co-located host it still overlaps the host-side interleave with
        the device render.  Callers MUST eventually pass the handle to
        :meth:`finish_interleaved`, and must preserve sink ordering
        (finish every earlier handle before synchronous renders)."""
        if not self._running or self._program is None:
            return None
        self.poll_messages()
        if not self._running or self._program is None:
            return None
        program = self._program
        f = self.max_block_frames
        k = frames // f
        if k < 2 or k * f != frames or (k & (k - 1)) != 0:
            return None
        if self.chunk_blocks <= 1 or k > self.chunk_blocks:
            return None
        if self._strict_sizes and k not in self._warmed_sizes:
            return None
        return self._dispatch_chunk(
            program,
            input_buffer,
            num_in_channels,
            0,
            k,
            stream_time_secs,
            stream_status,
        )

    def finish_interleaved(
        self,
        inflight: "_InflightChunk",
        output_buffer: np.ndarray,
        num_out_channels: int,
    ) -> None:
        """Fetch + interleave a handle from :meth:`dispatch_interleaved`."""
        self._finish_chunk(inflight, output_buffer, num_out_channels, 0)

    # -- shutdown (processor.rs:251-263) --------------------------------------
    def drop(self) -> None:
        """Ship all node processors back to the context for deactivation."""
        nodes = dict(self._processors)
        if self._pending is not None and self._pending.package is not None:
            # never-installed pending processors still need deactivation
            nodes.update(dict(self._pending.package.new_node_processors))
            nodes.update(dict(self._pending.extra_removed))
        self._pending = None
        self._processors = {}
        try:
            self._to_ctx.push(
                ProcessorToContextMsg(
                    dropped_nodes=nodes,
                    dropped_user_cx=self.user_cx,
                    is_dropped=True,
                )
            )
        except ChannelFull:  # pragma: no cover
            log.error("could not return dropped nodes: channel full")
        self.user_cx = None

    @property
    def running(self) -> bool:
        return self._running
