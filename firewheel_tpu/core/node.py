"""The node abstraction: main-thread handles and pure compute kernels.

The reference splits a node into a main-thread half (``AudioNode``) and a
real-time half (``AudioNodeProcessor``) whose ``process`` mutates buffers in
place (``crates/firewheel-core/src/node.rs:6-53``).  The TPU-native design
keeps the same split, but the processor half is a *pure function*::

    kernel(params, state, inputs[ch, F], in_mask[ch], info) ->
        (outputs[ch, F], new_state, out_mask[ch])

* ``params``  — a pytree staged from the host every dispatch.  Changing a
  param never recompiles (it is an input), mirroring the reference's atomics
  (e.g. ``volume.rs:10``).
* ``state``   — a pytree of recurrent carries (phasors, filter taps,
  playheads), threaded through ``lax.scan`` across blocks.  This replaces
  the processor's ``&mut self``.
* ``in_mask``/``out_mask`` — traced silence-mask boolean vectors
  (``node.rs:94-118`` ``ProcInfo``).  On TPU masks are semantics, not a
  skip-work branch.

Kernels must be traceable (no data-dependent Python control flow), vmappable
(batching over graph instances) and scannable (block chaining).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = [
    "broadcast_flag",
    "flag_f32",
    "gate",
    "stream_time_from_sample",
    "StreamStatus",
    "AudioNodeInfo",
    "BlockInfo",
    "NodeProcessor",
    "AudioNode",
    "NodeActivationError",
    "MAX_PORTS",
]

# Hard engine constant: at most 64 ports per node, the silence-mask width
# (node.rs:62,69; silence_mask.rs:23-29).
MAX_PORTS = 64


class StreamStatus(enum.IntFlag):
    """Stream status bitflags (node.rs:120-132)."""

    NONE = 0
    INPUT_OVERFLOW = 0b01
    OUTPUT_UNDERFLOW = 0b10


@dataclasses.dataclass(frozen=True)
class AudioNodeInfo:
    """Port-count constraints and update opt-in (node.rs:57-90)."""

    num_min_supported_inputs: int = 0
    num_max_supported_inputs: int = 0
    num_min_supported_outputs: int = 0
    num_max_supported_outputs: int = 0
    updates: bool = False

    def __post_init__(self):
        assert self.num_max_supported_inputs <= MAX_PORTS
        assert self.num_max_supported_outputs <= MAX_PORTS


def broadcast_flag(flag, shape):
    """Mosaic-safe broadcast of a boolean silence flag to ``shape``.

    A direct ``jnp.broadcast_to(bool_scalar, shape)`` inserts an i1 minor
    dim when batched (node pooling / the Pallas megakernel tile vmap),
    which Mosaic only supports for 32-bit types — so the flag rides
    through an f32 select + compare instead.  Identical semantics and XLA
    fuses it to the same thing on the non-Pallas path.
    """
    import jax.numpy as jnp

    f = jnp.where(flag, jnp.float32(1.0), jnp.float32(0.0))
    return jnp.broadcast_to(f, shape) != jnp.float32(0.0)


def flag_f32(flag):
    """Boolean silence flag -> f32 0/1 via select (the one i1 -> numeric
    conversion Mosaic supports at every vmap depth)."""
    import jax.numpy as jnp

    return jnp.where(flag, jnp.float32(1.0), jnp.float32(0.0))


def gate(x, silent_flag):
    """Zero ``x`` where ``silent_flag`` is set, broadcasting the flag over
    ``x``'s trailing dims.

    XLA path: a real ``jnp.where`` select, so flagged-silent outputs are
    *exactly* zero even if a kernel ever emits non-finite samples (a
    blown-up filter state must not leak NaN through a silent mask —
    ``0 * NaN`` would).  Mosaic path (megakernel trace): wide selects
    whose i1 predicate needs a minor-dim insert (tile vmap) fail layout
    inference, so the flag rides as an exact f32 0/1 multiply blend
    instead — same value for finite ``x``, and the megakernel gates
    eligibility to finite-state node families.
    """
    import jax.numpy as jnp

    from . import trace_mode

    m = flag_f32(silent_flag)
    m = jnp.reshape(m, jnp.shape(m) + (1,) * (x.ndim - jnp.ndim(m)))
    if trace_mode.MOSAIC:
        return x * (jnp.float32(1.0) - m)
    return jnp.where(m != jnp.float32(0.0), jnp.zeros_like(x), x)


#: the device stream clock's modulus: kernels see ``stream_sample`` as a
#: uint32 that wraps every 2^32 samples (~24.8 h @ 48 kHz)
STREAM_SAMPLE_PERIOD = 1 << 32


def wrap_stream_sample(start_sample):
    """Epoch-rebase a host sample clock onto the device's modular uint32
    stream clock (→ traced ``uint32`` scalar).

    The framework's ABSOLUTE clocks are host-side Python ints and never
    wrap: ``GraphProcessor``'s stream position, ``SessionServer.sample``,
    the music/voice-pool shadow clocks, and every ``at_sample=``
    scheduled command are compared as exact ints, and the PerBlock
    timeline machinery converts them to per-block values before
    dispatch.  Kernels therefore need ``info.stream_sample`` only for
    keying and deltas (e.g. the noise node's ``fold_in``), never for
    absolute comparisons — so the device clock is MODULAR by contract:
    this helper rebases the unbounded host int modulo 2^32 at every
    dispatch boundary (a bare ``jnp.asarray(x, uint32)`` raises
    ``OverflowError`` past 2^32, which would crash a serving fleet
    ~24.8 h in).  Crossing the epoch changes the noise keystream and
    resets ``stream_time_secs``; scheduled commands and transport land
    exactly (tests/test_clock_wrap.py).  The reference keeps unbounded
    f64 seconds host-side (firewheel-cpal/src/lib.rs:386-419) — same
    split: absolute time on the host, per-block deltas in the kernel.
    """
    import jax.numpy as jnp

    if isinstance(start_sample, (int, np.integer)):
        return jnp.asarray(
            int(start_sample) & (STREAM_SAMPLE_PERIOD - 1), jnp.uint32
        )
    # traced/array clocks: astype wraps modularly by definition
    return jnp.asarray(start_sample).astype(jnp.uint32)


def stream_time_from_sample(sample, sample_rate: float):
    """uint32 sample counter -> f32 seconds with split precision.

    A direct ``sample.astype(f32) / sr`` quantizes the *sample count* to
    f32 first (64-sample steps past 2^30), inflating the error well beyond
    what f32 seconds can represent.  Splitting into 16-bit halves keeps both
    intermediate products near-exact, so the result is within ~1 ulp of the
    true time for the full uint32 range.
    """
    import jax.numpy as jnp

    sample = jnp.asarray(sample, jnp.uint32)
    hi = (sample >> jnp.uint32(16)).astype(jnp.float32)
    lo = (sample & jnp.uint32(0xFFFF)).astype(jnp.float32)
    return hi * jnp.float32(65536.0 / sample_rate) + lo * jnp.float32(
        1.0 / sample_rate
    )


class BlockInfo(NamedTuple):
    """Per-block metadata passed to every kernel (the ``ProcInfo`` analog,
    node.rs:94-118).  All leaves are traced scalars so a single compiled
    program serves every block.

    ``stream_time_secs`` — seconds from stream start to this block's first
    frame (f32).
    ``stream_sample`` — sample index of the block's first frame on the
    device's MODULAR clock (uint32; one epoch = 2^32 samples ≈ 24.8 h at
    48 kHz).  Kernels use it for keying and deltas only; absolute-time
    semantics (``at_sample=`` scheduling, transport) are resolved
    host-side on unbounded ints — see :func:`wrap_stream_sample`.
    ``stream_status`` — :class:`StreamStatus` bits (uint32).
    """

    stream_time_secs: jnp.ndarray
    stream_sample: jnp.ndarray
    stream_status: jnp.ndarray

    @staticmethod
    def make(stream_time_secs=0.0, stream_sample=0, stream_status=0) -> "BlockInfo":
        return BlockInfo(
            stream_time_secs=jnp.asarray(stream_time_secs, jnp.float32),
            stream_sample=wrap_stream_sample(stream_sample),
            stream_status=jnp.asarray(stream_status, jnp.uint32),
        )


class NodeActivationError(Exception):
    """Raised by :meth:`AudioNode.activate` on invalid configuration
    (the ``CompileGraphError::NodeActivationFailed`` payload,
    ``graph/error.rs``)."""


class NodeProcessor:
    """The compute half of a node, created by :meth:`AudioNode.activate`.

    Subclasses define :meth:`init_state`, :meth:`collect_params` and
    :meth:`kernel`.  ``sample_rate``, ``max_block_frames`` and the port
    counts are static (baked into the compiled program).
    """

    #: Whether this processor's kernel lowers through Mosaic (the Pallas
    #: megakernel / hybrid islands, ``executor_pallas``).  Kernels using
    #: ops with no Mosaic lowering — FFTs, ``conv_general_dilated``,
    #: >2-D batched gathers (``take_along_axis`` under the batch tile),
    #: scatters (ring-buffer ``dynamic_update_slice`` writes) — must set
    #: this ``False``; the hybrid renderer then runs them as exact XLA
    #: stages between Pallas islands.  See docs/EXTENDING.md for the
    #: full Mosaic-safe kernel playbook.
    supports_megakernel: bool = True

    def __init__(
        self,
        sample_rate: int,
        max_block_frames: int,
        num_inputs: int,
        num_outputs: int,
    ):
        self.sample_rate = int(sample_rate)
        self.max_block_frames = int(max_block_frames)
        self.num_inputs = int(num_inputs)
        self.num_outputs = int(num_outputs)

    # -- overridables --------------------------------------------------------
    def init_state(self) -> Any:
        """Initial recurrent-state pytree (may be ``()`` for stateless)."""
        return ()

    def collect_params(self) -> Any:
        """Snapshot current host-side params as a pytree of numpy scalars.

        Called on the host before each dispatch; this is the lock-free
        param channel (the reference's ``AtomicF32`` loads, volume.rs:92).
        """
        return ()

    def kernel(self, params, state, inputs, in_mask, info: BlockInfo):
        """Pure per-block compute; see module docstring for the contract.

        ``inputs`` is ``f32[num_inputs, F]`` and ``in_mask`` ``bool[num_inputs]``.
        Must return ``(f32[num_outputs, F], new_state, bool[num_outputs])``.
        """
        raise NotImplementedError

    def resync_from_state(self, state) -> None:
        """Adopt a restored state pytree's control metadata (sequence
        numbers etc.) into the host-side node after a checkpoint restore,
        so host and device sequence counters agree and the first
        post-restore block sees no spurious command edges.  Default:
        nothing to sync."""

    def event_counters(self) -> dict:
        """Declare device-side event counters: ``{event_name: state_key}``.

        Each named state leaf must be a monotonic ``uint32`` counter the
        kernel increments when the event occurs (scalar, or a vector for
        pooled lanes).  The host diffs totals at poll time and emits
        :class:`~firewheel_tpu.core.events.NodeEvent` records — the
        TPU-native answer to the reference's TODO'd finish-notify
        (sampler.rs:496,513); see ``core/events.py``.  Default: none."""
        return {}

    def group_key(self):
        """Grouping signature for trace-time node pooling, or ``None``.

        The executor vmaps *identical* consecutive nodes into one traced
        kernel (a 128-emitter scene traces one spatializer, not 128),
        shrinking program size and compile time dramatically.  Two
        processors may share a group only if their kernels are
        **behaviorally identical** given the same (params, state, inputs)
        — i.e. every per-node difference lives in params/state, not in
        Python attributes the kernel closes over.  Return ``None`` (the
        default) to opt out."""
        return None

    def signature_key(self):
        """Behavioral-identity key for the cross-program compile cache,
        or ``None`` to opt the whole program out of it.

        Defaults to :meth:`group_key`, but the two answer different
        questions: ``group_key`` additionally gates *pooling* (vmapping
        consecutive identical nodes into one traced kernel), which some
        nodes expose as an explicit user opt-in because it imposes a
        stability promise (e.g. ``SamplerNode(poolable=True)`` promises a
        fixed sample shape).  A node whose kernel is behaviorally
        identical given the same (params, state, inputs) should return a
        non-``None`` key here even when pooling is opted out — otherwise
        one such node makes every live edit of the surrounding graph pay
        a full retrace + XLA compile instead of adopting the donor
        program's warmed executables (round-4 soak: a game mixer with one
        default sampler recompiled on every topology edit)."""
        return self.group_key()


class AudioNode:
    """Main-thread node handle (node.rs:6-34).

    Holds user-facing parameters; :meth:`activate` validates the port
    configuration and builds the :class:`NodeProcessor`.
    """

    debug_name: str = "node"

    #: silence in ⇒ silence out with no self-generated signal: the node may
    #: be dropped from a compiled schedule when everything feeding it is
    #: dormant (the opt-in compile-time pruning pass,
    #: ``AudioGraph.prune_dormant`` — SURVEY §7 "(b) compile-time pruning").
    #: Leave False for nodes with audible tails (echo/reverb/filters keep
    #: rendering their decay) or observable state (meters keep reading).
    silence_transparent: bool = False

    def is_dormant(self) -> bool:
        """True while this node is guaranteed to output silence (e.g. a
        disabled generator).  With ``graph.prune_dormant`` set, dormant
        nodes — and any ``silence_transparent`` subgraph fed only by them —
        are dropped from the compiled schedule entirely (the static
        counterpart of the reference's per-block silence-mask skipping,
        volume.rs:94-100).  Flipping dormancy does NOT dirty the graph by
        itself: call ``graph.notify_dormancy_changed()`` after toggling so
        the next update() recompiles (recompile-on-enable; the pruned
        node's recurrent state is parked and resumes frozen)."""
        return False

    def latency_frames(self, sample_rate: int) -> int:
        """Algorithmic delay this node imposes on its signal path, in
        frames — the plugin-delay-compensation (PDC) protocol.

        Declare a non-zero value only when the output is (to first order)
        the processed input *delayed by that many frames* — e.g. a
        lookahead limiter's window or an explicit alignment delay.  Do NOT
        declare effect delays (echo/reverb tails) — those are the sound,
        not latency.  ``AudioGraph.compensate_latency`` sums these along
        every path and pads the faster sides of each merge so parallel
        chains stay phase-aligned (the comb-filter killer every DAW
        ships; beyond the reference's shipped code but squarely in its
        effect-node design scope, DESIGN_DOC.md:11-28)."""
        return 0

    def info(self) -> AudioNodeInfo:
        raise NotImplementedError

    def activate(
        self,
        sample_rate: int,
        max_block_frames: int,
        num_inputs: int,
        num_outputs: int,
    ) -> NodeProcessor:
        raise NotImplementedError

    def deactivate(self, processor: NodeProcessor | None = None) -> None:
        """Called when the processor half is retired (node.rs:25-28)."""

    def update(self) -> None:
        """Periodic main-thread hook; called only if ``info().updates``
        (node.rs:30-34)."""
