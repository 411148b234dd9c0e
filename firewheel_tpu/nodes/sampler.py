"""Sampler node: PCM sample playback with loop ranges, gain smoothing, and
(beyond the reference) resampling / doppler pitch.

Reference: ``crates/firewheel-graph/src/basic_nodes/sampler.rs`` — a
message-driven sample player (Play/Pause/Stop/SetPlayhead/SetLoopRange/
SetSample over a private rtrb channel, sampler.rs:21-28), loop-range
playback with a wraparound two-part copy (sampler.rs:445-484), one-shot end
handling (sampler.rs:486-517), smoothed gain (sampler.rs:432-443), and
mono→stereo auto-duplication (sampler.rs:545-552).

TPU-native design
-----------------
* **Playback is a gather.**  Per-block sample positions are
  ``playhead + k*rate`` (fixed-point integer playhead + f32 fractional
  carry, so nothing drifts across blocks); looping wraps positions with a
  modulo — equivalent to the reference's two-part copy but valid for any
  number of wraps per block; one-shot masks positions past the end.
  Linear interpolation between adjacent frames gives resampling/doppler
  (``rate`` = playback speed; 1.0 is bit-exact non-resampled playback).
* **Commands are sequence-numbered params.**  The reference drains an SPSC
  message queue on the audio thread; here the host collapses commands into
  the *effective* control state (playing flag, latest seek, loop range) plus
  monotonically increasing sequence numbers; the kernel applies a seek/loop
  change exactly once by comparing sequence numbers carried in its state.
  This preserves the reference's semantics with zero retraces.
* **The sample is a param**, a device-resident ``f32[ch, frames]`` array:
  swapping samples of the same shape is free; a different shape retraces
  once (``SetSample`` is rare).  The old sample array is simply dropped —
  JAX's immutable buffers make the reference's return-for-deallocation dance
  (sampler.rs:337-341, 563-571) unnecessary.

Beyond the reference, the sampler carries a **gain envelope** (DESIGN_DOC.md
sampler scope: "gain envelope"): a per-voice attack/release ramp driven by
the playing state — ``set_envelope(attack_secs, release_secs)``.  During the
release the voice keeps playing while fading, so pause/stop become clickless
(the *declicking* the reference left TODO throughout, sampler.rs:359-522).
The default is 0/0 — the reference's hard-switch behavior, bit-exact.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeProcessor,
    MAX_PORTS,
)
from ..core.sample_resource import SampleResource
from ..core.smoother import (
    SmootherConfig,
    smoother_coeffs,
    smoother_init,
    smoother_set_and_process,
)
from ..core.units import percent_volume_to_raw_gain

__all__ = ["LoopRange", "SamplerNode", "SamplerProcessor"]


def _u32(x) -> int:
    """Clamp a host integer into uint32 range (np.uint32() raises on
    out-of-range values under NumPy >= 2)."""
    return min(max(int(x), 0), 0xFFFFFFFF)


@dataclasses.dataclass(frozen=True)
class LoopRange:
    """``Full`` or a seconds range (sampler.rs:16-19)."""

    start_secs: float = 0.0
    end_secs: Optional[float] = None  # None in full-range mode
    full: bool = False

    FULL = None  # assigned below

    @staticmethod
    def range_secs(start: float, end: float) -> "LoopRange":
        return LoopRange(start_secs=start, end_secs=end, full=False)


LoopRange.FULL = LoopRange(full=True)

_EMPTY_SAMPLE = np.zeros((1, 1), np.float32)


class SamplerNode(AudioNode):
    debug_name = "sampler"

    def __init__(
        self,
        percent_volume: float = 100.0,
        poolable: bool = False,
        quality: str = "linear",
    ):
        """``poolable``: opt into trace-time node pooling — voice pools of
        samplers then vmap into ONE traced kernel (see
        NodeProcessor.group_key).  The caller promises every pooled
        sampler keeps a sample of the SAME [channels, frames] shape for
        the program's lifetime (pad clips to a common length); a shape
        change after pooling fails the retrace with a stack error.

        ``quality``: resampling interpolator (the reference left
        resampling TODO, sampler.rs:359-522).  ``"linear"`` (default,
        2-tap — bit-exact passthrough at rate 1.0, fine for doppler),
        ``"cubic"`` (4-tap Catmull-Rom), or ``"sinc8"`` (8-tap Lanczos-4
        windowed sinc — large pitch shifts without the linear
        interpolator's aliasing).  Structural: changing it retraces.
        Clip edges are clamp-extended for the wider kernels; in loop mode
        taps wrap inside the loop, so steady-state loops interpolate
        seamlessly across the join."""
        assert quality in ("linear", "cubic", "sinc8"), quality
        self.quality = quality
        self.poolable = bool(poolable)
        self._percent_volume = max(float(percent_volume), 0.0)
        self._raw_gain = float(
            percent_volume_to_raw_gain(np.float32(percent_volume))
        )
        self._playing = False
        self._rate = 1.0
        self._attack_secs = 0.0
        self._release_secs = 0.0
        self._sample: Optional[SampleResource] = None
        self._loop: Optional[LoopRange] = None
        # control-plane sequence numbers (the rtrb message queue analog).
        # Seeks are stored in SECONDS (or as a symbolic loop-start rewind)
        # and converted to frames by the processor with the real stream
        # rate — the reference converts on the processor side too
        # (sampler.rs:446-453), so seeks issued before activation land
        # correctly on non-48k streams.
        self._seek_seq = 0
        self._seek: tuple = ("secs", 0.0)
        self._loop_seq = 0
        # play() is a MESSAGE, not a level (sampler.rs Play): each call
        # bumps this; the kernel clears the one-shot `ended` latch on the
        # seq edge, so play() after a finish replays from the rewound
        # playhead exactly like the reference
        self._play_seq = 0
        self._sample_rate = 48000  # set at activate
        #: (at_sample, kind, payload) commands awaiting their exact block
        #: (play/pause/stop/seek with ``at_sample=`` — per-block timelines)
        self._scheduled: list[tuple] = []

    # -- control API (sampler.rs:67-181) --------------------------------------
    def set_sample(self, sample: SampleResource, stop_playback: bool = True):
        self._sample = sample
        if stop_playback:
            self._seek_seq += 1
            self._seek = ("loop_start",)
            self._playing = False

    def play(self, at_sample: int | None = None):
        """Start playback.  ``at_sample``: absolute stream sample at which
        to start — SAMPLE-accurate even inside a chunked
        (K-blocks-per-dispatch) stream: the trigger rides the per-block
        param timelines and carries a sub-block offset the kernel applies
        at the trigger block, so the gunshot fires on its exact sample.

        Retriggering a voice that is still playing cuts it to silence
        for the trigger block's pre-trigger samples (a retrigger IS a
        cut; overlapping shots belong on separate voices — that is what
        :class:`~firewheel_tpu.voice_pool.VoicePool` provides)."""
        if at_sample is None:
            self._playing = True
            self._play_seq += 1
        else:
            self._scheduled.append((int(at_sample), "play", None))
            self._scheduled.sort(key=lambda e: e[0])

    def pause(self, at_sample: int | None = None):
        if at_sample is None:
            self._playing = False
        else:
            self._scheduled.append((int(at_sample), "pause", None))
            self._scheduled.sort(key=lambda e: e[0])

    def stop(self, at_sample: int | None = None):
        """Stop playback and rewind to the loop start.  A no-op while not
        playing (the reference's node-side guard, sampler.rs:118-119 —
        pause() then stop() keeps the paused playhead)."""
        if at_sample is None:
            if not self._playing:
                return
            self._playing = False
            self._seek_seq += 1
            self._seek = ("loop_start",)
        else:
            self._scheduled.append((int(at_sample), "stop", None))
            self._scheduled.sort(key=lambda e: e[0])

    def set_playhead(self, playhead_secs: float, at_sample: int | None = None):
        if at_sample is None:
            self._seek_seq += 1
            self._seek = ("secs", float(playhead_secs))
        else:
            self._scheduled.append(
                (int(at_sample), "seek", float(playhead_secs))
            )
            self._scheduled.sort(key=lambda e: e[0])

    def cancel_scheduled(self) -> None:
        """Drop every pending ``at_sample=`` command that has not yet
        been consumed by a dispatch (voice re-targeting, hard
        transitions)."""
        self._scheduled.clear()

    def set_loop_range(self, loop_range: Optional[LoopRange]):
        self._loop = loop_range
        self._loop_seq += 1

    def set_playback_rate(self, rate: float):
        """Resampling / doppler pitch (beyond-reference; BASELINE scope).
        1.0 = native speed."""
        self._rate = max(float(rate), 0.0)

    def set_envelope(self, attack_secs: float, release_secs: float):
        """Gain envelope / declick fade times (0 = instant, the reference's
        behavior).  ~0.005 s declicks play/pause/stop transitions."""
        self._attack_secs = max(float(attack_secs), 0.0)
        self._release_secs = max(float(release_secs), 0.0)

    def is_playing(self) -> bool:
        return self._playing

    def percent_volume(self) -> float:
        return self._percent_volume

    def set_percent_volume(self, percent_volume: float):
        self._raw_gain = float(
            percent_volume_to_raw_gain(np.float32(percent_volume))
        )
        self._percent_volume = max(float(percent_volume), 0.0)

    def raw_gain(self) -> float:
        return self._raw_gain

    def _loop_params(self, sample_rate: float):
        """(loop_on, start_frame, end_frame) honoring full-range mode
        (sampler.rs:240-277).  ``sample_rate`` is the *stream* rate the
        processor was activated with (not the node-side default)."""
        n = self._sample.len_frames if self._sample is not None else 0
        if self._loop is None:
            return False, 0, n
        if self._loop.full:
            return True, 0, n
        return (
            True,
            _u32(round(self._loop.start_secs * sample_rate)),
            _u32(round(self._loop.end_secs * sample_rate)),
        )

    def _seek_frame(self, sample_rate: float) -> int:
        """Resolve the pending seek target to a frame at the stream rate."""
        if self._seek[0] == "loop_start":
            return self._loop_params(sample_rate)[1]
        return _u32(round(self._seek[1] * sample_rate))

    # -- node plumbing --------------------------------------------------------
    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
            updates=True,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        self._sample_rate = int(sample_rate)
        return SamplerProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )

    def update(self):
        """Main-thread hook (sampler.rs:224-232).  Sample returns are
        unnecessary here (immutable device buffers); kept for API parity."""


class SamplerProcessor(NodeProcessor):
    supports_megakernel = False  # data-dependent playback gathers
    def __init__(self, node: SamplerNode, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._coeffs = smoother_coeffs(sample_rate, SmootherConfig())
        self._eps = SmootherConfig().settle_epsilon
        self._sample_cache = None
        self._sample_cache_src = None

    def init_state(self):
        return {
            "gain": smoother_init(np.float32(self._node.raw_gain())),
            "playhead": jnp.zeros((), jnp.uint32),
            "frac": jnp.zeros((), jnp.float32),
            "ended": jnp.zeros((), bool),
            "prev_playing": jnp.zeros((), bool),
            "seek_seq": jnp.zeros((), jnp.uint32),
            "loop_seq": jnp.zeros((), jnp.uint32),
            "play_seq": jnp.zeros((), jnp.uint32),
            "env": jnp.zeros((), jnp.float32),
            # monotonic event counters (core/events.py): one-shot
            # completions and loop-join crossings
            "finish_count": jnp.zeros((), jnp.uint32),
            "loop_count": jnp.zeros((), jnp.uint32),
        }

    def event_counters(self):
        """``finished``: a one-shot reached its end (the reference's
        TODO'd notify, sampler.rs:496,513); ``loop``: playback crossed
        the loop join (once per complete traversal)."""
        return {"finished": "finish_count", "loop": "loop_count"}

    def group_key(self):
        node = self._node
        if not node.poolable:
            return None
        return self.signature_key()

    def signature_key(self):
        """Unlike pooling (gated on the ``poolable`` opt-in, because it
        promises a stable sample shape for the program's lifetime), the
        compile-cache identity holds unconditionally: the sample data
        rides ``collect_params`` as a device argument, so the traced
        kernel depends only on its shape and the interpolator — a
        default (non-poolable) sampler must not force the whole program
        to recompile on every live edit."""
        node = self._node
        shape = (
            tuple(np.asarray(node._sample.data).shape)
            if node._sample is not None
            else (1, 1)
        )
        # quality is structural (it decides the tap count traced)
        return (shape, node.quality)

    #: scheduled play/pause/stop/seek commands ride per-block param
    #: timelines (executor.PerBlock) so they land on their exact
    #: 128-frame block inside a K-block chunk dispatch — the kernel's
    #: sequence-number application is unchanged; only the params it sees
    #: per block differ
    collect_timeline = True

    def collect_params(
        self, blocks=1, start_sample=None, frames=None, consume=True
    ):
        node = self._node
        if node._sample is not None:
            if self._sample_cache_src is not node._sample:
                self._sample_cache = jnp.asarray(node._sample.data)
                self._sample_cache_src = node._sample
            data = self._sample_cache
            has_sample = True
        else:
            data = jnp.asarray(_EMPTY_SAMPLE)
            has_sample = False
        sr = self.sample_rate
        # clip-native rate (SampleResource.sample_rate): seconds-based
        # seeks/loops address CLIP time, and playback auto-scales so a
        # 44.1 kHz clip plays at native pitch in a 48 kHz stream.  An
        # unrated clip keeps the reference's behavior (stream rate).
        clip_sr = (
            node._sample.sample_rate
            if has_sample and node._sample.sample_rate
            else sr
        )
        loop_on, loop_start, loop_end = node._loop_params(clip_sr)
        # per-sample envelope steps; 0-second times jump in one sample
        attack_step = (
            1.0 / (node._attack_secs * sr) if node._attack_secs > 0 else 2.0
        )
        release_step = (
            1.0 / (node._release_secs * sr) if node._release_secs > 0 else 2.0
        )
        out = {
            "attack_step": np.float32(attack_step),
            "release_step": np.float32(release_step),
            "raw_gain": np.float32(node.raw_gain()),
            "playing": np.asarray(node._playing and has_sample, bool),
            "rate": np.float32(node._rate * clip_sr / sr),
            "seek_seq": np.uint32(node._seek_seq),
            "seek_pos": np.uint32(node._seek_frame(clip_sr)),
            "play_seq": np.uint32(node._play_seq & 0xFFFFFFFF),
            "start_offset": np.uint32(0),
            "loop_on": np.asarray(loop_on, bool),
            "loop_seq": np.uint32(node._loop_seq & 0xFFFFFFFF),
            "loop_start": np.uint32(_u32(loop_start)),
            "loop_end": np.uint32(_u32(loop_end)),
            "sample": data,
        }
        if start_sample is None:
            # unpacked paths: immediate values only; scheduled commands
            # stay queued for a timeline-capable dispatch
            return out

        # -- per-block command timelines (packed/chunked hot path) ----------
        from ..executor import PerBlock

        k = max(1, int(blocks))
        f = int(frames or self.max_block_frames)
        start = int(start_sample)
        playing_tl = np.full(k, bool(node._playing and has_sample))
        seq_tl = np.full(k, np.uint32(node._seek_seq), np.uint32)
        pos_tl = np.full(k, np.uint32(node._seek_frame(clip_sr)), np.uint32)
        play_seq_tl = np.full(
            k, np.uint32(node._play_seq & 0xFFFFFFFF), np.uint32
        )
        # sub-block start offset applied at the play trigger block —
        # scheduled triggers are SAMPLE-accurate (the gunshot fires on
        # its exact sample, not its block; see the streaming sampler)
        offset_tl = np.zeros(k, np.uint32)
        if consume and node._scheduled:
            end = start + k * f
            cur_playing = node._playing
            cur_seq = node._seek_seq
            cur_play_seq = node._play_seq
            cur_seek = node._seek
            remaining = []
            for at, kind, payload in node._scheduled:
                if at >= end:
                    remaining.append((at, kind, payload))
                    continue
                b = max(0, (at - start) // f)
                if kind == "play":
                    cur_playing = True
                    cur_play_seq += 1
                    play_seq_tl[b:] = np.uint32(cur_play_seq & 0xFFFFFFFF)
                    off = max(0, at - (start + b * f))
                    offset_tl[b] = np.uint32(min(off, f - 1))
                elif kind == "pause":
                    cur_playing = False
                elif kind == "stop":
                    # same node-side guard as the immediate path: a stop
                    # landing while not playing is a no-op (no rewind)
                    if cur_playing:
                        cur_playing = False
                        cur_seq += 1
                        cur_seek = ("loop_start",)
                        pos_tl[b:] = np.uint32(loop_start)
                elif kind == "seek":
                    cur_seq += 1
                    cur_seek = ("secs", float(payload))
                    pos_tl[b:] = np.uint32(_u32(round(payload * clip_sr)))
                playing_tl[b:] = cur_playing and has_sample
                seq_tl[b:] = np.uint32(cur_seq & 0xFFFFFFFF)
            node._playing = cur_playing
            node._seek_seq = cur_seq
            node._play_seq = cur_play_seq
            node._seek = cur_seek
            node._scheduled = remaining
        out["playing"] = PerBlock(playing_tl)
        out["seek_seq"] = PerBlock(seq_tl)
        out["seek_pos"] = PerBlock(pos_tl)
        out["play_seq"] = PerBlock(play_seq_tl)
        out["start_offset"] = PerBlock(offset_tl)
        return out

    def resync_from_state(self, state) -> None:
        """Adopt restored device sequence numbers (checkpoint restore):
        host-side counters continue from the restored values, so the
        first post-restore block sees no spurious seek/trigger edges and
        later ``play()``/``set_playhead()`` calls fire exactly once."""
        node = self._node
        node._seek_seq = int(np.asarray(state["seek_seq"]).max())
        node._loop_seq = int(np.asarray(state["loop_seq"]).max())
        node._play_seq = int(np.asarray(state["play_seq"]).max())

    def kernel(self, params, state, inputs, in_mask, info):
        frames = self.max_block_frames if inputs.ndim < 2 else inputs.shape[-1]
        n_out = self.num_outputs
        sample = params["sample"]
        sample_channels, sample_len = sample.shape

        # ---- apply queued control state (the message-drain analog,
        # sampler.rs:331-414)
        playhead = state["playhead"]
        frac = state["frac"]
        ended = state["ended"]

        seek_new = params["seek_seq"] != state["seek_seq"]
        playhead = jnp.where(seek_new, params["seek_pos"], playhead)
        frac = jnp.where(seek_new, jnp.float32(0.0), frac)
        ended = jnp.where(seek_new, False, ended)

        loop_new = params["loop_seq"] != state["loop_seq"]
        in_range = (playhead >= params["loop_start"]) & (
            playhead < params["loop_end"]
        )
        playhead = jnp.where(
            loop_new & params["loop_on"] & in_range,
            params["loop_start"],
            playhead,
        )

        # rising play edge clears the auto-stop latch (reference replays
        # from the rewound playhead after Stop/Play, sampler.rs:365-371);
        # play_seq makes play() a MESSAGE: a repeat play() on a finished
        # voice (level already high, no edge) still re-triggers from the
        # rewound playhead, like the reference's Play command
        rising = params["playing"] & ~state["prev_playing"]
        trigger = params["play_seq"] != state["play_seq"]
        ended = jnp.where(rising | trigger, False, ended)

        playing = params["playing"] & ~ended

        # ---- gain envelope / declick: linear ramp toward the playing state;
        # during release the voice keeps playing while fading (beyond the
        # reference's hard switch; see module docstring)
        env0 = state["env"]
        slope = jnp.where(
            playing, params["attack_step"], -params["release_step"]
        )
        # int iota + cast (Mosaic: tpu.iota is integer-only)
        k1 = jnp.arange(1, frames + 1, dtype=jnp.int32).astype(jnp.float32)
        env_k = jnp.clip(env0 + k1 * slope, 0.0, 1.0)
        # a voice is active while playing or audibly fading; an instant
        # release (step 2.0) silences within the first sample, freezing the
        # playhead exactly like the reference's hard pause
        active = playing | (env_k[0] > jnp.float32(0.0))

        # ---- gain ramp + mute short-circuit (sampler.rs:432-443).
        # The reference only runs the smoother when a sample is playing
        # (early returns at sampler.rs:416-430 skip it) — gate the state
        # update identically.  A SEEK (incl. the implicit rewind from
        # set_sample) is an explicit playback discontinuity, so the gain
        # smoother SNAPS to its target there instead of gliding from the
        # pre-seek gain — a re-targeted pool voice starts its shot at the
        # requested level (VoicePool), while continuous volume moves
        # still ramp.
        gain_prev = jax.tree.map(
            lambda snap, cur: jnp.where(seek_new, snap, cur),
            smoother_init(params["raw_gain"]),
            state["gain"],
        )
        ramp, gain_processed, smoothing = smoother_set_and_process(
            gain_prev, params["raw_gain"], frames, self._coeffs, self._eps
        )
        gain_state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old),
            gain_processed,
            gain_prev,
        )
        muted = ~smoothing & (ramp[0] < jnp.float32(0.00001))

        # ---- playback positions (fixed-point integer + f32 frac carry).
        # start_off: sub-block sample offset of a scheduled play, applied
        # at the trigger block only — the first start_off samples are
        # masked and the playhead advances by the remainder
        start_off = jnp.where(
            trigger, params["start_offset"], jnp.uint32(0)
        ).astype(jnp.float32)
        rate = params["rate"]
        k = jnp.arange(frames, dtype=jnp.int32).astype(jnp.float32)
        # offset in frames from integer playhead
        off = jnp.maximum(frac + (k - start_off) * rate, 0.0)
        off_int = jnp.floor(off).astype(jnp.uint32)
        interp_w = off - jnp.floor(off)

        loop_on = params["loop_on"]
        # clamp the loop to the clip and keep it non-empty (a range fully
        # past the clip collapses to the final frame region)
        lstart = jnp.minimum(params["loop_start"], jnp.uint32(sample_len - 1))
        lend = jnp.minimum(
            jnp.maximum(params["loop_end"], lstart + 1), jnp.uint32(sample_len)
        )
        lend = jnp.maximum(lend, lstart + 1)
        llen = lend - lstart
        # out-of-range playhead returns to loop start (sampler.rs:446-453)
        playhead_eff = jnp.where(
            loop_on & (playhead >= lend), lstart, playhead
        )

        pos = playhead_eff + off_int
        # A playhead BELOW the range plays linearly up to the loop end and
        # only then wraps into the loop (the reference plays through,
        # sampler.rs:446-484); max() guards the uint32 subtraction.
        safe_rel = jnp.maximum(pos, lstart) - lstart
        wrapped = lstart + jax.lax.rem(safe_rel, llen)
        pos_loop = jnp.where(pos < lend, jnp.minimum(pos, sample_len - 1), wrapped)
        idx0 = jnp.where(loop_on, pos_loop, jnp.minimum(pos, sample_len - 1))
        idx1_raw = idx0 + 1
        idx1 = jnp.where(
            loop_on,
            jnp.where(idx1_raw >= lend, lstart, jnp.minimum(idx1_raw, sample_len - 1)),
            jnp.minimum(idx1_raw, sample_len - 1),
        )
        # ~ended: a finished one-shot is silent until re-triggered — without
        # it a voice with a release envelope would audibly replay the clip
        # head (playhead rewound to 0) during its post-finish fade;
        # k >= start_off: pre-trigger samples of a mid-block start are silent
        valid = (loop_on | (pos < sample_len)) & ~ended & (k >= start_off)

        quality = self._node.quality
        if quality == "linear":
            s0 = sample[:, idx0.astype(jnp.int32)]
            s1 = sample[:, idx1.astype(jnp.int32)]
            frames_out = s0 + (s1 - s0) * interp_w[None, :]
        else:
            # Multi-tap gather around the (wrapped/clamped) base index: in
            # loop mode taps wrap inside [lstart, lend), so steady-state
            # loops interpolate seamlessly across the join; one-shot taps
            # clamp-extend the clip edges.
            idx0_i = idx0.astype(jnp.int32)
            lstart_i = lstart.astype(jnp.int32)
            llen_i = llen.astype(jnp.int32)
            in_loop = loop_on & (idx0 >= lstart)

            def tap_index(d: int):
                t_i = idx0_i + d
                rel = t_i - lstart_i
                wrapped_i = lstart_i + jax.lax.rem(
                    jax.lax.rem(rel, llen_i) + llen_i, llen_i
                )
                clamped = jnp.clip(t_i, 0, sample_len - 1)
                return jnp.where(in_loop, wrapped_i, clamped)

            t = interp_w
            if quality == "cubic":
                # Catmull-Rom weights; exact (0,1,0,0) at t == 0
                taps = (-1, 0, 1, 2)
                weights = [
                    ((-0.5 * t + 1.0) * t - 0.5) * t,
                    (1.5 * t - 2.5) * t * t + 1.0,
                    ((-1.5 * t + 2.0) * t + 0.5) * t,
                    (0.5 * t - 0.5) * t * t,
                ]
            else:  # sinc8: Lanczos a=4
                taps = tuple(range(-3, 5))
                weights = [jnp.sinc(t - d) * jnp.sinc((t - d) / 4.0) for d in taps]
                wsum = sum(weights)
                weights = [w / wsum for w in weights]
            frames_out = jnp.zeros_like(sample[:, idx0.astype(jnp.int32)])
            for d, w in zip(taps, weights):
                frames_out = frames_out + sample[:, tap_index(d)] * w[None, :]
        frames_out = jnp.where(valid[None, :], frames_out, 0.0)

        # ---- advance the carry (minus a mid-block start's masked samples)
        adv = frac + (jnp.float32(frames) - start_off) * rate
        adv_int = jnp.floor(adv)
        new_playhead = playhead_eff + adv_int.astype(jnp.uint32)
        new_frac = adv - adv_int
        # loop: fold the playhead back into range to keep it bounded
        np_rel = new_playhead - lstart
        wrap = loop_on & (new_playhead >= lend)
        # complete loop traversals this block (>=1 when wrapping; a loop
        # shorter than one block's advance counts each full pass)
        wraps = jnp.where(wrap, jax.lax.div(np_rel, llen), jnp.uint32(0))
        new_playhead = jnp.where(
            wrap,
            lstart + jax.lax.rem(np_rel, llen),
            new_playhead,
        )
        finished = ~loop_on & (new_playhead >= sample_len)
        # one-shot finish rewinds to 0 and latches ended
        # (sampler.rs:503-513; finish-notify is TODO there too)
        new_playhead = jnp.where(finished, jnp.uint32(0), new_playhead)
        new_frac = jnp.where(finished, jnp.float32(0.0), new_frac)

        silent = ~active | muted
        # muted freezes playback exactly like the reference's early return
        # (sampler.rs:436-443 bails before any playhead advance): a muted
        # voice must NOT consume its clip inaudibly or latch `ended`.
        # ~ended: a finished voice stays frozen at its rewound playhead
        # through any release fade, so re-triggering replays from 0
        advancing = active & ~muted & ~ended
        new_ended = jnp.where(advancing & finished, True, ended)
        # event counters (event_counters()): fire once per actual finish /
        # per loop traversal; frozen (muted/ended) blocks count nothing
        new_finish_count = state["finish_count"] + jnp.where(
            advancing & finished, jnp.uint32(1), jnp.uint32(0)
        )
        new_loop_count = state["loop_count"] + jnp.where(
            advancing, wraps, jnp.uint32(0)
        )
        new_playhead = jnp.where(advancing, new_playhead, playhead)
        new_frac = jnp.where(advancing, new_frac, frac)

        # ---- gain apply to the sample's channels (sampler.rs:521-543),
        # shaped by the envelope
        gained = frames_out * (ramp * env_k)[None, :]

        # ---- channel layout (sampler.rs:545-558)
        rows = []
        mask_rows = []
        for ch in range(n_out):
            if ch < sample_channels:
                rows.append(gained[ch])
                mask_rows.append(silent)
            elif n_out == 2 and sample_channels == 1:
                rows.append(gained[0])  # mono→stereo duplicate
                mask_rows.append(silent)
            else:
                rows.append(jnp.zeros((frames,), jnp.float32))
                mask_rows.append(jnp.asarray(True))
        out = jnp.stack(rows)
        out = gate(out, silent)
        out_mask = jnp.stack(mask_rows)

        new_state = {
            "gain": gain_state,
            "env": env_k[frames - 1],  # positive index: stays a slice (Mosaic)
            "playhead": new_playhead,
            "frac": new_frac,
            "ended": new_ended,
            "prev_playing": params["playing"],
            "seek_seq": jnp.asarray(params["seek_seq"], jnp.uint32),
            "loop_seq": jnp.asarray(params["loop_seq"], jnp.uint32),
            "play_seq": jnp.asarray(params["play_seq"], jnp.uint32),
            "finish_count": new_finish_count,
            "loop_count": new_loop_count,
        }
        return out, new_state, out_mask
