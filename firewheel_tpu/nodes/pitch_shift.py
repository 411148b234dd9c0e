"""Real-time pitch shifter: dual-tap crossfading delay line.

Beyond-reference DSP in the reference's declared scope ("pitch shifting
(doppler stretching) nodes", ``DESIGN_DOC.md``; unimplemented there).
Where the sampler's playback-rate resampling shifts pitch by changing
duration (doppler), this node shifts pitch of a LIVE stream at unchanged
duration — the classic dual-tap "harmonizer" design (Lent/Bode delay-line
pitch shifter):

* input rolls through a ring of ``W`` frames (the grain window);
* two read taps advance at the pitch ratio ``r = 2^(semitones/12)`` —
  their delay drifts at rate ``1 − r``, wrapping modulo ``W``;
* the taps run half a window apart, each weighted by a triangular
  (constant-power-sum) crossfade of its wrap phase, so one tap is always
  silent when it jumps — no clicks, and the output stays at unit gain.

Artifacts are the design's own: comb coloration at ``|semitones|`` large
and transient smearing across the grain — the standard trade for a
streaming, FFT-free shifter (a few ms of latency, no lookahead).  TPU
shape: the whole block computes as two fractional-delay gathers with
per-sample positions + a blend — the same machinery as the binaural ITD
(``nodes/binaural.py``), fully fused by XLA, vmap/scan-safe.

``semitones`` is a live param (glides are audible immediately; the tap
trajectory is phase-continuous across blocks and across param changes
because state carries the current tap phase, not the target).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core import trace_mode
from ..core.node import (
    gate,
    broadcast_flag,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)

__all__ = ["PitchShiftNode", "PitchShiftProcessor"]


class PitchShiftProcessor(NodeProcessor):
    # Megakernel eligibility (round-4 reformulation of the round-3
    # scatter failure): the ring is SHIFT-LEFT (newest samples always at
    # the end, like mod_effects' line) instead of cursor+scatter —
    # vmap(dynamic_update_slice) always delegates to scatter
    # (jax slicing.py _dynamic_update_slice_batching_rule), so ANY
    # cursor-positioned write is un-lowerable under the tile vmap; the
    # static-slice concat is scatter-free in both lowerings and handles
    # partial blocks.  Taps lower through the 128-wide tiled gather
    # (ops/gather.py: tpu.dynamic_gather only compiles one lane tile
    # wide — wider take_along_axis crashes the TPU compiler, probed
    # 2026-08-19); the unroll cost caps eligibility to small rings, so
    # the DEFAULT 8192-sample window stays on the XLA executor while
    # short-window shifters join the megakernel.
    # the gather-heavy body compiles at fori_loop trip count 1 but
    # SIGABRTs libtpu inside a real K-loop (probed 2026-08-19); static
    # unroll sidesteps the loop entirely
    megakernel_needs_unroll = True

    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        # grain window: the tap-position slack is W/8 (see kernel), so
        # chunk invariance requires W >= 8*max_block_frames — otherwise a
        # near-wrap tap could read samples written later in the same block
        # and the output would depend on how the stream is chunked.  The
        # floor scales the window up for large blocks (cpal's default 1024
        # frames -> >= 8192) rather than breaking the invariant; power of
        # two keeps the ring mod cheap.
        w = max(int(node.window_secs * sample_rate), 8 * max_block_frames)
        self._window = 1 << (w - 1).bit_length()
        from ..ops.gather import gather_unroll_cost

        self.supports_megakernel = gather_unroll_cost(
            num_inputs * self._window, 2 * num_inputs * max_block_frames
        ) <= 256

    def group_key(self):
        return (self._window,)

    def init_state(self):
        ch = self.num_inputs
        return {
            # shift-left ring: ring[:, -1] is the newest sample
            "ring": np.zeros((ch, self._window), np.float32),
            # tap phase in [0, 1): position of tap A inside the wrap
            # cycle; tap B rides half a cycle away
            "phase": np.zeros((), np.float32),
        }

    def collect_params(self):
        n = self._node
        ratio = float(2.0 ** (n._semitones / 12.0))
        return {"ratio": np.float32(ratio), "mix": np.float32(n._mix)}

    def kernel(self, params, state, inputs, in_mask, info):
        ch, frames = inputs.shape
        w = self._window
        # shift-left write: static slices only (see class comment) —
        # handles any hop length (stream tails dispatch partial blocks)
        ring = jnp.concatenate(
            [jnp.asarray(state["ring"])[:, frames:], inputs], axis=-1
        )

        # tap delays: phase p in [0,1) maps to delay d = p*span where
        # span = W - W/8 — the slack keeps every read clear of the region
        # just written this block (otherwise near-wrap taps would read
        # same-block "future" samples and the output would depend on the
        # block chunking; blocks up to W/8 are exactly chunk-invariant).
        # Both taps advance phase at (1 - ratio)/span per sample so the
        # delay drifts at exactly (1 - ratio): the pitch ratio.
        span = jnp.float32(w - w // 8)
        t = jnp.arange(1, frames + 1, dtype=jnp.int32).astype(jnp.float32)
        dphase = (jnp.float32(1.0) - params["ratio"]) / span
        phases_a = jnp.mod(state["phase"] + t * dphase, 1.0)  # [F]
        phases_b = jnp.mod(phases_a + 0.5, 1.0)

        # sample positions: output sample k is ring index w-frames+k
        # ("now"); read at now - delay.  delay <= span = w - w/8 and
        # w >= 8F keep pos in [w/8 - F, w-1] — always in-bounds, no mod.
        now = jnp.float32(w - frames) + t - 1.0

        def tap(phases):
            pos = now - phases * span
            i0 = jnp.floor(pos)
            frac = pos - i0
            i0 = i0.astype(jnp.int32)
            # pos == w-1 exactly gives i1 == w with frac == 0: clamp
            i1 = jnp.minimum(i0 + 1, w - 1)
            if trace_mode.MOSAIC:
                # Mosaic-safe tap: flatten channels into a rank-1 index
                # and gather through the 128-wide tiled decomposition
                # (ops/gather.py); eligibility is gated on the unroll
                # cost in __init__, so this only traces for small rings.
                from ..ops.gather import mosaic_gather_1d

                # lane-pad before the channel flatten (unaligned lane
                # reshapes crash the TPU compiler — see mod_effects.py);
                # the window is a power of two so this only fires for
                # sub-128 windows
                pad = (-w) % 128
                ring_g = (jnp.concatenate(
                    [ring, jnp.zeros((ch, pad), jnp.float32)], axis=-1)
                    if pad else ring)
                wp = w + pad
                flat = ring_g.reshape(ch * wp)
                offs = (jnp.arange(ch, dtype=jnp.int32) * wp)[:, None]
                idx = jnp.concatenate([
                    (offs + i0[None, :]).reshape(-1),
                    (offs + i1[None, :]).reshape(-1),
                ])
                g2 = mosaic_gather_1d(flat, idx)
                s0 = g2[: ch * frames].reshape(ch, frames)
                s1 = g2[ch * frames:].reshape(ch, frames)
            else:
                s0 = ring[:, i0]
                s1 = ring[:, i1]
            y = s0 + (s1 - s0) * frac[None, :]
            # triangular crossfade: silent at the wrap (phase 0/1),
            # loudest mid-cycle; A^2-weights + B's sum to unit power
            gain = jnp.float32(1.0) - jnp.abs(
                jnp.float32(2.0) * phases - jnp.float32(1.0)
            )
            return y * gain[None, :]

        shifted = tap(phases_a) + tap(phases_b)
        y = inputs + params["mix"] * (shifted - inputs)

        # two-stage reduce: a one-shot multi-axis jnp.all over the wide
        # ring SIGABRTs the TPU compiler under Mosaic (probed
        # 2026-08-19); per-lane then per-channel compiles
        line_quiet = jnp.all(
            jnp.all(jnp.abs(state["ring"]) < 1e-12, axis=-1)
        )
        all_silent = jnp.all(in_mask) & line_quiet
        y = gate(y, all_silent)
        out_mask = broadcast_flag(all_silent, (ch,))

        new_state = {
            "ring": jnp.where(
                all_silent, jnp.zeros((ch, w), jnp.float32), ring
            ),
            "phase": jnp.where(
                all_silent, jnp.float32(0.0), phases_a[frames - 1]
            ),
        }
        return y, new_state, out_mask


class PitchShiftNode(AudioNode):
    debug_name = "pitch_shift"

    def __init__(
        self,
        semitones: float = 0.0,
        mix: float = 1.0,
        window_secs: float = 0.05,
    ):
        """``semitones``: shift amount (live param; ±12 is an octave).
        ``mix``: dry/wet blend (1.0 = fully shifted).  ``window_secs``:
        grain window (structural; larger = less comb coloration, more
        transient smear — 30–80 ms is the usual range)."""
        self._semitones = float(semitones)
        self._mix = min(max(float(mix), 0.0), 1.0)
        self.window_secs = float(window_secs)

    def semitones(self) -> float:
        return self._semitones

    def set_semitones(self, semitones: float):
        self._semitones = float(semitones)

    def set_mix(self, mix: float):
        self._mix = min(max(float(mix), 0.0), 1.0)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_inputs=1,
            num_max_supported_inputs=MAX_PORTS,
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "PitchShiftNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return PitchShiftProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
