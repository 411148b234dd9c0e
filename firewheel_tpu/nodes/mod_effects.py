"""Modulation effects: chorus / flanger / vibrato (modulated fractional
delay) and tremolo / ring-mod (amplitude modulation).

Beyond the reference's shipped nodes but inside its declared effect-node
scope (``DESIGN_DOC.md:11-28``).  These are the classic game/mixer
modulation family, built on the engine's delay-line + fractional-gather
machinery (the same pattern as ``nodes/pitch_shift.py`` and the binaural
ITD taps):

* :class:`ModDelayNode` — one LFO-swept fractional-delay tap per channel
  (sine LFO, per-channel phase spread for stereo width), dry/wet mix,
  optional feedback.  Presets: :meth:`ModDelayNode.chorus` (~20 ms base,
  no feedback), :meth:`ModDelayNode.flanger` (short base + feedback),
  :meth:`ModDelayNode.vibrato` (100 % wet).
* :class:`TremoloNode` — LFO gain modulation; ``bipolar=True`` turns the
  unipolar tremolo into a ring modulator (carrier swings through zero).

TPU shapes
----------
No feedback: the whole block is ONE vectorized fractional gather —
``concat(line, x)`` then ``take_along_axis`` at per-sample positions —
fully fused, vmap/scan-safe; the LFO phase is carried state so the sweep
is phase-continuous across blocks and chunk-invariant.

Feedback (flanger) makes the line input depend on its own delayed output
— a per-sample recurrence.  Because the tap delay is always ≥ the
minimum base delay, samples closer together than that minimum cannot
interact, so the recurrence is evaluated exactly as a ``lax.scan`` over
**sub-blocks** of ``SUB = 32`` frames (4 sequential steps per 128-frame
block), each step a vectorized gather — the standard block-splitting
decomposition for feedback delays, exact (not an approximation) while
``base_delay ≥ SUB + 1`` samples, which :meth:`collect_params` enforces
by clipping (0.69 ms at 48 kHz; classic flanger bases are 1–5 ms).
"""

from __future__ import annotations

import math

import jax
import numpy as np
import jax.numpy as jnp

from ..core import trace_mode
from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)

__all__ = [
    "ModDelayNode",
    "ModDelayProcessor",
    "TremoloNode",
    "TremoloProcessor",
]

# feedback sub-block length: the exactness bound for the feedback scan
# (see module docstring); also the minimum enforced base delay - 1
_SUB = 32

# NumPy literal, not a jnp array: a module-level device constant would be
# *captured* by the Pallas megakernel closure, which Mosaic rejects
# ("captures constants ... pass them as inputs")
_TWO_PI = np.float32(2.0 * math.pi)


def _lfo_phases(phase, rate, spread, ch, frames):
    """Per-channel per-sample LFO phases ``[ch, F]`` + the carried phase.

    Mosaic-safe by construction (docs/EXTENDING.md playbook): int iota +
    cast (a float-dtype arange emits a float ``tpu.iota`` Mosaic
    rejects), and the carry is recomputed — ``phase + F*rate`` is the
    exact same float ops as ``ph[F-1]``, whose extraction would lower to
    a gather."""
    t = jnp.arange(1, frames + 1, dtype=jnp.int32).astype(jnp.float32)
    ph = phase + t * rate  # [F]
    offs = (
        spread
        * jnp.arange(ch, dtype=jnp.int32).astype(jnp.float32)
        / jnp.float32(max(ch, 1))
    )
    phases = jnp.mod(ph[None, :] + offs[:, None], 1.0)  # [ch, F]
    phase_last = jnp.mod(phase + jnp.float32(frames) * rate, 1.0)
    return phases, phase_last


def _lfo_delay(phases, base, depth):
    """Sine-swept delay in samples: ``base + depth*(0.5 - 0.5*cos)``
    (starts at the *shortest* delay when phase = 0)."""
    return base + depth * (
        jnp.float32(0.5) - jnp.float32(0.5) * jnp.cos(_TWO_PI * phases)
    )


class ModDelayProcessor(NodeProcessor):
    # Megakernel eligibility (round-4 reformulation of the round-3 3-D
    # gather failure): the NO-FEEDBACK kernel emits its fractional tap
    # as a rank-1 gather under trace_mode.MOSAIC (channels flattened
    # into the index), which tile-vmaps to the 2-D gather Mosaic
    # supports.  FEEDBACK mode stays opted out: its sub-block lax.scan
    # emits per-step ys (Mosaic: "num_extensive" NotImplementedError,
    # probed on-chip round 3).
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._fb_mode = node._fb_mode
        # line length: the largest reachable delay + interp headroom
        self._window = int(math.ceil(node._max_delay_secs * sample_rate)) + 2
        if self._fb_mode:
            # feedback mode needs base >= SUB+1 (sub-block exactness) AND
            # base <= w-2 (taps in-bounds): a line shorter than SUB+3
            # would invert the collect_params clamp (np.clip with lo > hi
            # returns hi) and tap out of bounds — grow the line instead
            self._window = max(self._window, _SUB + 3)
        # eligibility: no feedback (the fb sub-block scan emits per-step
        # ys Mosaic rejects) AND a line short enough that the tiled
        # Mosaic gather stays reasonable (ops/gather.py unroll cost)
        from ..ops.gather import gather_unroll_cost

        self.supports_megakernel = (
            not self._fb_mode
            and gather_unroll_cost(
                num_inputs * (self._window + max_block_frames),
                2 * num_inputs * max_block_frames,
            ) <= 256
        )

    def group_key(self):
        return (self._window, self._fb_mode)

    def init_state(self):
        ch = self.num_inputs
        return {
            "line": jnp.zeros((ch, self._window), jnp.float32),
            "phase": jnp.zeros((), jnp.float32),
        }

    def collect_params(self):
        n = self._node
        sr = self.sample_rate
        w = self._window
        # clip the live delay params so every reachable tap stays inside
        # the static line: 1 <= base, base + depth <= W - 2; feedback mode
        # additionally needs base >= SUB + 1 for the sub-block exactness
        lo = float(_SUB + 1) if self._fb_mode else 1.0
        base = float(np.clip(n._base_delay_secs * sr, lo, w - 2))
        depth = float(np.clip(n._depth_secs * sr, 0.0, w - 2 - base))
        return {
            "rate": np.float32(n._rate_hz / sr),  # cycles per sample
            "base": np.float32(base),
            "depth": np.float32(depth),
            "mix": np.float32(n._mix),
            "spread": np.float32(n._phase_spread),
            "feedback": np.float32(n._feedback if self._fb_mode else 0.0),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        ch, frames = inputs.shape
        w = self._window
        phases, phase_last = _lfo_phases(
            state["phase"], params["rate"], params["spread"], ch, frames
        )
        d = _lfo_delay(phases, params["base"], params["depth"])  # [ch, F]

        if not self._fb_mode:
            seq = jnp.concatenate([state["line"], inputs], axis=-1)
            n = jnp.arange(frames, dtype=jnp.int32).astype(jnp.float32)[None, :]
            pos = jnp.float32(w) + n - d  # in [1, w+F-2]
            i0 = jnp.floor(pos)
            frac = pos - i0
            i0 = i0.astype(jnp.int32)
            if trace_mode.MOSAIC:
                # Mosaic-safe tap: flatten channels into a rank-1 index
                # and gather through the 128-wide tiled decomposition
                # (ops/gather.py — tpu.dynamic_gather only compiles one
                # lane tile wide; round 3's direct take_along_axis was a
                # 3-D gather and failed outright).
                from ..ops.gather import mosaic_gather_1d

                # lane-pad before the channel flatten: reshaping an
                # UNALIGNED [ch, wf] into the lane dim crashes the TPU
                # compiler (probed 2026-08-19: [2,1282]→[2564] dies,
                # [2,1408]→[2816] compiles)
                wf = w + frames
                pad = (-wf) % 128
                seq_g = (jnp.concatenate(
                    [seq, jnp.zeros((ch, pad), jnp.float32)], axis=-1)
                    if pad else seq)
                wf += pad
                flat = seq_g.reshape(ch * wf)
                offs = (jnp.arange(ch, dtype=jnp.int32) * wf)[:, None]
                idx = jnp.concatenate([
                    (i0 + offs).reshape(-1), (i0 + 1 + offs).reshape(-1),
                ])
                g2 = mosaic_gather_1d(flat, idx)
                s0 = g2[: ch * frames].reshape(ch, frames)
                s1 = g2[ch * frames:].reshape(ch, frames)
            else:
                s0 = jnp.take_along_axis(seq, i0, axis=-1)
                s1 = jnp.take_along_axis(seq, i0 + 1, axis=-1)
            tap = s0 + (s1 - s0) * frac
            new_line = seq[:, frames:]
        else:
            # exact feedback via sub-block scan (see module docstring):
            # every tap position falls strictly before the current
            # sub-block because d >= SUB + 1 > S - 1 + 1
            s = min(_SUB, frames)
            n_sub = -(-frames // s)  # ceil
            pad = n_sub * s - frames
            if pad:
                # pad the tail sub-block; d pads to base (stays in-bounds).
                # Pad samples pollute only the scan-internal line AFTER the
                # last real sample, so no real tap ever reads one; the
                # carried line is rebuilt below from the unpadded writes.
                inputs_p = jnp.pad(inputs, ((0, 0), (0, pad)))
                d_p = jnp.concatenate(
                    [d, jnp.broadcast_to(params["base"], (ch, pad))], axis=-1
                )
            else:
                inputs_p, d_p = inputs, d
            xs = {
                "x": jnp.moveaxis(
                    inputs_p.reshape(ch, n_sub, s), 1, 0
                ),  # [n_sub, ch, s]
                "d": jnp.moveaxis(d_p.reshape(ch, n_sub, s), 1, 0),
            }
            nloc = jnp.arange(s, dtype=jnp.int32).astype(jnp.float32)[None, :]
            fb = params["feedback"]

            def sub_step(line, x):
                pos = jnp.float32(w) + nloc - x["d"]  # < w: all history
                i0 = jnp.floor(pos)
                frac = pos - i0
                i0 = i0.astype(jnp.int32)
                s0 = jnp.take_along_axis(line, i0, axis=-1)
                s1 = jnp.take_along_axis(line, i0 + 1, axis=-1)
                tap = s0 + (s1 - s0) * frac
                written = x["x"] + fb * tap
                line = jnp.concatenate([line[:, s:], written], axis=-1)
                return line, (tap, written)

            _, (taps, writes) = jax.lax.scan(sub_step, state["line"], xs)
            tap = jnp.moveaxis(taps, 0, 1).reshape(ch, n_sub * s)[:, :frames]
            written = jnp.moveaxis(writes, 0, 1).reshape(ch, n_sub * s)[
                :, :frames
            ]
            new_line = jnp.concatenate([state["line"], written], axis=-1)[
                :, frames:
            ]

        y = inputs + params["mix"] * (tap - inputs)

        line_quiet = jnp.all(jnp.abs(state["line"]) < 1e-10, axis=-1)
        out_mask = in_mask & line_quiet
        y = gate(y, out_mask)
        new_state = {"line": new_line, "phase": phase_last}
        return y, new_state, out_mask


class ModDelayNode(AudioNode):
    """LFO-modulated fractional delay (chorus / flanger / vibrato).

    ``feedback=None`` selects the vectorized no-feedback program (chorus,
    vibrato); any float (including 0.0) selects the feedback program with
    ``feedback`` as a live param (flanger).  The reachable delay ceiling
    ``max_delay_secs`` is structural (it sizes the line); rate / base /
    depth / mix / spread / feedback are live.
    """

    debug_name = "mod_delay"

    def __init__(
        self,
        rate_hz: float = 0.8,
        base_delay_secs: float = 0.020,
        depth_secs: float = 0.005,
        mix: float = 0.5,
        phase_spread: float = 0.25,
        feedback: float | None = None,
        max_delay_secs: float | None = None,
    ):
        self._rate_hz = float(np.clip(rate_hz, 0.0, 20.0))
        self._base_delay_secs = max(float(base_delay_secs), 0.0)
        self._depth_secs = max(float(depth_secs), 0.0)
        self._mix = min(max(float(mix), 0.0), 1.0)
        self._phase_spread = min(max(float(phase_spread), 0.0), 1.0)
        self._fb_mode = feedback is not None
        self._feedback = float(np.clip(feedback or 0.0, -0.95, 0.95))
        if max_delay_secs is None:
            max_delay_secs = self._base_delay_secs + self._depth_secs
        self._max_delay_secs = max(
            float(max_delay_secs),
            self._base_delay_secs + self._depth_secs,
            1e-3,
        )

    # -- presets ---------------------------------------------------------
    @classmethod
    def chorus(cls, rate_hz=0.8, depth_secs=0.004, mix=0.5):
        return cls(rate_hz, 0.020, depth_secs, mix, phase_spread=0.25)

    @classmethod
    def flanger(cls, rate_hz=0.25, depth_secs=0.003, mix=0.5, feedback=0.6):
        return cls(rate_hz, 0.0015, depth_secs, mix, phase_spread=0.0,
                   feedback=feedback)

    @classmethod
    def vibrato(cls, rate_hz=5.0, depth_secs=0.003):
        return cls(rate_hz, 0.005, depth_secs, mix=1.0, phase_spread=0.0)

    # -- live params -------------------------------------------------------
    def set_rate_hz(self, v: float):
        self._rate_hz = float(np.clip(v, 0.0, 20.0))

    def set_base_delay_secs(self, v: float):
        self._base_delay_secs = max(float(v), 0.0)

    def set_depth_secs(self, v: float):
        self._depth_secs = max(float(v), 0.0)

    def set_mix(self, v: float):
        self._mix = min(max(float(v), 0.0), 1.0)

    def set_phase_spread(self, v: float):
        self._phase_spread = min(max(float(v), 0.0), 1.0)

    def set_feedback(self, v: float):
        if not self._fb_mode:
            raise ValueError(
                "this ModDelayNode was built without feedback "
                "(pass feedback=0.0 at construction to enable the "
                "feedback program)"
            )
        self._feedback = float(np.clip(v, -0.95, 0.95))

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
                "ModDelayNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return ModDelayProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class TremoloProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node

    def group_key(self):
        return (self._node._bipolar,)

    def init_state(self):
        return {"phase": jnp.zeros((), jnp.float32)}

    def collect_params(self):
        n = self._node
        return {
            "rate": np.float32(n._rate_hz / self.sample_rate),
            "depth": np.float32(n._depth),
            "spread": np.float32(n._phase_spread),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        ch, frames = inputs.shape
        phases, phase_last = _lfo_phases(
            state["phase"], params["rate"], params["spread"], ch, frames
        )
        carrier = jnp.cos(_TWO_PI * phases)
        if self._node._bipolar:
            # ring mod at depth 1: y = x * cos
            g = jnp.float32(1.0) - params["depth"] + params["depth"] * carrier
        else:
            # unipolar tremolo: gain in [1 - depth, 1]
            g = jnp.float32(1.0) - params["depth"] * (
                jnp.float32(0.5) - jnp.float32(0.5) * carrier
            )
        y = inputs * g
        y = gate(y, in_mask)
        return y, {"phase": phase_last}, in_mask


class TremoloNode(AudioNode):
    """LFO amplitude modulation; ``bipolar=True`` is a ring modulator."""

    debug_name = "tremolo"
    silence_transparent = True  # 0 in -> 0 out, no tail

    def __init__(
        self,
        rate_hz: float = 5.0,
        depth: float = 0.5,
        phase_spread: float = 0.0,
        bipolar: bool = False,
    ):
        self._rate_hz = float(np.clip(rate_hz, 0.0, 20_000.0))
        self._depth = min(max(float(depth), 0.0), 1.0)
        self._phase_spread = min(max(float(phase_spread), 0.0), 1.0)
        self._bipolar = bool(bipolar)

    def set_rate_hz(self, v: float):
        self._rate_hz = float(np.clip(v, 0.0, 20_000.0))

    def set_depth(self, v: float):
        self._depth = min(max(float(v), 0.0), 1.0)

    def set_phase_spread(self, v: float):
        self._phase_spread = min(max(float(v), 0.0), 1.0)

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
                "TremoloNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return TremoloProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
