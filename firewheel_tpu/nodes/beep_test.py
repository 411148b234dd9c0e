"""Beep-test node: a sine generator with a live enable switch.

Reference: ``crates/firewheel-graph/src/basic_nodes/beep_test.rs:8-103`` —
phasor accumulation ``phasor = fract(phasor + freq/sr)`` per sample,
``out = sin(phasor * tau) * gain``, frequency clamped to [20, 20k] Hz and
gain (from dB, clamped at -100 dB) clamped to <= 1 (beep_test.rs:16-17).

TPU-first formulation: the per-sample float32 phasor loop becomes **integer
fixed-point phase**.  Phase is a uint32 where 2^32 == one cycle; per-block
phases are ``phase0 + k*inc`` with natural wraparound, converted to float
only for the sine.  This is deterministic, exactly periodic, vectorizes
perfectly, and is *more* accurate than the reference's float32 accumulator
(which keeps only ~7 significant digits of phase).  The golden CPU reference
in ``tests/reference_dsp.py`` uses the identical fixed-point scheme.

Deviation note: when disabled, the reference clears only channels 1..n and
leaves channel 0 stale due to a ``split_first_mut`` slip
(beep_test.rs:79-86); we implement the evident intent — all channels cleared
and marked silent.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeProcessor,
    MAX_PORTS,
    broadcast_flag,
)
from ..core.units import db_to_gain_clamped_neg_100_db

__all__ = ["BeepTestNode", "BeepTestProcessor"]

_TAU = 6.283185307179586


def phase_inc_fixed(freq_hz: float, sample_rate: int) -> int:
    """Per-sample phase increment in uint32 fixed point (2^32 = one cycle)."""
    return int(round(float(freq_hz) / float(sample_rate) * 2.0**32)) & 0xFFFFFFFF


class BeepTestProcessor(NodeProcessor):
    def __init__(self, node: "BeepTestNode", sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node

    def init_state(self):
        return {"phase": jnp.zeros((), jnp.uint32)}

    def collect_params(self):
        # inc/gain ride as params (not closed-over statics) so identical
        # beep processors group into one vmapped trace (node pooling) and
        # live set_frequency() edits apply on the next dispatch, no retrace
        return {
            "enabled": np.asarray(self._node.enabled(), bool),
            "inc": np.uint32(
                phase_inc_fixed(self._node.freq_hz, self.sample_rate)
            ),
            "gain": np.float32(self._node.gain),
        }

    def group_key(self):
        return ()

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1] if inputs.ndim else self.max_block_frames
        enabled = params["enabled"]
        inc = params["inc"]
        k = jnp.arange(frames, dtype=jnp.uint32)
        phases_q = state["phase"] + k * inc  # uint32 wraparound == fract
        # Signed reinterpretation: phase ∈ [-0.5, 0.5) instead of [0, 1) —
        # identical under the 2π-periodic sine, and it avoids the
        # uint32→f32 cast Mosaic can't lower (megakernel path).
        phase = jax.lax.bitcast_convert_type(phases_q, jnp.int32).astype(
            jnp.float32
        ) * jnp.float32(2.0**-32)
        tone = jnp.sin(phase * jnp.float32(_TAU)) * params["gain"]

        out_row = gate(tone, ~enabled)
        outputs = jnp.broadcast_to(out_row, (self.num_outputs, frames))
        out_mask = broadcast_flag(~enabled, (self.num_outputs,))

        new_phase = state["phase"] + jnp.uint32(frames) * inc
        # The reference freezes its phasor while disabled (the loop is
        # skipped); match that.
        new_phase = jnp.where(enabled, new_phase, state["phase"])
        return outputs, {"phase": new_phase}, out_mask


class BeepTestNode(AudioNode):
    debug_name = "beep_test"

    def __init__(self, freq_hz: float, gain_db: float, enabled: bool = True):
        # Clamps mirror beep_test.rs:16-17.
        self.freq_hz = float(np.clip(freq_hz, 20.0, 20_000.0))
        self.gain = float(
            np.clip(db_to_gain_clamped_neg_100_db(np.float32(gain_db)), 0.0, 1.0)
        )
        self._enabled = bool(enabled)

    def enabled(self) -> bool:
        return self._enabled

    def set_enabled(self, enabled: bool):
        """Live control; staged into the next dispatch (beep_test.rs:30-32)."""
        self._enabled = bool(enabled)

    def is_dormant(self) -> bool:
        """A disabled beep is pure silence — prunable from the schedule
        when ``graph.prune_dormant`` is on (remember to call
        ``graph.notify_dormancy_changed()`` after ``set_enabled``)."""
        return not self._enabled

    def set_frequency(self, freq_hz: float):
        """Live frequency change (same clamp as construction,
        beep_test.rs:16); phase stays continuous — no click, no retrace."""
        self.freq_hz = float(np.clip(freq_hz, 20.0, 20_000.0))

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_outputs=1, num_max_supported_outputs=MAX_PORTS
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        return BeepTestProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
