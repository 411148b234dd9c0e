"""dB meter node: per-channel peak and RMS metering with host readback.

Reference scope: "decibel meter" (``DESIGN_DOC.md:24``, unimplemented there;
only the ``gain_to_db`` utilities exist, util.rs:13-15).

The kernel is a passthrough that folds peak/RMS statistics into its state:

* ``peak``: per-block max |x| with exponential release (~300 ms) so the
  reading decays smoothly;
* ``rms_sq``: one-pole smoothed mean-square (~125 ms window).

Readback: meter values live in the executor's state pytree; the processor
exposes them via :meth:`GraphProcessor.node_state`, and
:meth:`DbMeterNode.read` converts to dBFS with the reference's −100 dB
clamp semantics (util.rs:35-41).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..core.node import AudioNode, AudioNodeInfo, NodeActivationError, NodeProcessor, MAX_PORTS
from ..core.units import gain_to_db_clamped_neg_100_db

__all__ = ["DbMeterNode", "DbMeterProcessor"]


class DbMeterProcessor(NodeProcessor):
    PEAK_RELEASE_SECS = 0.3
    RMS_WINDOW_SECS = 0.125

    def __init__(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        block_secs = max_block_frames / sample_rate
        self._peak_decay = np.float32(
            math.exp(-block_secs / self.PEAK_RELEASE_SECS)
        )
        self._rms_alpha = np.float32(
            1.0 - math.exp(-block_secs / self.RMS_WINDOW_SECS)
        )

    def init_state(self):
        ch = self.num_inputs
        return {
            "peak": jnp.zeros((ch,), jnp.float32),
            "rms_sq": jnp.zeros((ch,), jnp.float32),
        }

    def group_key(self):
        return ()

    def kernel(self, params, state, inputs, in_mask, info):
        block_peak = jnp.max(jnp.abs(inputs), axis=-1)
        peak = jnp.maximum(block_peak, state["peak"] * self._peak_decay)
        block_ms = jnp.mean(inputs * inputs, axis=-1)
        rms_sq = state["rms_sq"] + self._rms_alpha * (
            block_ms - state["rms_sq"]
        )
        return (
            inputs,
            {"peak": peak, "rms_sq": rms_sq},
            in_mask,
        )


class DbMeterNode(AudioNode):
    debug_name = "db_meter"

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_inputs=1,
            num_max_supported_inputs=MAX_PORTS,
            num_min_supported_outputs=0,
            num_max_supported_outputs=MAX_PORTS,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_outputs not in (0, num_inputs):
            raise NodeActivationError(
                "DbMeterNode passes audio through: num_outputs must equal "
                f"num_inputs (or 0 for a pure sink); got {num_inputs} in, "
                f"{num_outputs} out"
            )
        if num_outputs == 0:
            return _SinkMeterProcessor(
                sample_rate, max_block_frames, num_inputs, num_outputs
            )
        return DbMeterProcessor(
            sample_rate, max_block_frames, num_inputs, num_outputs
        )

    # -- readback -------------------------------------------------------------
    @staticmethod
    def read(meter_state) -> dict:
        """Interpret a meter state pytree (from
        ``GraphProcessor.node_state`` / ``FirewheelCtx.node_state``) →
        ``{"peak_db": f32[ch], "rms_db": f32[ch]}``, −100 dB floor."""
        peak = np.asarray(meter_state["peak"], np.float32)
        rms = np.sqrt(np.asarray(meter_state["rms_sq"], np.float32))
        return {
            "peak_db": gain_to_db_clamped_neg_100_db(peak),
            "rms_db": gain_to_db_clamped_neg_100_db(rms),
        }


class _SinkMeterProcessor(DbMeterProcessor):
    """Meter as a graph sink (0 outputs)."""

    def kernel(self, params, state, inputs, in_mask, info):
        out, st, _ = super().kernel(params, state, inputs, in_mask, info)
        return (
            jnp.zeros((0, inputs.shape[-1]), jnp.float32),
            st,
            jnp.zeros((0,), bool),
        )
