"""Waveshaper node: memoryless nonlinear distortion with optional DC blocker.

Beyond the reference's shipped nodes but inside its declared effect-node
scope (``DESIGN_DOC.md:11-28``; the reference ships only ``HardClipNode``,
``basic_nodes/hard_clip.rs`` — this is that node's family generalized).
Five classic transfer curves, drive/output gains and dry/wet mix as live
params, the curve itself structural (it selects the traced math):

* ``tanh``  — ``y = tanh(g·x)`` (smooth saturation)
* ``atan``  — ``y = (2/π)·atan(g·x)`` (slightly brighter knee)
* ``soft``  — cubic soft clip ``y = 1.5t − 0.5t³, t = clip(g·x, ±1)``
  (polynomial — bandwidth-limited harmonics, the gentlest aliasing)
* ``hard``  — ``y = clip(g·x, ±1)`` (the reference's hard clip with drive)
* ``fold``  — triangle wavefolder (West-coast folding into [−1, 1])

TPU shape: pure elementwise VPU math, fused by XLA into whatever feeds
it; zero state unless the DC blocker is on.  Asymmetric curves and
wavefolding generate DC offset — ``dc_block=True`` adds a one-pole DC
blocker (``y[n] = x[n] − x[n−1] + R·y[n−1]``, −3 dB ≈ 20 Hz) evaluated
with the same log-depth affine scan as every engine IIR (``ops/iir.py``).

Aliasing note: shaping is not oversampled — harmonics past Nyquist fold
back, the standard game-engine trade.  ``soft`` (cubic, ≤ 3rd harmonic)
stays clean the furthest; reach for it first at high drive.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)
from ..core.units import db_to_gain
from ..ops.iir import one_pole_scan

__all__ = ["WaveshaperNode", "WaveshaperProcessor", "SHAPES"]

SHAPES = ("tanh", "atan", "soft", "hard", "fold")


def _shape(curve: str, x):
    if curve == "tanh":
        return jnp.tanh(x)
    if curve == "atan":
        return jnp.float32(2.0 / math.pi) * jnp.arctan(x)
    if curve == "soft":
        t = jnp.clip(x, -1.0, 1.0)
        return jnp.float32(1.5) * t - jnp.float32(0.5) * t * t * t
    if curve == "hard":
        return jnp.clip(x, -1.0, 1.0)
    if curve == "fold":
        # triangle fold: periodic in x with period 4, passes through the
        # identity on [-1, 1], folds every excursion back into [-1, 1]
        # (f(-1)=-1, f(0)=0, f(1)=1, f(2)=0, f(3)=-1, ...)
        return (
            jnp.abs(jnp.mod(x - jnp.float32(1.0), jnp.float32(4.0)) - jnp.float32(2.0))
            - jnp.float32(1.0)
        )
    raise AssertionError(curve)


class WaveshaperProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        # one-pole DC-blocker pole for ~20 Hz highpass
        self._dc_r = float(np.exp(-2.0 * math.pi * 20.0 / sample_rate))

    def group_key(self):
        return (self._node.curve, self._node._dc_block)

    def init_state(self):
        if not self._node._dc_block:
            return ()
        ch = self.num_inputs
        return {
            "x1": jnp.zeros((ch,), jnp.float32),
            "y1": jnp.zeros((ch,), jnp.float32),
        }

    def collect_params(self):
        n = self._node
        return {
            "drive": np.float32(db_to_gain(np.float32(n._drive_db))),
            "out": np.float32(db_to_gain(np.float32(n._output_db))),
            "mix": np.float32(n._mix),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        shaped = _shape(self._node.curve, inputs * params["drive"])
        frames = inputs.shape[-1]

        if self._node._dc_block:
            # y[n] = (x[n] - x[n-1]) + R*y[n-1]: affine scan with v = Δx
            # (positive static indices only: [..., -1] lowers to a gather
            # Mosaic rejects — see ops/iir.py:biquad_scan)
            x_prev = jnp.concatenate(
                [state["x1"][..., None], shaped[..., : frames - 1]], axis=-1
            )
            v = shaped - x_prev
            y, y_last = one_pole_scan(v, state["y1"], 1.0, self._dc_r)
            new_state = {"x1": shaped[..., frames - 1], "y1": y_last}
            shaped = y
            # a silent input still drains the blocker's tail
            state_quiet = (jnp.abs(state["x1"]) < 1e-10) & (
                jnp.abs(state["y1"]) < 1e-10
            )
            out_mask = in_mask & state_quiet
        else:
            new_state = ()
            out_mask = in_mask  # every curve maps 0 -> 0

        y = (inputs + params["mix"] * (shaped - inputs)) * params["out"]
        y = gate(y, out_mask)
        return y, new_state, out_mask


class WaveshaperNode(AudioNode):
    """Memoryless distortion/saturation (see module docstring for curves).

    ``drive_db``/``output_db``/``mix`` are live params; ``curve`` and
    ``dc_block`` are structural (they change the traced program).
    """

    debug_name = "waveshaper"

    def __init__(
        self,
        curve: str = "tanh",
        drive_db: float = 0.0,
        output_db: float = 0.0,
        mix: float = 1.0,
        dc_block: bool = False,
    ):
        assert curve in SHAPES, f"unknown curve {curve!r}; one of {SHAPES}"
        self.curve = curve
        self._drive_db = float(drive_db)
        self._output_db = float(output_db)
        self._mix = min(max(float(mix), 0.0), 1.0)
        self._dc_block = bool(dc_block)
        # 0 in -> 0 out and (without the blocker) no tail: prunable
        self.silence_transparent = not dc_block

    def drive_db(self) -> float:
        return self._drive_db

    def set_drive_db(self, db: float):
        self._drive_db = float(db)

    def set_output_db(self, db: float):
        self._output_db = float(db)

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
                "WaveshaperNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return WaveshaperProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
