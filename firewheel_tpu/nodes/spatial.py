"""3D spatializer node: position a mono emitter in the listener's space.

Reference scope: "spatial positioning (make a sound 'emanate' from a point
in 3d space)" (``DESIGN_DOC.md:21``, unimplemented there).  Signal chain:

    mono in → distance gain → air-absorption lowpass → equal-power pan → L/R

* distance gain: inverse-distance rolloff (``ops/pan.spatial_params``);
* air absorption: a one-pole lowpass whose cutoff falls with distance
  (20 kHz at the reference distance down to ~1.2 kHz far away);
* panning: equal-power from the horizontal azimuth.

Gain and pan ride 10 ms smoothers so moving emitters don't zipper.  Doppler
belongs to the sampler's playback-rate control (``SamplerNode.
set_playback_rate``), which the game drives from radial velocity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.node import (
    gate,
    broadcast_flag,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
)
from ..core.smoother import (
    SmootherConfig,
    smoother_coeffs,
    smoother_init,
    smoother_set_and_process,
)
from ..ops.iir import one_pole_scan
from ..ops.pan import equal_power_gains, spatial_params

__all__ = ["Spatializer3DNode", "Spatializer3DProcessor"]


class Spatializer3DProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._coeffs = smoother_coeffs(sample_rate, SmootherConfig())

    def init_state(self):
        gain, pan, _ = self._host_spatial()
        return {
            "gain": smoother_init(np.float32(gain)),
            "pan": smoother_init(np.float32(pan)),
            "lp": jnp.zeros((), jnp.float32),
        }

    def _host_spatial(self):
        n = self._node
        gain, pan, dist = spatial_params(
            np.asarray(n._position, np.float32),
            ref_distance=n.ref_distance,
            rolloff=n.rolloff,
        )
        return float(gain), float(pan), float(dist)

    def collect_params(self):
        n = self._node
        gain, pan, dist = self._host_spatial()
        # air absorption: cutoff shrinks with distance
        cutoff = 20000.0 / (1.0 + 0.5 * max(dist - n.ref_distance, 0.0))
        b = np.float32(
            np.exp(np.float32(-2.0 * np.pi) * np.float32(cutoff) / np.float32(self.sample_rate))
        )
        return {
            "gain": np.float32(gain * n.volume_gain),
            "pan": np.float32(pan),
            "lp_b": b,
        }

    def group_key(self):
        return (self._node.ref_distance, self._node.rolloff)

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1]
        gain_ramp, gain_state, _ = smoother_set_and_process(
            state["gain"], params["gain"], frames, self._coeffs
        )
        pan_ramp, pan_state, _ = smoother_set_and_process(
            state["pan"], params["pan"], frames, self._coeffs
        )

        x = inputs[0] * gain_ramp
        b = params["lp_b"]
        a = jnp.float32(1.0) - b
        x, lp_last = one_pole_scan(x, state["lp"], a, b)

        gl, gr = equal_power_gains(pan_ramp)
        out = jnp.stack([x * gl, x * gr])

        all_silent = jnp.all(in_mask) & (jnp.abs(state["lp"]) < 1e-10)
        out = gate(out, all_silent)
        out_mask = broadcast_flag(all_silent, (2,))

        def sel(reset, processed):
            return jax.tree.map(
                lambda r, p: jnp.where(all_silent, r, p), reset, processed
            )

        new_state = {
            "gain": sel(smoother_init(params["gain"]), gain_state),
            "pan": sel(smoother_init(params["pan"]), pan_state),
            "lp": jnp.where(all_silent, jnp.float32(0.0), lp_last),
        }
        return out, new_state, out_mask


class Spatializer3DNode(AudioNode):
    debug_name = "spatializer_3d"

    def __init__(
        self,
        position=(0.0, 0.0, -1.0),
        volume_gain: float = 1.0,
        ref_distance: float = 1.0,
        rolloff: float = 1.0,
    ):
        """``position``: emitter position relative to the listener
        (listener frame: +x right, +y up, −z forward)."""
        self._position = tuple(float(v) for v in position)
        self.volume_gain = float(volume_gain)
        self.ref_distance = float(ref_distance)
        self.rolloff = float(rolloff)

    def position(self):
        return self._position

    def set_position(self, position):
        """Live emitter move; staged into the next dispatch."""
        self._position = tuple(float(v) for v in position)

    def set_volume_gain(self, gain: float):
        self.volume_gain = max(float(gain), 0.0)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_inputs=1,
            num_max_supported_inputs=1,
            num_min_supported_outputs=2,
            num_max_supported_outputs=2,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != 1 or num_outputs != 2:
            raise NodeActivationError(
                "Spatializer3DNode takes 1 (mono) input and 2 outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return Spatializer3DProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
