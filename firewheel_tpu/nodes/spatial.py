"""3D spatializer node: position a mono emitter in the listener's space.

Reference scope: "spatial positioning (make a sound 'emanate' from a point
in 3d space)" (``DESIGN_DOC.md:21``, unimplemented there).  Signal chain:

    mono in → distance gain → air-absorption lowpass → equal-power pan → L/R

* distance gain: inverse-distance rolloff (``ops/pan.spatial_params``);
* air absorption: a one-pole lowpass whose cutoff falls with distance
  (20 kHz at the reference distance down to ~1.2 kHz far away);
* occlusion (``set_occlusion``, 0..1): geometry-driven muffling — the
  obstructed direct path loses up to ``occlusion_db`` of level and its
  cutoff glides geometrically toward ``occlusion_cutoff_hz`` (the
  standard game-engine occlusion model: the game raycasts, the engine
  shades).  Pure param shaping on the host — zero recompiles;
* panning: equal-power from the horizontal azimuth.

Gain and pan ride 10 ms smoothers so moving emitters don't zipper.

``doppler=True`` prepends physical propagation: the mono signal runs
through a fractional-tap delay line whose tap sits ``distance/c`` seconds
back, with the distance ramped per-sample (``motion_smooth_secs``
one-pole).  Moving emitters then get Doppler shift and arrival latency
*physically* — the pitch ratio emerges from the time-varying delay
(f' = f·c/(c−v) for an approaching source) instead of a game-side
playback-rate hack (which remains available for sampler-fed emitters via
``SamplerNode.set_playback_rate``).  The tap gather has no Mosaic
lowering, so the doppler variant opts out of the megakernel
(``supports_megakernel=False``); the hybrid renderer runs it as an exact
XLA stage.
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
        self._doppler = bool(node.doppler)
        if self._doppler:
            # the time-varying fractional tap gather has no Mosaic lowering
            self.supports_megakernel = False
            self._motion_coeffs = smoother_coeffs(
                sample_rate, SmootherConfig(smooth_secs=node.motion_smooth_secs)
            )
            max_tau = node.max_distance_m / node.speed_of_sound * sample_rate
            need = int(np.ceil(max_tau)) + max_block_frames + 4
            self._ring_len = 1 << int(need - 1).bit_length()
            self._tau_per_m = np.float32(sample_rate / node.speed_of_sound)

    def init_state(self):
        # seed the smoothers at the SAME targets collect_params will
        # produce (incl. volume_gain and occlusion attenuation) so a
        # fresh/reset node starts at its configured level instead of
        # ramping down from the bare distance gain for 10 ms
        p = self.collect_params()
        st = {
            "gain": smoother_init(np.float32(p["gain"])),
            "pan": smoother_init(np.float32(p["pan"])),
            "lp": jnp.zeros((), jnp.float32),
        }
        if self._doppler:
            st["dist"] = smoother_init(np.float32(p["dist"]))
            st["ring"] = jnp.zeros((self._ring_len,), jnp.float32)
        return st

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
        # occlusion: attenuate + darken the obstructed direct path; the
        # cutoff interpolates GEOMETRICALLY toward occlusion_cutoff_hz
        # (perceptually even), the level drops linearly in dB
        occ = n._occlusion
        if occ > 0.0:
            gain = gain * float(10.0 ** (-n.occlusion_db * occ / 20.0))
            occ_cut = 20000.0 * (n.occlusion_cutoff_hz / 20000.0) ** occ
            cutoff = min(cutoff, occ_cut)
        b = np.float32(
            np.exp(np.float32(-2.0 * np.pi) * np.float32(cutoff)
                   / np.float32(self.sample_rate))
        )
        out = {
            "gain": np.float32(gain * n.volume_gain),
            "pan": np.float32(pan),
            "lp_b": b,
        }
        if self._doppler:
            out["dist"] = np.float32(
                min(max(dist, 0.0), n.max_distance_m)
            )
        return out

    def group_key(self):
        n = self._node
        key = (n.ref_distance, n.rolloff, self._doppler)
        if self._doppler:
            key += (self._ring_len, n.motion_smooth_secs, n.speed_of_sound)
        return key

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1]
        gain_ramp, gain_state, _ = smoother_set_and_process(
            state["gain"], params["gain"], frames, self._coeffs
        )
        pan_ramp, pan_state, _ = smoother_set_and_process(
            state["pan"], params["pan"], frames, self._coeffs
        )

        x = inputs[0]
        new_state = {}
        tail_live = jnp.abs(state["lp"]) >= 1e-10
        if self._doppler:
            # physical propagation: write this block, read distance/c back
            # with a per-sample-ramped fractional tap (Doppler falls out of
            # the time-varying delay)
            dist_ramp, dist_state, _ = smoother_set_and_process(
                state["dist"], params["dist"], frames, self._motion_coeffs
            )
            ring = jnp.concatenate([state["ring"][frames:], x])
            R = self._ring_len
            tau = dist_ramp * self._tau_per_m
            base = jnp.arange(frames, dtype=jnp.int32).astype(jnp.float32)
            pos = jnp.clip(
                jnp.float32(R - frames) + base - tau,
                jnp.float32(0.0),
                jnp.float32(R - 2),
            )
            i0 = jnp.floor(pos)
            w = pos - i0
            i0 = i0.astype(jnp.int32)
            x = ring[i0] * (jnp.float32(1.0) - w) + ring[i0 + 1] * w
            new_state["dist"] = dist_state
            new_state["ring"] = ring
            # the line holds sound in flight: stay audible until it drains
            tail_live = tail_live | (
                jnp.max(jnp.abs(state["ring"])) >= 1e-10
            )

        x = x * gain_ramp
        b = params["lp_b"]
        a = jnp.float32(1.0) - b
        x, lp_last = one_pole_scan(x, state["lp"], a, b)

        gl, gr = equal_power_gains(pan_ramp)
        out = jnp.stack([x * gl, x * gr])

        all_silent = jnp.all(in_mask) & ~tail_live
        out = gate(out, all_silent)
        out_mask = broadcast_flag(all_silent, (2,))

        def sel(reset, processed):
            return jax.tree.map(
                lambda r, p: jnp.where(all_silent, r, p), reset, processed
            )

        new_state.update(
            gain=sel(smoother_init(params["gain"]), gain_state),
            pan=sel(smoother_init(params["pan"]), pan_state),
            lp=jnp.where(all_silent, jnp.float32(0.0), lp_last),
        )
        if self._doppler:
            new_state["dist"] = sel(
                smoother_init(params["dist"]), new_state["dist"]
            )
        return out, new_state, out_mask


class Spatializer3DNode(AudioNode):
    debug_name = "spatializer_3d"

    def __init__(
        self,
        position=(0.0, 0.0, -1.0),
        volume_gain: float = 1.0,
        ref_distance: float = 1.0,
        rolloff: float = 1.0,
        doppler: bool = False,
        speed_of_sound: float = 343.0,
        max_distance_m: float = 100.0,
        motion_smooth_secs: float = 0.05,
        occlusion_db: float = 18.0,
        occlusion_cutoff_hz: float = 350.0,
    ):
        """``position``: emitter position relative to the listener
        (listener frame: +x right, +y up, −z forward).

        ``doppler``: physical propagation delay + Doppler via a moving
        fractional tap (see module docstring).  Structural — toggling it
        re-activates the node.  ``max_distance_m`` bounds the delay line
        (distances clamp to it); ``motion_smooth_secs`` is the one-pole
        time constant per-sample position changes ramp with — it sets how
        quickly velocity (and thus pitch) responds to ``set_position``."""
        self._position = tuple(float(v) for v in position)
        self.volume_gain = float(volume_gain)
        self.ref_distance = float(ref_distance)
        self.rolloff = float(rolloff)
        self.doppler = bool(doppler)
        self.speed_of_sound = max(float(speed_of_sound), 1.0)
        self.max_distance_m = max(float(max_distance_m), 1.0)
        self.motion_smooth_secs = max(float(motion_smooth_secs), 1e-4)
        self.occlusion_db = max(float(occlusion_db), 0.0)
        self.occlusion_cutoff_hz = min(
            max(float(occlusion_cutoff_hz), 20.0), 20000.0
        )
        self._occlusion = 0.0

    def position(self):
        return self._position

    def set_position(self, position):
        """Live emitter move; staged into the next dispatch."""
        self._position = tuple(float(v) for v in position)

    def set_volume_gain(self, gain: float):
        self.volume_gain = max(float(gain), 0.0)

    def set_occlusion(self, occlusion: float):
        """Obstruction amount in [0, 1] from the game's geometry query
        (0 = clear line of sight, 1 = fully occluded).  Live param — the
        gain change rides the 10 ms smoother, the cutoff applies next
        block."""
        self._occlusion = min(max(float(occlusion), 0.0), 1.0)

    def occlusion(self) -> float:
        return self._occlusion

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
