"""Binaural 3D spatializer: structural HRTF (ITD + head shadow), no data.

Reference scope: "spatial positioning (make a sound 'emanate' from a point
in 3d space)" (``DESIGN_DOC.md:21``, unimplemented there).  Where
``Spatializer3DNode`` renders for speakers (equal-power panning), this
node renders for **headphones** using the classic Brown–Duda structural
model — fully parametric, so no HRTF datasets ship with the engine:

* **ITD** (interaural time difference), Woodworth's spherical-head ray
  model: for incidence angle ``θ`` from an ear's axis,
  ``τ(θ) = −(a/c)·cos θ`` on the near side and ``(a/c)·(θ − π/2)`` in the
  shadow zone, offset by the constant ``a/c`` to stay causal
  (max ≈ 0.66 ms at head radius a = 8.75 cm).  Applied as a per-sample
  **fractional delay** (linear-interp gather on a short carried line),
  with the delay value riding a 10 ms smoother so moving emitters glide
  instead of clicking.
* **ILD / head shadow**, Brown–Duda one-pole/one-zero:
  ``H(s) = (1 + α·s/(2ω₀)) / (1 + s/(2ω₀))``, ``ω₀ = c/a``,
  ``α(θ) = 1 + cos θ`` — a gentle high-shelf boost toward the facing ear
  (α→2) and a high-frequency rolloff behind the head (α→0).  Bilinear-
  discretized per block on the host; block-rate coefficient updates (the
  standard trade-off, same as ``FilterNode``).
* distance gain + air absorption identical to ``Spatializer3DNode``
  (inverse-distance law; one-pole lowpass whose cutoff falls with
  distance).

All three cues derive from the emitter position (a live param — moving an
emitter never retraces).  The per-ear incidence angle uses the full 3D
direction, so elevation shades the cues naturally (both ITD and ILD
collapse toward symmetric as the source moves overhead).
"""

from __future__ import annotations

import math

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
from ..ops.pan import spatial_params

__all__ = ["BinauralSpatializerNode", "BinauralSpatializerProcessor"]

_SPEED_OF_SOUND = 343.0  # m/s


def _itd_seconds(cos_theta: float, head_radius: float) -> float:
    """Woodworth ray-traced delay for incidence angle θ from the ear axis,
    shifted by +a/c so every delay is causal (0 at the facing pole)."""
    a_c = head_radius / _SPEED_OF_SOUND
    theta = math.acos(max(-1.0, min(1.0, cos_theta)))
    if theta < math.pi / 2:
        tau = -a_c * math.cos(theta)
    else:
        tau = a_c * (theta - math.pi / 2)
    return a_c + tau


def _shadow_coeffs(cos_theta: float, head_radius: float, sample_rate: float):
    """Bilinear transform of the Brown–Duda head-shadow section.

    ``H(s) = (1 + α·s/(2ω₀)) / (1 + s/(2ω₀))`` with ``ω₀ = c/a`` and
    ``α = 1 + cos θ`` discretizes (s = 2·sr·(1−z⁻¹)/(1+z⁻¹)) to
    ``y[n] = b0·x[n] + b1·x[n−1] − a1·y[n−1]`` with ``g = sr/ω₀``:
    b0 = (1+αg)/(1+g), b1 = (1−αg)/(1+g), a1 = (1−g)/(1+g).
    """
    alpha = 1.0 + max(-1.0, min(1.0, cos_theta))
    omega0 = _SPEED_OF_SOUND / head_radius
    g = sample_rate / omega0
    inv = 1.0 / (1.0 + g)
    return (
        (1.0 + alpha * g) * inv,
        (1.0 - alpha * g) * inv,
        (1.0 - g) * inv,
    )


class BinauralSpatializerProcessor(NodeProcessor):
    supports_megakernel = False  # HRTF fractional-delay gathers + conv
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._coeffs = smoother_coeffs(sample_rate, SmootherConfig())
        # causal delay span: a/c·(1 + π/2), plus interp/headroom samples
        max_delay = (
            node.head_radius / _SPEED_OF_SOUND * (1.0 + math.pi / 2.0)
        )
        self._dline = int(math.ceil(max_delay * sample_rate)) + 2

    def group_key(self):
        # kernels are identical across instances given equal delay-line
        # span (head radius is static per node; radius differences change
        # self._dline and thus the traced shapes)
        return (self._dline,)

    def init_state(self):
        gain, dl, dr, *_ = self._host_params()
        return {
            "gain": smoother_init(np.float32(gain)),
            "del_l": smoother_init(np.float32(dl)),
            "del_r": smoother_init(np.float32(dr)),
            "dline": np.zeros((self._dline,), np.float32),
            "xprev": np.zeros((2,), np.float32),
            "yprev": np.zeros((2,), np.float32),
            "lp": np.zeros((), np.float32),
        }

    def _host_params(self):
        """Position → all per-block scalars (host-side numpy: runs per
        emitter per dispatch while staging — device math here would
        dominate large scenes)."""
        n = self._node
        gain, _, dist = spatial_params(
            np.asarray(n._position, np.float32),
            ref_distance=n.ref_distance,
            rolloff=n.rolloff,
        )
        gain = float(gain) * n.volume_gain
        p = np.asarray(n._position, np.float64)
        d = float(np.sqrt(np.sum(p * p)))
        ux = p[0] / d if d > 1e-9 else 0.0
        # incidence angle from each ear's axis (right ear axis = +x)
        cos_r, cos_l = ux, -ux
        sr = self.sample_rate
        dl = _itd_seconds(cos_l, n.head_radius) * sr
        dr = _itd_seconds(cos_r, n.head_radius) * sr
        bl = _shadow_coeffs(cos_l, n.head_radius, sr)
        br = _shadow_coeffs(cos_r, n.head_radius, sr)
        # air absorption: cutoff falls with distance (same law and
        # coefficient as spatial.py:71 so speaker and headphone renderers
        # of one emitter agree on distance filtering)
        cutoff = 20000.0 / (1.0 + 0.5 * max(dist - n.ref_distance, 0.0))
        lp_b = math.exp(-2.0 * math.pi * cutoff / sr)
        return gain, dl, dr, bl, br, lp_b

    def collect_params(self):
        gain, dl, dr, bl, br, lp_b = self._host_params()
        return {
            "gain": np.float32(gain),
            "del_l": np.float32(dl),
            "del_r": np.float32(dr),
            # [ear, (b0, b1, a1)] — left = row 0, right = row 1
            "shadow": np.asarray([bl, br], np.float32),
            "lp_b": np.float32(lp_b),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1]
        d = self._dline

        gain_ramp, gain_state, _ = smoother_set_and_process(
            state["gain"], params["gain"], frames, self._coeffs
        )
        dl_ramp, dl_state, _ = smoother_set_and_process(
            state["del_l"], params["del_l"], frames, self._coeffs
        )
        dr_ramp, dr_state, _ = smoother_set_and_process(
            state["del_r"], params["del_r"], frames, self._coeffs
        )

        x = inputs[0] * gain_ramp
        b = params["lp_b"]
        x, lp_last = one_pole_scan(x, state["lp"], jnp.float32(1.0) - b, b)

        # fractional ITD: gather the mono line at per-sample delayed
        # positions (linear interp); delays are smoothed so glides are
        # click-free.  positions stay in [0, D+F-1] by construction
        # (delay <= D-2), clip for safety.
        buf = jnp.concatenate([state["dline"], x])  # [D + F]
        t = jnp.arange(frames, dtype=jnp.int32).astype(jnp.float32)

        def ear(delay_ramp):
            pos = jnp.clip(
                jnp.float32(d) + t - delay_ramp, 0.0, jnp.float32(d + frames - 1)
            )
            i0 = jnp.floor(pos)
            w = pos - i0
            i0 = i0.astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, d + frames - 1)
            s0 = buf[i0]
            s1 = buf[i1]
            return s0 + (s1 - s0) * w

        xe = jnp.stack([ear(dl_ramp), ear(dr_ramp)])  # [2, F]

        # head shadow: y[n] = b0 x[n] + b1 x[n-1] - a1 y[n-1] per ear
        sh = params["shadow"]  # [2, 3]
        b0 = sh[:, 0:1]
        b1 = sh[:, 1:2]
        a1 = sh[:, 2:3]
        xe_prev = jnp.concatenate([state["xprev"][:, None], xe[:, :-1]], axis=-1)
        w = b0 * xe + b1 * xe_prev
        # -a1 keeps its [2, 1] shape so it broadcasts over [2, F]
        y, yprev = one_pole_scan(w, state["yprev"], jnp.float32(1.0), -a1)

        line_quiet = (
            jnp.all(jnp.abs(state["dline"]) < 1e-12)
            & (jnp.abs(state["lp"]) < 1e-10)
            & jnp.all(jnp.abs(state["yprev"]) < 1e-12)
        )
        all_silent = jnp.all(in_mask) & line_quiet
        y = gate(y, all_silent)
        out_mask = broadcast_flag(all_silent, (2,))

        def sel(reset, processed):
            return jax.tree.map(
                lambda r, p: jnp.where(all_silent, r, p), reset, processed
            )

        new_state = {
            "gain": sel(smoother_init(params["gain"]), gain_state),
            "del_l": sel(smoother_init(params["del_l"]), dl_state),
            "del_r": sel(smoother_init(params["del_r"]), dr_state),
            "dline": jnp.where(all_silent, jnp.zeros((d,), jnp.float32), buf[frames:]),
            "xprev": jnp.where(all_silent, jnp.zeros((2,), jnp.float32), xe[:, -1]),
            "yprev": jnp.where(all_silent, jnp.zeros((2,), jnp.float32), yprev),
            "lp": jnp.where(all_silent, jnp.float32(0.0), lp_last),
        }
        return y, new_state, out_mask


class BinauralSpatializerNode(AudioNode):
    debug_name = "binaural_spatializer"

    def __init__(
        self,
        position=(0.0, 0.0, -1.0),
        volume_gain: float = 1.0,
        ref_distance: float = 1.0,
        rolloff: float = 1.0,
        head_radius: float = 0.0875,
    ):
        """``position``: emitter position relative to the listener
        (listener frame: +x right, +y up, −z forward).  ``head_radius``:
        meters (structural-model parameter; 8.75 cm is the standard
        spherical-head fit).  Structural: changing it re-activates."""
        self._position = tuple(float(v) for v in position)
        self.volume_gain = float(volume_gain)
        self.ref_distance = float(ref_distance)
        self.rolloff = float(rolloff)
        self.head_radius = float(head_radius)

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
                "BinauralSpatializerNode takes 1 (mono) input and 2 "
                f"outputs; got {num_inputs} in, {num_outputs} out"
            )
        return BinauralSpatializerProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
