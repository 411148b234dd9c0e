"""Panning laws and stereo field math (pan, width, 3D spatial projection).

Reference scope: stereo panning, stereo width, and 3D spatial positioning
(``DESIGN_DOC.md:13-21``) — all unimplemented there.  Pure functions shared
by the pan / stereo-width / spatializer nodes.
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp

__all__ = [
    "equal_power_gains",
    "mid_side_split",
    "mid_side_merge",
    "spatial_params",
]

_QUARTER_PI = math.pi / 4.0


def equal_power_gains(pan):
    """Equal-power (−3 dB center) pan law.

    ``pan`` in [-1, 1] (−1 = hard left).  Returns ``(gain_l, gain_r)``:
    ``gl = cos((pan+1)·π/4)``, ``gr = sin((pan+1)·π/4)``.
    """
    theta = (jnp.asarray(pan, jnp.float32) + 1.0) * jnp.float32(_QUARTER_PI)
    return jnp.cos(theta), jnp.sin(theta)


def mid_side_split(left, right):
    """``mid = (L+R)/2``, ``side = (L−R)/2``."""
    half = jnp.float32(0.5)
    return (left + right) * half, (left - right) * half


def mid_side_merge(mid, side):
    """Inverse of :func:`mid_side_split`."""
    return mid + side, mid - side


def spatial_params(
    rel_pos,
    ref_distance: float = 1.0,
    rolloff: float = 1.0,
    min_distance: float = 0.1,
):
    """Distance/direction → (distance_gain, pan, distance).

    ``rel_pos``: ``f32[3]`` emitter position relative to the listener, in a
    left-handed listener frame: +x right, +y up, −z forward.

    * distance gain: inverse-distance law
      ``ref / (ref + rolloff·(d − ref))``, clamped at ``min_distance``;
    * pan: azimuth folded into [-1, 1] via ``sin(azimuth)`` so sounds
      behind the listener keep their left/right placement.

    Backend-matched: numpy in → numpy math (this runs on the HOST per
    emitter per block when staging params — device round-trips here would
    dominate large scenes), jax in → traceable.
    """
    xp = jnp if type(rel_pos).__module__.startswith("jax") else np
    p = xp.asarray(rel_pos, xp.float32)
    d = xp.sqrt(xp.sum(p * p))
    d_eff = xp.maximum(d, xp.float32(min_distance))
    gain = xp.float32(ref_distance) / (
        xp.float32(ref_distance)
        + xp.float32(rolloff) * xp.maximum(d_eff - xp.float32(ref_distance), 0.0)
    )
    # horizontal-plane direction; straight above/below pans center
    horiz = xp.sqrt(p[0] * p[0] + p[2] * p[2])
    pan = xp.where(horiz > 1e-6, p[0] / xp.maximum(d_eff, 1e-6), 0.0)
    return gain, xp.clip(pan, -1.0, 1.0), d_eff
