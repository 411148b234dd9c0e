"""Decibel/linear-gain conversions and volume curves.

Behavior mirrors the reference utilities (``crates/firewheel-core/src/util.rs:7-41``
and ``crates/firewheel-core/src/param/range.rs:32-35``), evaluated here in
float32 to preserve the engine's numeric contract.  All functions accept
scalars or arrays (numpy or jax) and are safe to call inside jitted code.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "db_to_gain",
    "gain_to_db",
    "db_to_gain_clamped_neg_100_db",
    "gain_to_db_clamped_neg_100_db",
    "percent_volume_to_raw_gain",
]


def _np_like(x):
    """Pick numpy or jax.numpy depending on the input type."""
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def db_to_gain(db):
    """``10^(db/20)`` (util.rs:7-9)."""
    xp = _np_like(db)
    db = xp.asarray(db, dtype=xp.float32)
    return xp.power(xp.float32(10.0), xp.float32(0.05) * db)


def gain_to_db(amp):
    """``20*log10(amp)`` (util.rs:13-15)."""
    xp = _np_like(amp)
    amp = xp.asarray(amp, dtype=xp.float32)
    return xp.float32(20.0) * xp.log10(amp)


def db_to_gain_clamped_neg_100_db(db):
    """dB→gain with ``db <= -100`` treated as -inf gain (util.rs:21-27)."""
    xp = _np_like(db)
    db = xp.asarray(db, dtype=xp.float32)
    return xp.where(db <= xp.float32(-100.0), xp.float32(0.0), db_to_gain(db))


def gain_to_db_clamped_neg_100_db(amp):
    """gain→dB with ``amp <= 1e-5`` clamped to -100 dB (util.rs:35-41)."""
    xp = _np_like(amp)
    amp = xp.asarray(amp, dtype=xp.float32)
    # Guard log10(0); the where() selects -100 for those lanes anyway.
    safe = xp.where(amp <= xp.float32(0.00001), xp.float32(1.0), amp)
    return xp.where(
        amp <= xp.float32(0.00001), xp.float32(-100.0), gain_to_db(safe)
    )


def raw_gain_to_percent_volume(raw_gain):
    """Inverse of :func:`percent_volume_to_raw_gain`:
    ``100 * sqrt(max(g, 0))`` — the one place the perceptual curve's
    inverse lives (fade ramps, dB→percent conversions build on it)."""
    xp = _np_like(raw_gain)
    g = xp.asarray(raw_gain, dtype=xp.float32)
    return xp.float32(100.0) * xp.sqrt(xp.maximum(g, xp.float32(0.0)))


def percent_volume_to_raw_gain(percent_volume):
    """``(max(p,0)/100)^2`` — perceptual volume curve (range.rs:32-35)."""
    xp = _np_like(percent_volume)
    p = xp.asarray(percent_volume, dtype=xp.float32)
    n = xp.maximum(p, xp.float32(0.0)) * xp.float32(1.0 / 100.0)
    return n * n
