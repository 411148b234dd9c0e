"""Pallas TPU kernel: batched sequential IIR (biquad / one-pole).

Why a hand-written kernel when ``ops/iir.py`` already runs biquads as
``lax.associative_scan``:

* **HBM traffic** — the associative scan materializes log₂(F) intermediate
  composition arrays; this kernel streams each sample tile through VMEM once
  (read x, write y — speed-of-light for a memory-bound recurrence).
* **Numerics** — it evaluates the literal sequential float32 recurrence, so
  the output matches a scalar reference sample-for-sample (the scan's
  reassociation differs by up to ~5e-5 near resonant poles; see
  ``ops/iir.py``).

Layout: the time axis must be *sequential*, everything else vectorizes.
Input ``[..., F]`` is flattened to lanes ``L``, transposed to ``[F, L]`` so
each time step is one ``[L]`` VPU row op, and tiled over a grid of lane
blocks.  Recurrence state rides the ``fori_loop`` carry; coefficients arrive
via scalar prefetch (they are live params, changing per block without
recompilation).

Used by ``FilterNode`` on TPU backends (auto-selected); the associative
scan remains the portable path (CPU, interpret-mode tests).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .iir import BiquadCoeffs

__all__ = ["biquad_pallas", "pallas_available"]

_LANE_TILE = 1024  # lanes per grid step: 8 sublanes × 128 lanes


def pallas_available() -> bool:
    """True when the default backend compiles Pallas TPU kernels."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _biquad_kernel(coef_ref, x_ref, z_ref, y_ref, zout_ref):
    """One lane tile: sequential TDF-II over the time axis.

    ``coef_ref``: scalar-prefetch ``f32[5]`` = (b0, b1, b2, a1, a2).
    ``x_ref``: ``f32[F, TILE]``; ``z_ref``/``zout_ref``: ``f32[2, TILE]``.
    """
    b0 = coef_ref[0]
    b1 = coef_ref[1]
    b2 = coef_ref[2]
    a1 = coef_ref[3]
    a2 = coef_ref[4]
    frames = x_ref.shape[0]

    def step(f, carry):
        z1, z2 = carry
        xf = x_ref[f, :]
        y = b0 * xf + z1
        y_ref[f, :] = y
        z1n = b1 * xf - a1 * y + z2
        z2n = b2 * xf - a2 * y
        return (z1n, z2n)

    z1, z2 = jax.lax.fori_loop(0, frames, step, (z_ref[0, :], z_ref[1, :]))
    zout_ref[0, :] = z1
    zout_ref[1, :] = z2


@functools.partial(jax.jit, static_argnames=("interpret",))
def _biquad_pallas_flat(x_t, z, coef, interpret=False):
    """``x_t: f32[F, L]`` (L a multiple of the lane tile), ``z: f32[2, L]``."""
    frames, lanes = x_t.shape
    grid = (lanes // _LANE_TILE,)
    y, zout = pl.pallas_call(
        _biquad_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (frames, _LANE_TILE),
                    lambda i, coef: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, _LANE_TILE), lambda i, coef: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (frames, _LANE_TILE),
                    lambda i, coef: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, _LANE_TILE), lambda i, coef: (0, i), memory_space=pltpu.VMEM
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((frames, lanes), jnp.float32),
            jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(coef, x_t, z)
    return y, zout


def biquad_pallas(x, z_prev, coeffs: BiquadCoeffs, interpret: bool = False):
    """Drop-in replacement for :func:`ops.iir.biquad_scan` backed by the
    Pallas kernel, for SCALAR coefficients only: the kernel carries them
    as an f32[5] scalar-prefetch operand (one filter per call).
    Per-channel coefficient arrays — which :func:`biquad_scan` accepts —
    are rejected here with a clear error instead of mis-shaping the
    prefetch.  Same data contract otherwise: ``x f32[..., F]``,
    ``z_prev=(z1, z2)`` with shape ``x.shape[:-1]`` → ``(y, (z1', z2'))``."""
    for name, c in zip(("b0", "b1", "b2", "a1", "a2"), coeffs):
        if jnp.ndim(c) != 0:
            raise ValueError(
                f"biquad_pallas takes scalar coefficients ({name} has "
                f"shape {jnp.shape(c)}); use ops.iir.biquad_scan for "
                "per-channel coefficient arrays"
            )
    x = jnp.asarray(x, jnp.float32)
    lead = x.shape[:-1]
    frames = x.shape[-1]
    lanes = int(np.prod(lead)) if lead else 1

    pad = (-lanes) % _LANE_TILE
    x_flat = x.reshape(lanes, frames)
    z1, z2 = (jnp.broadcast_to(jnp.asarray(c, jnp.float32), lead).reshape(lanes)
              for c in z_prev)
    if pad:
        x_flat = jnp.pad(x_flat, ((0, pad), (0, 0)))
        z1 = jnp.pad(z1, (0, pad))
        z2 = jnp.pad(z2, (0, pad))

    coef = jnp.stack(
        [jnp.asarray(c, jnp.float32) for c in coeffs]
    )  # (b0,b1,b2,a1,a2)
    y_t, zout = _biquad_pallas_flat(
        x_flat.T, jnp.stack([z1, z2]), coef, interpret=interpret
    )
    y = y_t.T[:lanes].reshape(*lead, frames)
    z1o = zout[0, :lanes].reshape(lead)
    z2o = zout[1, :lanes].reshape(lead)
    return y, (z1o, z2o)
