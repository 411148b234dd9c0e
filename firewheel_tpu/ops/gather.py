"""Mosaic-safe 1-D gather: the delay-line tap primitive for Pallas
megakernel islands.

Mosaic's ONE gather lowering is ``tpu.dynamic_gather`` — a 2-D
take_along_axis whose index array has the operand's shape (jax
``pallas/mosaic/lowering.py:_gather_lowering_rule``), and on v5e
(probed 2026-08-19, libtpu via the axon AOT helper) it only COMPILES
when the gathered dimension is exactly one lane tile (128) wide: a
``[8, 256]`` take_along_axis already crashes the TPU compiler
(``tpu_compile_helper subprocess exit code 1``), as do 3140/3200.

:func:`mosaic_gather_1d` therefore decomposes an arbitrary-width table
gather into a static unroll over 128-wide table tiles: for each output
chunk of 128 indices and each table tile, one in-bounds 128-wide
``take_along_axis`` plus a validity select.  Emitted op count is
``ceil(M/128) x ceil(N/128)`` gathers — fine for mod-delay-scale lines
(a 30 ms chorus line ≈ 52 gathers/block), prohibitive for the pitch
shifter's default 8192-sample ring (1024 gathers/block), so callers
gate megakernel eligibility on :func:`gather_unroll_cost`.

Under the XLA lowering none of this is needed (``x[idx]`` lowers to a
native gather); callers branch on ``core.trace_mode.MOSAIC``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mosaic_gather_1d", "gather_unroll_cost", "GATHER_LANES"]

GATHER_LANES = 128  # tpu.dynamic_gather's one compilable width (v5e)


def gather_unroll_cost(table_len: int, num_indices: int) -> int:
    """Number of 128-wide gathers :func:`mosaic_gather_1d` emits."""
    t = -(-int(table_len) // GATHER_LANES)
    c = -(-int(num_indices) // GATHER_LANES)
    return t * c


def mosaic_gather_1d(flat, idx):
    """``flat[idx]`` for 1-D ``flat`` (f32 [N]) and 1-D in-bounds ``idx``
    (int32 [M]) in Mosaic-lowerable form (see module docstring).

    The tile vmap batches each 128-wide take_along_axis into exactly the
    2-D ``tpu.dynamic_gather`` form; everything else is static slicing,
    compares, and selects.
    """
    n = flat.shape[0]
    m = idx.shape[0]
    lanes = GATHER_LANES
    t = -(-n // lanes)
    c = -(-m // lanes)
    tbl = jnp.pad(flat, (0, t * lanes - n)) if t * lanes != n else flat
    idxp = jnp.pad(idx, (0, c * lanes - m)) if c * lanes != m else idx
    out_chunks = []
    for ci in range(c):
        ic = idxp[ci * lanes:(ci + 1) * lanes]
        acc = jnp.zeros((lanes,), flat.dtype)
        for ti in range(t):
            loc = ic - ti * lanes
            valid = (loc >= 0) & (loc < lanes)
            g = jnp.take_along_axis(
                tbl[ti * lanes:(ti + 1) * lanes],
                jnp.clip(loc, 0, lanes - 1),
                axis=0,
                mode="promise_in_bounds",
            )
            acc = jnp.where(valid, g, acc)
        out_chunks.append(acc)
    out = jnp.concatenate(out_chunks) if c > 1 else out_chunks[0]
    return out[:m] if c * lanes != m else out
