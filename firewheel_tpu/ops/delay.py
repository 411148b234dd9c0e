"""Delay-line primitives: pure delays and block-feedback combs.

Reference scope: echo and delay-compensation nodes (``DESIGN_DOC.md:17-18``,
unimplemented there).  A delay line on TPU is a rolled state buffer —
concatenate + slice, which XLA lowers to cheap copies; no per-sample
pointer chasing.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["delay_init", "delay_step", "comb_init", "comb_step"]


def delay_init(channels: int, delay_frames: int):
    """Zero history for a pure delay of ``delay_frames``."""
    return jnp.zeros((channels, max(delay_frames, 0)), jnp.float32)


def delay_step(x, buf):
    """Delay by ``buf.shape[-1]`` frames: ``y[n] = x[n-D]``.

    Works for any D ≥ 0 and any block size.  Returns ``(y, new_buf)``.
    """
    d = buf.shape[-1]
    if d == 0:
        return x, buf
    combined = jnp.concatenate([buf, x], axis=-1)  # [ch, D+F]
    f = x.shape[-1]
    return combined[..., :f], combined[..., f:]


def comb_init(channels: int, delay_frames: int):
    """Zero history for a feedback comb of ``delay_frames`` (must be ≥ the
    block size — in-block feedback would need a sequential recurrence)."""
    return jnp.zeros((channels, delay_frames), jnp.float32)


def comb_step(x, buf, feedback):
    """Feedback comb ``y[n] = x[n] + g·y[n-D]`` with D ≥ block size.

    ``buf`` holds the last D output samples.  Returns ``(y, new_buf)``.
    """
    f = x.shape[-1]
    assert buf.shape[-1] >= f, "comb delay must be >= block size"
    delayed = buf[..., :f]
    y = x + jnp.float32(feedback) * delayed
    new_buf = jnp.concatenate([buf[..., f:], y], axis=-1)
    return y, new_buf
