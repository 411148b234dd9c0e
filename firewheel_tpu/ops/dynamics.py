"""Dynamics primitives: envelope following, gain computing, sliding maxima.

Beyond the reference's code but in its design family (``DESIGN_DOC.md``
lists effect nodes as first-class scope; every shipping game engine mixes
through a compressor/limiter bus).  TPU shapes:

* the attack/release envelope follower is a state-dependent one-pole (the
  coefficient switches on signal vs envelope), so it runs as a sequential
  ``lax.scan`` over the block — 128 scalar steps fuse into the surrounding
  program;
* the limiter's lookahead maximum is ``lax.reduce_window`` (a max-pool),
  which XLA vectorizes — no per-sample loop;
* gain computing (dB-domain knee) is pure elementwise math.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

__all__ = [
    "sample_scan",
    "envelope_follow",
    "compressor_gain_db",
    "sliding_max",
]


def sample_scan(step, carry, xs):
    """Per-sample recurrence along the last axis with per-step emissions.

    ``step(carry, x) -> (carry', y)`` consumes one sample ``x = xs[..., i]``
    and emits ``y`` shaped/dtyped like ``xs[..., 0]``.  Returns
    ``(carry_last, ys)`` with ``ys.shape == xs.shape``.

    Two semantically identical emissions (bit-exact, pinned in
    tests/test_dsp_ops.py):

    * XLA path: ``lax.scan`` with native extensive outputs;
    * Mosaic path (``core.trace_mode.MOSAIC``): the Mosaic scan lowering
      rejects scans that EMIT per-step outputs (``_scan_lowering_rule:
      if num_extensive: raise NotImplementedError`` — verified on-chip,
      round 3), so the recurrence runs as a ``fori_loop`` whose body
      reads sample ``i`` and writes ``y`` back with iota-masked selects —
      pure elementwise ops, which Mosaic lowers.  Same O(n) vector-op
      count either way.
    """
    from ..core import trace_mode

    if not trace_mode.MOSAIC:
        carry_last, ys = jax.lax.scan(step, carry, jnp.moveaxis(xs, -1, 0))
        return carry_last, jnp.moveaxis(ys, 0, -1)

    n = xs.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, xs.shape, xs.ndim - 1)

    def body(i, val):
        c, out = val
        mask = iota == i
        x = jnp.sum(jnp.where(mask, xs, 0.0), axis=-1)  # exact: one lane
        c, y = step(c, x)
        out = jnp.where(mask, jnp.asarray(y)[..., None], out)
        return c, out

    return jax.lax.fori_loop(0, n, body, (carry, jnp.zeros_like(xs)))


def envelope_follow(level, env0, attack_b, release_b):
    """Attack/release envelope follower along the last axis.

    ``env[n] = b*env[n-1] + (1-b)*level[n]`` with ``b = attack_b`` while the
    signal is above the envelope (rising) and ``release_b`` while below —
    the classic peak detector.  ``level: f32[..., n]`` (non-negative),
    ``env0: f32[...]``.  Returns ``(env f32[..., n], env_last)``.
    """
    attack_b = jnp.float32(attack_b)
    release_b = jnp.float32(release_b)

    def step(env, x):
        b = jnp.where(x > env, attack_b, release_b)
        env = b * env + (1.0 - b) * x
        return env, env

    env_last, env = sample_scan(step, env0, level)
    return env, env_last


def compressor_gain_db(level_db, threshold_db, ratio, knee_db):
    """Soft-knee downward-compression gain (dB in → dB gain out).

    Below ``threshold - knee/2``: unity.  Above ``threshold + knee/2``:
    ``(1/ratio - 1) * (level - threshold)``.  Inside the knee: the standard
    quadratic interpolation.
    """
    over = level_db - threshold_db
    slope = 1.0 / ratio - 1.0
    half_knee = knee_db * 0.5
    in_knee = jnp.clip(over + half_knee, 0.0, knee_db)
    knee_gain = slope * in_knee * in_knee / (2.0 * jnp.maximum(knee_db, 1e-9))
    hard = slope * over
    return jnp.where(
        over <= -half_knee,
        0.0,
        jnp.where(over >= half_knee, hard, knee_gain),
    )


def sliding_max(x, window: int):
    """Causal-future sliding maximum: ``out[t] = max(x[t : t+window])``.

    ``x: f32[..., n]`` must already carry ``window - 1`` frames of lookahead
    tail (the caller appends its buffered future samples).  Output length is
    ``n - window + 1``.

    XLA path: ``reduce_window`` (a max-pool XLA vectorizes).  Mosaic path:
    the sparse-table doubling trick — ``log2(window)`` rounds of
    shift-and-max over spans of 2^k, then one overlapping combine — all
    static slices/concats/maxima, which Mosaic lowers.
    """
    if window <= 1:
        return x
    from ..core import trace_mode

    if trace_mode.MOSAIC:
        neg = np.float32(-np.inf)

        def shift(a, d):
            pad = jnp.full(a.shape[:-1] + (d,), neg, a.dtype)
            return jnp.concatenate([a[..., d:], pad], axis=-1)

        m, size = x, 1
        while size * 2 <= window:
            m = jnp.maximum(m, shift(m, size))  # m[i] = max x[i : i+2k]
            size *= 2
        # spans [i, i+size) and [i+window-size, i+window) tile the window
        out = jnp.maximum(m, shift(m, window - size))
        return out[..., : x.shape[-1] - window + 1]

    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 1) + (window,),
        window_strides=(1,) * x.ndim,
        padding="valid",
    )
