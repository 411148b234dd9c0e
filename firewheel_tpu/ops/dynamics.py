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
import jax.numpy as jnp

__all__ = [
    "envelope_follow",
    "compressor_gain_db",
    "sliding_max",
]


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

    env_last, env = jax.lax.scan(step, env0, jnp.moveaxis(level, -1, 0))
    return jnp.moveaxis(env, 0, -1), env_last


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
    """
    if window <= 1:
        return x
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 1) + (window,),
        window_strides=(1,) * x.ndim,
        padding="valid",
    )
