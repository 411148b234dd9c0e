"""Parameter smoothing: a one-pole lowpass ramp toward a target value.

Reference semantics: ``crates/firewheel-core/src/param/smoother.rs:72-226``
— recurrence ``y[i] = a*x + b*y[i-1]`` with ``b = exp(-1/(smooth_secs*sr))``,
``a = 1-b`` (smoother.rs:99-100, 169-177), default 10 ms / settle epsilon 1e-5
(smoother.rs:19-24), and an Inactive/Active/Deactivating status machine.

TPU-first formulation
---------------------
A per-sample sequential IIR is the worst possible shape for a vector unit, so
the ramp is evaluated in closed form::

    y[i] = x_eff + (y0 - x_eff) * b^(i+1),   x_eff = (x*a)/a

which is the exact solution of the float32 recurrence with float32-rounded
coefficients.  Measured accuracy: within ~5e-7 of the float64-exact filter for
blocks up to 4096 frames (the reference's own sequential float32 loop drifts
up to ~1.7e-5 from the exact filter, so the closed form is strictly *more*
accurate; golden tests compare against the float64-exact filter).

Status-machine note: the reference has a latent quirk where ``Deactivating``
never transitions to ``Inactive`` because of an early return
(smoother.rs:162-167 vs 186).  We implement the documented *intent*
(smoother.rs:36-38): Deactivating becomes Inactive on the next process cycle.
Output values are identical either way.

Two forms are provided:

* :func:`smoother_set_and_process` — pure JAX kernel over a state pytree,
  used inside compiled graph programs (vmappable / scannable).
* :class:`ParamSmoother` — host-side convenience class with the reference's
  imperative API, built on the same math.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "SmootherConfig",
    "SmootherState",
    "SMOOTHER_INACTIVE",
    "SMOOTHER_ACTIVE",
    "SMOOTHER_DEACTIVATING",
    "smoother_coeffs",
    "smoother_init",
    "smoother_reset",
    "smoother_set_and_process",
    "ParamSmoother",
]

# Status encoding (smoother.rs:29-39).
SMOOTHER_INACTIVE = 0
SMOOTHER_ACTIVE = 1
SMOOTHER_DEACTIVATING = 2


@dataclasses.dataclass(frozen=True)
class SmootherConfig:
    """Smoothing time and settle threshold (smoother.rs:7-25)."""

    smooth_secs: float = 10.0 / 1000.0
    settle_epsilon: float = 0.00001


class SmootherState(NamedTuple):
    """Device-side smoother state (the recurrent carry).

    ``target``: the value being smoothed toward (smoother.rs ``input``).
    ``last``:   the most recent output sample (smoother.rs ``last_output``).
    ``status``: int32 status machine value.
    """

    target: jnp.ndarray
    last: jnp.ndarray
    status: jnp.ndarray


def smoother_coeffs(sample_rate: int, config: SmootherConfig = SmootherConfig()):
    """Precompute ``(b, a, log_b)`` in float32 (smoother.rs:99-100).

    ``log_b`` is computed in float64 for ramp-power accuracy, then truncated.
    """
    b = np.float32(np.exp(np.float32(-1.0 / (config.smooth_secs * sample_rate))))
    a = np.float32(np.float32(1.0) - b)
    log_b = np.float32(math.log(float(b)))
    return b, a, log_b


def smoother_init(val) -> SmootherState:
    """Fresh state holding ``val`` (smoother.rs:93-112)."""
    v = jnp.asarray(val, dtype=jnp.float32)
    return SmootherState(
        target=v, last=v, status=jnp.full(v.shape, SMOOTHER_INACTIVE, jnp.int32)
    )


def smoother_reset(state: SmootherState, val) -> SmootherState:
    """Reset to a flat value, deactivating (smoother.rs:115-129)."""
    v = jnp.asarray(val, dtype=jnp.float32)
    return SmootherState(
        target=v,
        last=v,
        status=jnp.full(jnp.shape(v), SMOOTHER_INACTIVE, jnp.int32),
    )


def smoother_set_and_process(
    state: SmootherState,
    val,
    frames: int,
    coeffs,
    settle_epsilon: float = 0.00001,
):
    """Set a new target and produce the smoothed ramp for one block.

    Mirrors ``ParamSmoother::set_and_process`` (smoother.rs:202-205 →
    133-140, 159-194) as a pure function.

    Args:
        state: current :class:`SmootherState` (scalar leaves).
        val: new target value (traced f32 scalar).
        frames: static block length.
        coeffs: ``(b, a, log_b)`` from :func:`smoother_coeffs`.
        settle_epsilon: settle threshold.

    Returns:
        ``(values f32[frames], new_state, is_smoothing bool[])``
    """
    b, a, log_b = coeffs
    val = jnp.asarray(val, dtype=jnp.float32)

    # set() — begin smoothing iff the target changed (smoother.rs:133-140).
    changed = val != state.target
    status = jnp.where(changed, SMOOTHER_ACTIVE, state.status)
    target = val

    is_active = status == SMOOTHER_ACTIVE

    # Closed-form ramp of the float32 recurrence (smoother.rs:169-177).
    inp = target * jnp.float32(a)
    x_eff = inp / jnp.float32(a)
    # int iota + cast: Mosaic's tpu.iota is integer-only (f32 iota fails
    # verification inside the Pallas megakernel)
    k = jnp.arange(1, frames + 1, dtype=jnp.int32).astype(jnp.float32)
    b_pow = jnp.exp(k * jnp.float32(log_b))
    ramp = x_eff + (state.last - x_eff) * b_pow

    flat_last = jnp.broadcast_to(state.last, (frames,))
    flat_target = jnp.broadcast_to(target, (frames,))

    # Settle check uses the *first* ramp sample (smoother.rs:180-184); on
    # settle the reference refills the block with the flat target via reset().
    settled = is_active & (jnp.abs(target - ramp[0]) < jnp.float32(settle_epsilon))

    # 0/1 blends instead of wide selects: scalar-pred selects over
    # (frames,) values need an i1 minor-dim insert when batched (node
    # pooling / Pallas megakernel), which Mosaic rejects; the blend is
    # exact for finite values since the flags are exactly 0.0 or 1.0
    one = jnp.float32(1.0)
    m_set = jnp.where(settled, one, jnp.float32(0.0))
    m_act = jnp.where(is_active, one, jnp.float32(0.0))
    inner = m_act * ramp + (one - m_act) * flat_last
    values = m_set * flat_target + (one - m_set) * inner
    # positive static index: ramp[-1] lowers to a CLIP-mode gather, which
    # Mosaic rejects inside the Pallas megakernel; ramp[frames-1] is a slice
    new_last = jnp.where(
        settled, target, jnp.where(is_active, ramp[frames - 1], state.last)
    )
    new_status = jnp.where(
        settled,
        SMOOTHER_DEACTIVATING,
        jnp.where(
            is_active,
            SMOOTHER_ACTIVE,
            # Deactivating -> Inactive on the next cycle (smoother.rs:36-38).
            jnp.where(
                status == SMOOTHER_DEACTIVATING, SMOOTHER_INACTIVE, status
            ),
        ),
    ).astype(jnp.int32)

    new_state = SmootherState(target=target, last=new_last, status=new_status)
    is_smoothing = new_status != SMOOTHER_INACTIVE
    return values, new_state, is_smoothing


class ParamSmoother:
    """Host-side smoother with the reference's imperative API.

    Useful for host-driven control paths and as an executable spec; the
    compiled graph path uses :func:`smoother_set_and_process` directly.
    """

    def __init__(
        self,
        val: float,
        sample_rate: int,
        max_block_frames: int,
        config: SmootherConfig = SmootherConfig(),
    ):
        self._coeffs = smoother_coeffs(sample_rate, config)
        self._eps = config.settle_epsilon
        self._max_block_frames = max_block_frames
        self._target = np.float32(val)
        self._last = np.float32(val)
        self._status = SMOOTHER_INACTIVE

    # -- queries (smoother.rs:143-153, 208-226) -----------------------------
    def dest(self) -> float:
        return float(self._target)

    def current_value(self):
        return float(self._last), self._status

    def is_active(self) -> bool:
        return self._status != SMOOTHER_INACTIVE

    def constant_value(self):
        return None if self.is_active() else float(self._target)

    def max_block_frames(self) -> int:
        return self._max_block_frames

    # -- mutation ------------------------------------------------------------
    def reset(self, val: float):
        self._target = np.float32(val)
        self._last = np.float32(val)
        self._status = SMOOTHER_INACTIVE

    def set(self, val: float):
        val = np.float32(val)
        if val != self._target:
            self._target = val
            self._status = SMOOTHER_ACTIVE

    def process(self, frames: int) -> tuple[np.ndarray, int]:
        frames = min(frames, self._max_block_frames)
        b, a, log_b = self._coeffs
        if self._status != SMOOTHER_ACTIVE or frames == 0:
            if self._status == SMOOTHER_DEACTIVATING:
                self._status = SMOOTHER_INACTIVE
                return np.full(frames, self._last, np.float32), SMOOTHER_DEACTIVATING
            return np.full(frames, self._last, np.float32), self._status

        # Float64-exact closed form, truncated to f32 (the golden semantics).
        inp = np.float32(self._target * a)
        x_eff = np.float64(inp) / np.float64(a)
        kpow = np.exp(
            np.arange(1, frames + 1, dtype=np.float64) * math.log(float(b))
        )
        ramp = (x_eff + (np.float64(self._last) - x_eff) * kpow).astype(np.float32)

        if abs(float(self._target) - float(ramp[0])) < self._eps:
            out = np.full(frames, self._target, np.float32)
            self._last = np.float32(self._target)
            self._status = SMOOTHER_DEACTIVATING
            return out, SMOOTHER_DEACTIVATING

        self._last = np.float32(ramp[-1])
        return ramp, SMOOTHER_ACTIVE

    def set_and_process(self, val: float, frames: int):
        self.set(val)
        return self.process(frames)
