"""Golden CPU reference implementations of every node's DSP semantics.

These are scalar/NumPy implementations, independent of the JAX code under
test, mirroring the reference engine's kernels (citations inline).  Where the
rebuild intentionally deviates from the Rust for numeric quality, the golden
semantics are stated here and the deviation is documented at the deviating
module:

* smoother ramps: float64-exact closed form of the float32 one-pole
  recurrence, truncated to f32 (the Rust sequential loop itself drifts up to
  ~1.7e-5 from the exact filter; see ``firewheel_tpu/core/smoother.py``).
* beep phase: uint32 fixed-point phase accumulation (2^32 = one cycle).
* disabled beep / graph-input silence flags / smoother status: documented
  intent rather than reference slips.

Each function processes ONE block and returns (outputs, new_state, out_mask)
with channel-major float32 arrays, matching the kernel contract.
"""

from __future__ import annotations

import math

import numpy as np

TAU = 6.283185307179586

INACTIVE, ACTIVE, DEACTIVATING = 0, 1, 2


# ---------------------------------------------------------------------------
# Smoother (param/smoother.rs:72-226)
# ---------------------------------------------------------------------------

def smoother_coeffs(sample_rate, smooth_secs=0.01):
    b = np.float32(np.exp(np.float32(-1.0 / (smooth_secs * sample_rate))))
    a = np.float32(np.float32(1.0) - b)
    return b, a


def ref_smoother_set_and_process(state, val, frames, sample_rate,
                                 smooth_secs=0.01, eps=1e-5):
    """state = (target, last, status); returns (values, state', smoothing)."""
    target, last, status = state
    val = np.float32(val)
    # set (smoother.rs:133-140)
    if val != target:
        target, status = val, ACTIVE

    b, a = smoother_coeffs(sample_rate, smooth_secs)
    if status != ACTIVE:
        if status == DEACTIVATING:
            return (
                np.full(frames, last, np.float32),
                (target, last, INACTIVE),
                True,
            )
        return np.full(frames, last, np.float32), (target, last, status), False

    # float64-exact closed form of the f32 recurrence (smoother.rs:169-177)
    inp = np.float32(target * a)
    x_eff = np.float64(inp) / np.float64(a)
    kpow = np.exp(np.arange(1, frames + 1, dtype=np.float64) * math.log(float(b)))
    ramp = (x_eff + (np.float64(last) - x_eff) * kpow).astype(np.float32)

    # settle (smoother.rs:180-184)
    if abs(float(target) - float(ramp[0])) < eps:
        return (
            np.full(frames, target, np.float32),
            (target, np.float32(target), DEACTIVATING),
            True,
        )
    return ramp, (target, np.float32(ramp[-1]), ACTIVE), True


def ref_smoother_init(val):
    v = np.float32(val)
    return (v, v, INACTIVE)


# ---------------------------------------------------------------------------
# Beep test (basic_nodes/beep_test.rs:64-99)
# ---------------------------------------------------------------------------

def beep_phase_inc(freq_hz, sample_rate):
    return int(round(freq_hz / sample_rate * 2.0**32)) & 0xFFFFFFFF


def ref_beep(state_phase_q, enabled, gain, phase_inc, num_outputs, frames):
    if not enabled:
        out = np.zeros((num_outputs, frames), np.float32)
        return out, state_phase_q, np.ones(num_outputs, bool)
    k = np.arange(frames, dtype=np.uint64)
    phases_q = (np.uint64(state_phase_q) + k * np.uint64(phase_inc)) & np.uint64(
        0xFFFFFFFF
    )
    phase = phases_q.astype(np.float32) * np.float32(2.0**-32)
    row = np.sin(phase * np.float32(TAU), dtype=np.float32) * np.float32(gain)
    out = np.broadcast_to(row, (num_outputs, frames)).astype(np.float32)
    new_phase = (state_phase_q + frames * phase_inc) & 0xFFFFFFFF
    return out, new_phase, np.zeros(num_outputs, bool)


# ---------------------------------------------------------------------------
# Volume (basic_nodes/volume.rs:84-149)
# ---------------------------------------------------------------------------

def ref_volume(state, raw_gain, inputs, in_mask, sample_rate):
    ch, frames = inputs.shape
    if in_mask.all():
        # reset + silence (volume.rs:94-100)
        return (
            np.zeros_like(inputs),
            ref_smoother_init(raw_gain),
            np.ones(ch, bool),
        )
    ramp, st, smoothing = ref_smoother_set_and_process(
        state, raw_gain, frames, sample_rate
    )
    if not smoothing and ramp[0] < 1e-5:
        # muted (volume.rs:104-107)
        return np.zeros_like(inputs), st, np.ones(ch, bool)
    out = (inputs * ramp[None, :]).astype(np.float32)
    out[in_mask] = 0.0  # silent channels zero-filled (volume.rs:133-136)
    return out, st, in_mask.copy()


# ---------------------------------------------------------------------------
# Sum (basic_nodes/sum.rs:42-137)
# ---------------------------------------------------------------------------

def ref_sum(inputs, in_mask, num_outputs):
    n, frames = inputs.shape
    m = num_outputs
    if in_mask.all():
        return np.zeros((m, frames), np.float32), np.ones(m, bool)
    if n == m:
        return inputs.copy(), in_mask.copy()
    out = inputs[:m].copy()
    for k in range(1, n // m):
        out = (out + inputs[k * m : (k + 1) * m]).astype(np.float32)
    return out, np.zeros(m, bool)


# ---------------------------------------------------------------------------
# Hard clip (basic_nodes/hard_clip.rs:52-94)
# ---------------------------------------------------------------------------

def ref_hard_clip(inputs, in_mask, threshold_gain):
    t = np.float32(threshold_gain)
    out = np.minimum(np.maximum(inputs, -t), t).astype(np.float32)
    out[in_mask] = 0.0
    return out, in_mask.copy()


# ---------------------------------------------------------------------------
# Mono<->stereo (basic_nodes/mono_to_stereo.rs:33-52, stereo_to_mono.rs:33-57)
# ---------------------------------------------------------------------------

def ref_mono_to_stereo(inputs, in_mask):
    frames = inputs.shape[1]
    if in_mask[0]:
        return np.zeros((2, frames), np.float32), np.ones(2, bool)
    return (
        np.broadcast_to(inputs[0], (2, frames)).astype(np.float32).copy(),
        np.zeros(2, bool),
    )


def ref_stereo_to_mono(inputs, in_mask):
    frames = inputs.shape[1]
    if in_mask[:2].all():
        return np.zeros((1, frames), np.float32), np.ones(1, bool)
    return (
        ((inputs[0] + inputs[1]) * np.float32(0.5)).astype(np.float32)[None],
        np.zeros(1, bool),
    )
