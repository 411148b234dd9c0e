"""Smoother tests: JAX kernel vs the float64-exact golden reference.

Covers the recurrence math (smoother.rs:169-177), the status machine
(smoother.rs:29-39 intent), settle behavior (smoother.rs:180-184), and the
1e-6 numeric contract.
"""

import numpy as np
import jax.numpy as jnp

from firewheel_tpu.core.smoother import (
    SMOOTHER_ACTIVE,
    SMOOTHER_DEACTIVATING,
    SMOOTHER_INACTIVE,
    ParamSmoother,
    SmootherConfig,
    smoother_coeffs,
    smoother_init,
    smoother_set_and_process,
)
from reference_dsp import ref_smoother_init, ref_smoother_set_and_process

SR = 48000


def run_jax(targets, frames):
    coeffs = smoother_coeffs(SR)
    state = smoother_init(np.float32(targets[0]))
    outs = []
    for t in targets:
        vals, state, smoothing = smoother_set_and_process(
            state, jnp.float32(t), frames, coeffs
        )
        outs.append(np.asarray(vals))
    return np.concatenate(outs), state


def run_ref(targets, frames):
    state = ref_smoother_init(targets[0])
    outs = []
    for t in targets:
        vals, state, smoothing = ref_smoother_set_and_process(state, t, frames, SR)
        outs.append(vals)
    return np.concatenate(outs), state


def test_inactive_passthrough():
    coeffs = smoother_coeffs(SR)
    state = smoother_init(0.5)
    vals, state, smoothing = smoother_set_and_process(state, 0.5, 128, coeffs)
    assert not bool(smoothing)
    assert (np.asarray(vals) == np.float32(0.5)).all()
    assert int(state.status) == SMOOTHER_INACTIVE


def test_ramp_matches_golden_within_1e6():
    for frames in (128, 512, 1024):
        for targets in ([0.0, 1.0, 1.0, 1.0], [1.0, 0.2, 0.2, 4.0, 4.0]):
            j, _ = run_jax(targets, frames)
            r, _ = run_ref(targets, frames)
            np.testing.assert_allclose(j, r, atol=1e-6, rtol=0)


def test_ramp_converges_to_target():
    j, state = run_jax([0.0] + [1.0] * 40, 256)
    assert abs(j[-1] - 1.0) < 1e-5
    assert int(state.status) == SMOOTHER_INACTIVE


def test_status_machine_settles():
    """Active → Deactivating → Inactive (documented intent of
    smoother.rs:36-38)."""
    coeffs = smoother_coeffs(SR)
    state = smoother_init(0.0)
    vals, state, _ = smoother_set_and_process(state, 1.0, 128, coeffs)
    assert int(state.status) == SMOOTHER_ACTIVE
    # run enough blocks to settle
    statuses = []
    for _ in range(60):
        vals, state, _ = smoother_set_and_process(state, 1.0, 128, coeffs)
        statuses.append(int(state.status))
    assert SMOOTHER_DEACTIVATING in statuses
    assert statuses[-1] == SMOOTHER_INACTIVE
    # Deactivating is immediately followed by Inactive
    i = statuses.index(SMOOTHER_DEACTIVATING)
    assert statuses[i + 1] == SMOOTHER_INACTIVE


def test_settled_block_is_flat():
    """On the settling block the output is the flat target
    (reset-on-settle, smoother.rs:181-183)."""
    coeffs = smoother_coeffs(SR)
    state = smoother_init(0.0)
    prev = state
    for _ in range(100):
        vals, state, _ = smoother_set_and_process(state, 1.0, 128, coeffs)
        if int(state.status) == SMOOTHER_DEACTIVATING:
            assert (np.asarray(vals) == np.float32(1.0)).all()
            break
        prev = state
    else:
        raise AssertionError("never settled")


def test_host_class_matches_kernel():
    ps = ParamSmoother(0.0, SR, 1024)
    coeffs = smoother_coeffs(SR)
    state = smoother_init(0.0)
    for t in [1.0, 1.0, 0.3, 0.3, 0.3]:
        hv, _ = ps.set_and_process(t, 512)
        jv, state, _ = smoother_set_and_process(state, t, 512, coeffs)
        np.testing.assert_allclose(np.asarray(jv), hv, atol=1e-6, rtol=0)


def test_config_defaults():
    # smoother.rs:19-24
    cfg = SmootherConfig()
    assert cfg.smooth_secs == 0.01
    assert cfg.settle_epsilon == 1e-5
