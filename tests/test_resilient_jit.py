"""Tests for executor._ResilientJit and its input perturbations.

The retry ladder exists for the axon TPU tunnel's sticky spurious
``UNIMPLEMENTED`` compiles (docs/KNOWN_ISSUES.md); on healthy backends the
ladder must be invisible, and the perturbed retraces (attempts 3-4) must be
exact float identities — that is what these tests pin down, on CPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from firewheel_tpu.executor import _perturb_inputs, _ResilientJit
from firewheel_tpu.jaxpr_shuffle import permute_closed_jaxpr, shuffled


# No subnormals here: XLA flushes them to zero (FTZ) in ANY arithmetic op,
# so x+0/x*1 on a subnormal reflects the backend, not the perturbation.
F32_SPECIALS = np.array(
    [0.0, -0.0, 1.5, -3.25, 1.2e-38, np.inf, -np.inf, np.nan, 65504.0],
    np.float32,
)


class TestPerturbInputs:
    def test_mode2_bitwise_identity_including_neg_zero(self):
        tree = {"a": jnp.asarray(F32_SPECIALS), "b": (jnp.float32(-0.0),)}
        out = _perturb_inputs(tree, 2)
        for got, want in zip(jax.tree.leaves(out), jax.tree.leaves(tree)):
            np.testing.assert_array_equal(
                np.asarray(got).view(np.uint32), np.asarray(want).view(np.uint32)
            )

    def test_mode1_identity_up_to_zero_sign(self):
        x = jnp.asarray(F32_SPECIALS)
        out = np.asarray(_perturb_inputs(x, 1))
        ref = np.asarray(x)
        # x + 0.0 is the IEEE identity except -0.0 + 0.0 -> +0.0
        want = np.where(ref == 0, np.float32(0.0), ref)
        np.testing.assert_array_equal(
            np.nan_to_num(out, nan=7.0), np.nan_to_num(want, nan=7.0)
        )
        assert np.isnan(out[np.isnan(ref)]).all()

    def test_non_float_leaves_untouched(self):
        tree = {
            "i": jnp.arange(4, dtype=jnp.int32),
            "b": jnp.asarray([True, False]),
            "f": jnp.ones((3,), jnp.float32),
            "py": 17,
        }
        for mode in (1, 2):
            out = _perturb_inputs(tree, mode)
            assert out["py"] == 17
            np.testing.assert_array_equal(np.asarray(out["i"]), np.arange(4))
            np.testing.assert_array_equal(np.asarray(out["b"]), [True, False])

    def test_perturbed_jit_matches_unperturbed(self):
        def fn(x, s):
            return jnp.tanh(x) * s["g"] + jnp.cumsum(x)

        x = jnp.linspace(-2.0, 2.0, 64, dtype=jnp.float32)
        s = {"g": jnp.float32(0.75)}
        want = jax.jit(fn)(x, s)
        for mode in (1, 2):
            got = jax.jit(lambda *a: fn(*_perturb_inputs(a, mode)))(x, s)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestJaxprShuffle:
    @staticmethod
    def _demo_fn(x, g):
        # independent subexpressions (reorderable) + a scan (inner body
        # must be reordered too — that's where streaming renders live)
        a = jnp.tanh(x) * g
        b = jnp.cumsum(x) + 2.0
        c = x**2 - 1.0

        def body(carry, t):
            u = carry * 0.5
            v = t + 1.0
            return u + v, u * v

        carry, ys = jax.lax.scan(body, x.sum(), x)
        return a + b + c + carry, ys

    def test_seed0_is_identity(self):
        x, g = jnp.linspace(-1, 1, 32, dtype=jnp.float32), jnp.float32(0.7)
        closed = jax.make_jaxpr(self._demo_fn)(x, g)
        assert str(permute_closed_jaxpr(closed, 0)) == str(closed)

    def test_nonzero_seed_changes_emission_order(self):
        x, g = jnp.linspace(-1, 1, 32, dtype=jnp.float32), jnp.float32(0.7)
        closed = jax.make_jaxpr(self._demo_fn)(x, g)
        perm = permute_closed_jaxpr(closed, 1)
        assert str(perm) != str(closed)
        # ... but with an identical op multiset (ordering-only difference)
        def histo(jaxpr, h):
            for eq in jaxpr.eqns:
                h[eq.primitive.name] = h.get(eq.primitive.name, 0) + 1
                for v in eq.params.values():
                    if hasattr(v, "jaxpr"):
                        histo(v.jaxpr, h)
            return h

        assert histo(closed.jaxpr, {}) == histo(perm.jaxpr, {})

    @pytest.mark.parametrize("seed", [1, 2, 7])
    def test_shuffled_bit_exact(self, seed):
        x, g = jnp.linspace(-2, 2, 64, dtype=jnp.float32), jnp.float32(1.3)
        want = jax.jit(self._demo_fn)(x, g)
        got = jax.jit(shuffled(self._demo_fn, seed))(x, g)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("seed", [1, 2])
    def test_shuffled_reverb_chunk_bit_exact(self, seed):
        """The actual sticky program class: a ctx-path reverb chunk render."""
        import firewheel_tpu as fw
        from firewheel_tpu.nodes import BeepTestNode, VolumeNode
        from firewheel_tpu.nodes.reverb import ConvolutionReverbNode

        rng = np.random.default_rng(3)
        ir = (rng.standard_normal(512) * np.exp(-np.arange(512) / 80.0)).astype(
            np.float32
        )
        g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
        beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        rev = g.add_node(2, 2, ConvolutionReverbNode(np.stack([ir, ir]), wet=0.4))
        vol = g.add_node(2, 2, VolumeNode(100.0))
        go = g.graph_out_node()
        for ch in range(2):
            g.connect(beep, ch, rev, ch)
            g.connect(rev, ch, vol, ch)
            g.connect(vol, ch, go, ch)
        pkg = g.compile(48000, 128)
        prog = fw.ScheduleProgram(
            pkg.schedule, dict(pkg.new_node_processors), 48000
        )
        state, params = prog.init_state(), prog.collect_params()
        chunk = prog.chunk_fn(4)
        gi = jnp.zeros((4, 0, 128), jnp.float32)
        im = jnp.zeros((4, 0), bool)
        s0 = jnp.uint32(0)
        st = jnp.uint32(0)
        want = jax.jit(chunk)(params, state, gi, im, s0, st)
        got = jax.jit(shuffled(chunk, seed))(params, state, gi, im, s0, st)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class _FlakyFn:
    """Raises a retryable-looking error for the first ``fails`` traces."""

    def __init__(self, fails: int, msg: str = "UNIMPLEMENTED: fake tunnel"):
        self.fails = fails
        self.traces = 0
        self.msg = msg

    def __call__(self, x):
        self.traces += 1
        if self.traces <= self.fails:
            raise RuntimeError(self.msg)
        return x * 2.0


class TestResilientJit:
    def test_healthy_path_no_retries(self):
        fn = _FlakyFn(0)
        rj = _ResilientJit(fn, "healthy")
        out = rj(jnp.float32(3.0))
        assert float(out) == 6.0
        assert rj._attempt == 0 and rj._ok

    @pytest.mark.parametrize("fails", [1, 2, 3, 4])
    def test_ladder_recovers(self, fails):
        fn = _FlakyFn(fails)
        rj = _ResilientJit(fn, f"flaky{fails}")
        x = jnp.asarray([1.0, -0.0, np.inf], jnp.float32)
        out = np.asarray(rj(x))
        np.testing.assert_array_equal(out, np.asarray(x) * 2.0)
        assert rj._attempt == fails
        # steady state: no further retraces
        rj(x)
        assert fn.traces == fails + 1

    def test_gives_up_after_max_attempts(self):
        fn = _FlakyFn(99)
        rj = _ResilientJit(fn, "hopeless")
        with pytest.raises(RuntimeError, match="UNIMPLEMENTED"):
            rj(jnp.float32(1.0))
        assert rj._attempt == rj._MAX_ATTEMPTS

    def test_non_retryable_error_propagates_immediately(self):
        fn = _FlakyFn(99, msg="ValueError: user bug, not the tunnel")
        rj = _ResilientJit(fn, "userbug")
        with pytest.raises(RuntimeError, match="user bug"):
            rj(jnp.float32(1.0))
        assert rj._attempt == 0
