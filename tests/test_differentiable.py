"""Differentiable rendering: gradients flow through the compiled graph.

Neither the reference nor its design doc imagines this, but it falls out of
the TPU-native design (pure kernels under JAX transforms): any scalar loss
of rendered audio differentiates with respect to node params — parameter
fitting, automatic mixing, audio-ML training loops.
"""

import numpy as np
import jax
import jax.numpy as jnp

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    BlockInfo,
    ScheduleProgram,
)
from firewheel_tpu.executor import node_key
from firewheel_tpu.nodes import BeepTestNode, StereoPanNode, VolumeNode

SR = 48000
F = 256


def build():
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    pan = g.add_node(2, 2, StereoPanNode(0.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, pan, 0)
    g.connect(vol, 1, pan, 1)
    g.connect(pan, 0, g.graph_out_node(), 0)
    g.connect(pan, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    return prog, vol, pan


def test_gradient_through_render():
    prog, vol, pan = build()
    params = prog.collect_params()
    state = prog.init_state()
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    info = BlockInfo.make()
    vk = node_key(vol)

    def loss(raw_gain):
        p = dict(params)
        p[vk] = {"raw_gain": raw_gain}
        # settle the smoother by reusing a state whose smoother already sits
        # at the target: reset-like init via fresh state + many blocks is
        # slow; instead differentiate through two blocks
        out, _, st = prog.render_fn(p, state, gi, im, info)
        out2, _, _ = prog.render_fn(p, st, gi, im, info)
        return jnp.mean(out2**2)

    # evaluate away from the smoother's settled point (at exactly the init
    # value the inactive branch holds the flat state value — a true plateau)
    g = jax.grad(loss)(jnp.float32(0.7))
    assert np.isfinite(float(g))
    # energy grows with gain → positive gradient
    assert float(g) > 0


def test_fit_pan_to_target_balance():
    """Optimize the pan position to match a target L/R energy ratio with
    plain gradient descent through the full graph render."""
    prog, vol, pan = build()
    params = prog.collect_params()
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    info = BlockInfo.make()
    pk = node_key(pan)

    target_ratio = 0.25  # left energy / total

    def loss(pan_pos):
        p = dict(params)
        p[pk] = {"pan": pan_pos}
        st = prog.init_state()
        # two blocks so the pan smoother approaches the commanded position
        out = None
        for _ in range(3):
            out, _, st = prog.render_fn(p, st, gi, im, info)
        le = jnp.mean(out[0] ** 2)
        re = jnp.mean(out[1] ** 2)
        ratio = le / (le + re + 1e-12)
        return (ratio - target_ratio) ** 2

    grad_fn = jax.jit(jax.grad(loss))
    # start off the smoother's settled point (0.0): exactly there the
    # inactive branch is a flat plateau with zero gradient
    pos = jnp.float32(0.3)
    for _ in range(60):
        pos = pos - 2.0 * grad_fn(pos)
    final = float(loss(pos))
    assert final < 1e-4, f"did not converge: loss={final}, pan={float(pos)}"
    assert float(pos) > 0.1  # panned right of center to dim the left
