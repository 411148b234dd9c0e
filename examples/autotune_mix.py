"""Differentiable mixing: gradient-descend node parameters to hit a target.

A capability unique to the TPU-native engine (pure-JAX kernels): the whole
compiled graph render is differentiable, so mixing decisions become an
optimization problem.  Here three detuned voices with unknown gains are
auto-balanced so the rendered mix matches a target loudness profile —
`jax.grad` flows through beeps, smoothers, pans and the sum node.

Run:  python examples/autotune_mix.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
from firewheel_tpu.nodes import BeepTestNode, StereoPanNode, SumNode, VolumeNode

SR, F = 48000, 256


def main():
    g = AudioGraph(AudioGraphConfig(0, 2))
    vols = []
    mixer = g.add_node(6, 2, SumNode())
    for i, freq in enumerate((220.0, 440.0, 880.0)):
        beep = g.add_node(0, 2, BeepTestNode(freq, -6.0, True))
        vol = g.add_node(2, 2, VolumeNode(100.0))
        g.connect(beep, 0, vol, 0)
        g.connect(beep, 1, vol, 1)
        g.connect(vol, 0, mixer, 2 * i)
        g.connect(vol, 1, mixer, 2 * i + 1)
        vols.append(vol)
    pan = g.add_node(2, 2, StereoPanNode(0.0))
    g.connect(mixer, 0, pan, 0)
    g.connect(mixer, 1, pan, 1)
    g.connect(pan, 0, g.graph_out_node(), 0)
    g.connect(pan, 1, g.graph_out_node(), 1)

    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    base_params = prog.collect_params()
    keys = [node_key(v) for v in vols]
    gi = jnp.zeros((0, F), jnp.float32)
    im = jnp.zeros((0,), bool)
    info = BlockInfo.make()

    # target: each voice contributes RMS 0.05 / 0.10 / 0.02
    target = jnp.asarray([0.05, 0.10, 0.02])

    def render_rms(gains):
        p = dict(base_params)
        for k, gval in zip(keys, gains):
            p[k] = {"raw_gain": gval}
        st = prog.init_state()
        out = None
        # render past the 10 ms gain smoothers (settle ≈ 5500 samples) and
        # measure only the final, settled block
        for _ in range(24):
            out, _, st = prog.render_fn(p, st, gi, im, info)
        return out

    def voice_rms(gains):
        # probe each voice alone by zeroing the others (differentiably)
        rms = []
        for i in range(3):
            sel = jnp.zeros(3).at[i].set(1.0)
            out = render_rms(gains * sel)
            rms.append(jnp.sqrt(jnp.mean(out**2)))
        return jnp.stack(rms)

    def loss(gains):
        return jnp.sum((voice_rms(gains) - target) ** 2)

    grad = jax.jit(jax.grad(loss))
    loss_j = jax.jit(loss)
    gains = jnp.asarray([0.5, 0.5, 0.5])
    print("initial loss:", float(loss_j(gains)))
    for step in range(80):
        gains = jnp.clip(gains - 8.0 * grad(gains), 0.0, 4.0)
        if step % 20 == 19:
            print(f"step {step+1}: loss {float(loss_j(gains)):.2e}, "
                  f"gains {np.asarray(gains).round(4)}")
    got = np.asarray(voice_rms(gains))
    print("target per-voice rms:", np.asarray(target))
    print("achieved per-voice rms:", got.round(4))
    assert float(loss_j(gains)) < 1e-6
    print("auto-mix converged ✓")


if __name__ == "__main__":
    main()
