"""Doppler spatializer: physical propagation delay + pitch shift.

Pins the physics: a static emitter is a pure distance/c delay of the
non-doppler path; an emitter approaching at constant radial speed v
shifts a tone by c/(c−v) (classic moving-source Doppler), emerging from
the time-varying fractional tap — no playback-rate hack involved.
Ref scope: DESIGN_DOC.md:21 "spatial positioning"; module docstring in
nodes/spatial.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    BlockInfo,
    ScheduleProgram,
)
from firewheel_tpu.nodes.spatial import Spatializer3DNode
from firewheel_tpu.testing import validate_node

SR, F = 48000, 128
C = 343.0


def build_prog(node):
    g = AudioGraph(AudioGraphConfig(1, 2))
    nid = g.add_node(1, 2, node)
    g.connect(g.graph_in_node(), 0, nid, 0)
    for ch in range(2):
        g.connect(nid, ch, g.graph_out_node(), ch)
    pkg = g.compile(SR, F)
    return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)


def render(prog, node, x, position_per_block=None):
    state = prog.init_state()
    n_blocks = len(x) // F
    outs = []
    for b in range(n_blocks):
        if position_per_block is not None:
            node.set_position(position_per_block(b))
        params = prog.collect_params()
        info = BlockInfo.make(
            stream_time_secs=b * F / SR, stream_sample=b * F
        )
        gi = jnp.asarray(x[b * F : (b + 1) * F], jnp.float32)[None, :]
        im = jnp.zeros((1,), bool)
        out, _om, state = prog.render_block(params, state, gi, im, info)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1)


def test_static_emitter_is_pure_delay():
    """At rest, doppler=True == the plain path delayed by distance/c."""
    tau = 480  # samples -> d = 343 * 480/48000 = 3.43 m
    d = C * tau / SR
    pos = (0.0, 0.0, -d)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(F * 40).astype(np.float32) * 0.3

    plain = Spatializer3DNode(pos)
    dopp = Spatializer3DNode(pos, doppler=True)
    out_p = render(build_prog(plain), plain, x)
    out_d = render(build_prog(dopp), dopp, x)

    # arrival latency: silent until the wavefront lands
    assert np.abs(out_d[:, : tau - 1]).max() < 1e-6
    # after the lowpass transient dies, the paths coincide shifted by tau
    a = out_d[:, tau + 2000 :]
    bseg = out_p[:, 2000 : out_p.shape[1] - tau]
    np.testing.assert_allclose(a, bseg, atol=2e-5, rtol=0)


@pytest.mark.parametrize("v,sign", [(17.15, +1), (17.15, -1)])
def test_moving_source_doppler_shift(v, sign):
    """Approaching at v: f' = f·c/(c−v); receding: f' = f·c/(c+v)."""
    f0 = 1000.0
    d0 = 40.0 if sign > 0 else 20.0
    secs = 1.0
    n = int(secs * SR) // F * F
    t = np.arange(n, dtype=np.float64) / SR
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32) * 0.5

    node = Spatializer3DNode(
        (0.0, 0.0, -d0), doppler=True, motion_smooth_secs=0.01
    )
    prog = build_prog(node)

    def pos_at(block):
        # radial motion along -z: approaching (sign>0) shrinks distance
        dist = d0 - sign * v * (block * F / SR)
        return (0.0, 0.0, -max(dist, 1.0))

    out = render(prog, node, x, position_per_block=pos_at)

    # steady-state mid-window FFT (skip attack + smoothing transient)
    w0, w1 = int(0.3 * SR), int(0.9 * SR)
    seg = out[0, w0:w1] * np.hanning(w1 - w0)
    spec = np.abs(np.fft.rfft(seg))
    f_peak = np.argmax(spec) * SR / (w1 - w0)
    expected = f0 * C / (C - sign * v)
    assert abs(f_peak - expected) < 6.0, (
        f"measured {f_peak:.1f} Hz, expected {expected:.1f} Hz "
        f"({'approaching' if sign > 0 else 'receding'})"
    )


def test_doppler_node_passes_contract():
    report = validate_node(
        Spatializer3DNode((0, 0, -5), doppler=True), 1, 2
    )
    assert report["jit"] == "ok" and report["scan"] == "ok"
    assert report["supports_megakernel"] == "opted out"


def test_plain_node_still_megakernel_eligible():
    proc = Spatializer3DNode((0, 0, -5)).activate(SR, F, 1, 2)
    assert proc.supports_megakernel


def test_scene_roundtrip_with_doppler():
    from firewheel_tpu import load_graph, save_graph
    import tempfile, os

    g = AudioGraph(AudioGraphConfig(1, 2))
    node = Spatializer3DNode(
        (1.0, 0.0, -7.0), doppler=True, max_distance_m=50.0,
        motion_smooth_secs=0.02,
    )
    nid = g.add_node(1, 2, node)
    g.connect(g.graph_in_node(), 0, nid, 0)
    for ch in range(2):
        g.connect(nid, ch, g.graph_out_node(), ch)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.npz")
        save_graph(g, path)
        g2, _meta = load_graph(path)
        n2 = [g2.node(e.id) for e in g2.nodes()
              if type(g2.node(e.id)).__name__ == "Spatializer3DNode"][0]
    assert bool(n2.doppler) is True
    assert float(n2.max_distance_m) == 50.0
    assert abs(float(n2.motion_smooth_secs) - 0.02) < 1e-9


class TestOcclusion:
    """set_occlusion: the obstructed direct path loses level and highs
    (game-engine occlusion model — the game raycasts, the engine shades)."""

    def _render_noise(self, occlusion):
        rng = np.random.default_rng(9)
        x = rng.standard_normal(16 * F).astype(np.float32) * 0.25
        node = Spatializer3DNode((0.0, 0.0, -2.0))
        node.set_occlusion(occlusion)
        prog = build_prog(node)
        return render(prog, node, x), x

    def test_zero_occlusion_is_identity_with_before(self):
        out0, _ = self._render_noise(0.0)
        node = Spatializer3DNode((0.0, 0.0, -2.0))  # never touched
        prog = build_prog(node)
        rng = np.random.default_rng(9)
        x = rng.standard_normal(16 * F).astype(np.float32) * 0.25
        ref = render(prog, node, x)
        np.testing.assert_array_equal(out0, ref)

    def test_full_occlusion_attenuates_and_darkens(self):
        clear, _ = self._render_noise(0.0)
        occl, _ = self._render_noise(1.0)
        # steady-state segment (skip the 10 ms gain ramp)
        s = slice(4 * F, None)
        rms_clear = np.sqrt((clear[:, s] ** 2).mean())
        rms_occl = np.sqrt((occl[:, s] ** 2).mean())
        # level drop: ≥12 dB (18 dB gain cut minus lowpass interplay)
        assert rms_occl < rms_clear * 10 ** (-12 / 20)
        # darker: spectral centroid far lower
        def centroid(sig):
            spec = np.abs(np.fft.rfft(sig[0, s]))
            freqs = np.fft.rfftfreq(sig[0, s].size, 1 / SR)
            return (spec * freqs).sum() / spec.sum()
        # one-pole skirt is 6 dB/oct: centroid halves, not vanishes
        assert centroid(occl) < centroid(clear) * 0.6

    def test_half_occlusion_between(self):
        clear, _ = self._render_noise(0.0)
        half, _ = self._render_noise(0.5)
        occl, _ = self._render_noise(1.0)
        s = slice(4 * F, None)
        r = [np.sqrt((o[:, s] ** 2).mean()) for o in (clear, half, occl)]
        assert r[0] > r[1] > r[2]
