"""Scene-file round trips: save_graph/load_graph over every node class.

Contract: a loaded scene compiles to a schedule that renders
bit-identically to the original graph's (same params, same structure,
same arrays), and the node-id map lets callers re-acquire live handles.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    AudioGraph,
    AudioGraphConfig,
    ScheduleProgram,
    load_graph,
    save_graph,
)
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import (
    BeepTestNode,
    BinauralSpatializerNode,
    CompressorNode,
    ConvolutionReverbNode,
    DbMeterNode,
    DelayCompNode,
    DuckerNode,
    EchoNode,
    EQBand,
    FilterNode,
    FilterType,
    FirFilterNode,
    GateNode,
    HardClipNode,
    LFONode,
    LimiterNode,
    LoopRange,
    LoudnessMeterNode,
    ModDelayNode,
    MonoToStereoNode,
    NoiseNode,
    ParametricEQNode,
    SamplerNode,
    Spatializer3DNode,
    StereoPanNode,
    StereoToMonoNode,
    StereoWidthNode,
    SumNode,
    TremoloNode,
    VolumeNode,
    WaveshaperNode,
    design_windowed_sinc,
)

SR, F = 48000, 128
RNG = np.random.default_rng(17)


def kitchen_sink():
    """One graph containing every serializable node class."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(330.0, -15.0, True))
    noise = g.add_node(0, 2, NoiseNode("pink", gain_db=-24.0, seed=99))
    lfo = g.add_node(0, 2, LFONode("triangle", freq_hz=2.5, depth=0.8))

    smp_node = SamplerNode(percent_volume=90.0, quality="cubic")
    clip = RNG.standard_normal((2, 4000)).astype(np.float32) * 0.2
    smp_node.set_sample(SampleResource(clip, sample_rate=44100.0))
    smp_node.set_loop_range(LoopRange.range_secs(0.01, 0.08))
    smp_node.set_playback_rate(1.25)
    smp = g.add_node(0, 2, smp_node)

    duck = g.add_node(4, 2, DuckerNode(threshold_db=-35.0, duck_db=-9.0))
    mix = g.add_node(8, 2, SumNode())
    vol = g.add_node(2, 2, VolumeNode(70.0))
    pan = g.add_node(2, 2, StereoPanNode(-0.3))
    wid = g.add_node(2, 2, StereoWidthNode(1.4))
    filt = g.add_node(2, 2, FilterNode(FilterType.PEAKING, 2000.0, 1.2, 4.0))
    fir = g.add_node(
        2, 2, FirFilterNode(design_windowed_sinc("lowpass", 33, SR, 9000.0),
                            gain=0.9)
    )
    echo = g.add_node(2, 2, EchoNode(delay_secs=0.05, feedback=0.25, wet=0.3))
    dc = g.add_node(2, 2, DelayCompNode(delay_frames=64))
    ir = (RNG.standard_normal((2, 600)) * 0.1).astype(np.float32)
    rev = g.add_node(2, 2, ConvolutionReverbNode(ir, wet=0.2, method="direct"))
    comp = g.add_node(2, 2, CompressorNode(threshold_db=-20.0, ratio=3.0))
    gaten = g.add_node(
        2, 2, GateNode(threshold_db=-55.0, range_db=-70.0, hold_secs=0.02)
    )
    lim = g.add_node(2, 2, LimiterNode(ceiling_db=-2.0))
    clipn = g.add_node(2, 2, HardClipNode(-0.5))
    meter = g.add_node(2, 2, DbMeterNode())
    loud = g.add_node(2, 2, LoudnessMeterNode())
    chorus = g.add_node(2, 2, ModDelayNode.chorus(rate_hz=1.2, mix=0.4))
    flanger = g.add_node(2, 2, ModDelayNode.flanger(feedback=0.5))
    trem = g.add_node(2, 2, TremoloNode(rate_hz=4.0, depth=0.6, bipolar=False))
    eq = g.add_node(2, 2, ParametricEQNode([
        EQBand(FilterType.LOW_SHELF, 130.0, 0.9, 3.0),
        EQBand(FilterType.PEAKING, 1800.0, 1.4, -5.0, enabled=False),
        EQBand(FilterType.HIGH_SHELF, 7500.0, 0.7, 2.0),
    ]))
    shaper = g.add_node(
        2, 2, WaveshaperNode("soft", drive_db=9.0, mix=0.6, dc_block=True)
    )

    s2m = g.add_node(2, 1, StereoToMonoNode())
    spat = g.add_node(1, 2, Spatializer3DNode((1.0, 0.0, -2.0), rolloff=0.7))
    binaural = g.add_node(1, 2, BinauralSpatializerNode((-0.5, 0.2, -1.0)))
    m2s = g.add_node(1, 2, MonoToStereoNode())

    for c in range(2):
        g.connect(noise, c, duck, c)
        g.connect(beep, c, duck, 2 + c)      # sidechain
        g.connect(duck, c, mix, c)
        g.connect(beep, c, mix, 2 + c)
        g.connect(lfo, c, mix, 4 + c)
        g.connect(smp, c, mix, 6 + c)
        g.connect(mix, c, vol, c)
        g.connect(vol, c, pan, c)
        g.connect(pan, c, chorus, c)
        g.connect(chorus, c, trem, c)
        g.connect(trem, c, wid, c)
        g.connect(wid, c, filt, c)
        g.connect(filt, c, eq, c)
        g.connect(eq, c, shaper, c)
        g.connect(shaper, c, fir, c)
        g.connect(fir, c, echo, c)
        g.connect(echo, c, dc, c)
        g.connect(dc, c, flanger, c)
        g.connect(flanger, c, rev, c)
        g.connect(rev, c, comp, c)
        g.connect(comp, c, gaten, c)
        g.connect(gaten, c, lim, c)
        g.connect(lim, c, clipn, c)
        g.connect(clipn, c, meter, c)
        g.connect(meter, c, loud, c)
        g.connect(loud, c, s2m, min(c, 1))
    # mono branch: s2m -> spatializer -> graph_out; binaural/m2s stay
    # unconnected on purpose (serialization must keep edge-less nodes)
    g.connect(s2m, 0, spat, 0)
    g.connect(spat, 0, g.graph_out_node(), 0)
    g.connect(spat, 1, g.graph_out_node(), 1)
    return g, {"smp": smp, "binaural": binaural, "m2s": m2s}


def render(g, blocks=8, play_keys=()):
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    state = prog.init_state()
    outs = []
    for i in range(blocks):
        params = prog.collect_params()
        o, om, state = prog.render_chunk(
            params, state,
            jnp.zeros((1, 0, F), jnp.float32), jnp.zeros((1, 0), bool),
            i * F,
        )
        outs.append(np.asarray(o))
    return np.concatenate(outs, axis=0)


def test_kitchen_sink_roundtrip(tmp_path):
    g, ids = kitchen_sink()
    # exercise the disconnected-node path too: binaural/m2s exist without
    # edges (serialization must keep them)
    path = str(tmp_path / "scene.npz")
    save_graph(g, path)
    g2, idmap = load_graph(path)

    # structural parity
    n1 = sorted(type(e.weight.node).__name__ for e in g.nodes())
    n2 = sorted(type(e.weight.node).__name__ for e in g2.nodes())
    assert n1 == n2
    assert len(list(g.edges())) == len(list(g2.edges()))

    # the reloaded sampler carries its clip, rate, loop and quality
    smp2 = None
    for e in g2.nodes():
        if type(e.weight.node).__name__ == "SamplerNode":
            smp2 = e.weight.node
    assert smp2 is not None
    assert smp2.quality == "cubic"
    assert smp2._rate == 1.25
    assert smp2._sample is not None and smp2._sample.sample_rate == 44100.0
    assert smp2._loop is not None and smp2._loop.end_secs == 0.08

    # start playback identically on both sides, then bit-exact render
    g.node(ids["smp"]).play()
    smp2.play()
    a = render(g)
    b = render(g2)
    np.testing.assert_array_equal(a, b)


def test_granular_sampler_roundtrip(tmp_path):
    """Granular config (structural grain params + live tempo/pitch +
    clip) round-trips; transient control state (playing/seek) does not
    (module contract) — both sides re-play and render bit-identically."""
    from firewheel_tpu.nodes import GranularSamplerNode

    g = AudioGraph(AudioGraphConfig(0, 2))
    node = GranularSamplerNode(
        percent_volume=80.0, grain_frames=1024, overlap=4, align=True
    )
    clip = RNG.standard_normal((2, 5000)).astype(np.float32) * 0.2
    node.set_sample(SampleResource(clip, sample_rate=44100.0))
    node.set_tempo(0.8)
    node.set_pitch_semitones(3.0)
    gid = g.add_node(0, 2, node)
    for c in range(2):
        g.connect(gid, c, g.graph_out_node(), c)

    path = str(tmp_path / "gran.npz")
    save_graph(g, path)
    g2, idmap = load_graph(path)
    n2 = None
    for e in g2.nodes():
        if type(e.weight.node).__name__ == "GranularSamplerNode":
            n2 = e.weight.node
    assert n2 is not None
    assert n2.grain_frames == 1024 and n2.overlap == 4 and n2.align is True
    assert n2._tempo == node._tempo and n2._pitch_rate == node._pitch_rate
    assert n2._sample is not None and n2._sample.sample_rate == 44100.0
    assert not n2.is_playing()  # transient state excluded

    node.play()
    n2.play()
    a = render(g)
    b = render(g2)
    np.testing.assert_array_equal(a, b)


def test_unknown_node_class_fails_loudly(tmp_path):
    from firewheel_tpu.core.node import (
        AudioNode, AudioNodeInfo, NodeProcessor,
    )

    class WeirdNode(AudioNode):
        debug_name = "weird"

        def info(self):
            return AudioNodeInfo(0, 2, 1, 2)

        def activate(self, sample_rate, max_block_frames, ni, no):
            p = NodeProcessor(sample_rate, max_block_frames, ni, no)
            return p

    g = AudioGraph(AudioGraphConfig(0, 2))
    g.add_node(1, 1, WeirdNode())
    with pytest.raises(TypeError, match="no serialization spec"):
        save_graph(g, str(tmp_path / "x.npz"))


def test_streaming_sampler_reader_path_roundtrip(tmp_path):
    from firewheel_tpu.nodes import StreamingSamplerNode
    from firewheel_tpu.utils.wav import WavStreamReader, write_wav

    wav = str(tmp_path / "clip.wav")
    write_wav(wav, RNG.standard_normal((2, SR // 4)).astype(np.float32) * 0.1, SR)

    g = AudioGraph(AudioGraphConfig(0, 2))
    node = StreamingSamplerNode(WavStreamReader(wav), percent_volume=60.0)
    s = g.add_node(0, 2, node)
    g.connect(s, 0, g.graph_out_node(), 0)
    g.connect(s, 1, g.graph_out_node(), 1)

    path = str(tmp_path / "scene.npz")
    save_graph(g, path)
    g2, idmap = load_graph(path)
    node2 = [e.weight.node for e in g2.nodes()
             if type(e.weight.node).__name__ == "StreamingSamplerNode"][0]
    assert node2._reader is not None and node2._reader.path == wav
    assert node2._percent_volume == 60.0


def test_graph_io_config_roundtrip(tmp_path):
    g = AudioGraph(AudioGraphConfig(num_graph_inputs=3, num_graph_outputs=4))
    v = g.add_node(3, 3, DbMeterNode())
    for c in range(3):
        g.connect(g.graph_in_node(), c, v, c)
        g.connect(v, c, g.graph_out_node(), c)
    path = str(tmp_path / "io.npz")
    save_graph(g, path)
    g2, _ = load_graph(path)
    assert g2.node_info(g2.graph_in_node()).num_outputs == 3
    assert g2.node_info(g2.graph_out_node()).num_inputs == 4
    g2.compile(SR, F)  # edges reconnected across sentinels


def test_register_custom_node_class(tmp_path):
    from firewheel_tpu.core.node import (
        AudioNode, AudioNodeInfo, NodeProcessor,
    )
    from firewheel_tpu.graph.serialize import register_node_class

    class BitCrushNode(AudioNode):
        debug_name = "bit_crush"

        def __init__(self, levels=16.0):
            self.levels = float(levels)

        def info(self):
            return AudioNodeInfo(1, 64, 1, 64)

        def activate(self, sample_rate, max_block_frames, ni, no):
            return NodeProcessor(sample_rate, max_block_frames, ni, no)

    register_node_class(BitCrushNode, scalar_attrs=["levels"])
    try:
        g = AudioGraph(AudioGraphConfig(0, 2))
        bc = g.add_node(2, 2, BitCrushNode(levels=7.0))
        g.connect(bc, 0, g.graph_out_node(), 0)
        path = str(tmp_path / "custom.npz")
        save_graph(g, path)
        g2, ids = load_graph(path)
        node2 = g2.node(ids[[k for k in ids if k.startswith("bit_crush")][0]])
        assert type(node2).__name__ == "BitCrushNode"
        assert node2.levels == 7.0
    finally:
        from firewheel_tpu.graph import serialize as _ser
        _ser._EXTRA_CLASSES.pop("BitCrushNode", None)
        _ser._SCALAR_ATTRS.pop("BitCrushNode", None)


def test_missing_reader_path_loads_gracefully(tmp_path, capsys):
    from firewheel_tpu.nodes import StreamingSamplerNode
    from firewheel_tpu.utils.wav import WavStreamReader, write_wav

    wav = str(tmp_path / "gone.wav")
    write_wav(wav, np.zeros((2, 256), np.float32), SR)
    g = AudioGraph(AudioGraphConfig(0, 2))
    s = g.add_node(0, 2, StreamingSamplerNode(WavStreamReader(wav)))
    g.connect(s, 0, g.graph_out_node(), 0)
    path = str(tmp_path / "scene.npz")
    save_graph(g, path)
    import os
    os.remove(wav)
    g2, _ = load_graph(path)  # must not raise
    node2 = [e.weight.node for e in g2.nodes()
             if type(e.weight.node).__name__ == "StreamingSamplerNode"][0]
    assert node2._reader is None


def test_newer_scene_version_rejected(tmp_path):
    import json as _json

    g = AudioGraph(AudioGraphConfig(0, 2))
    path = str(tmp_path / "v.npz")
    save_graph(g, path)
    data = dict(np.load(path))
    scene = _json.loads(bytes(data["__scene__"]).decode())
    scene["version"] = 999
    data["__scene__"] = np.frombuffer(_json.dumps(scene).encode(), np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **data)
    with pytest.raises(ValueError, match="newer than this engine"):
        load_graph(path)


def test_tuple_attrs_roundtrip_generically(tmp_path):
    g = AudioGraph(AudioGraphConfig(0, 2))
    sp = g.add_node(1, 2, Spatializer3DNode((0.5, -0.25, -3.0)))
    g.connect(sp, 0, g.graph_out_node(), 0)
    path = str(tmp_path / "t.npz")
    save_graph(g, path)
    g2, _ = load_graph(path)
    node2 = [e.weight.node for e in g2.nodes()
             if type(e.weight.node).__name__ == "Spatializer3DNode"][0]
    assert node2._position == (0.5, -0.25, -3.0)
    assert isinstance(node2._position, tuple)
