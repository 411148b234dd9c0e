"""64-voice mixer: sample players with resampling → summation → gain/pan bus.

BASELINE config #3 ("64-voice mixer: sample players + resampling →
summation → gain/pan bus").  64 sampler voices loop short clips at
per-voice playback rates (doppler-style detune), feed a 128→2 summation,
then a volume/pan/clip master bus.  Rendered offline to a WAV.

Run:  python examples/voice_mixer_64.py [out.wav]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from firewheel_tpu import (
    FirewheelCtx,
    SampleResource,
    StreamConfig,
    WavSink,
)
from firewheel_tpu.nodes import (
    HardClipNode,
    LoopRange,
    SamplerNode,
    StereoPanNode,
    SumNode,
    VolumeNode,
)

SR = 48000
NUM_VOICES = 64


def make_clip(seed: int) -> SampleResource:
    """A short enveloped pluck, unique per voice."""
    rng = np.random.default_rng(seed)
    n = SR // 4
    t = np.arange(n, dtype=np.float32)
    freq = 55.0 * 2 ** (rng.integers(0, 25) / 12.0)
    tone = np.sin(2 * np.pi * freq / SR * t) + 0.3 * np.sin(
        2 * np.pi * 2 * freq / SR * t
    )
    env = np.exp(-t / (SR * 0.08)).astype(np.float32)
    return SampleResource((tone * env * 0.15)[None, :].astype(np.float32))


def main(out_path: str = "voice_mixer_64.wav"):
    cx = FirewheelCtx()
    g = cx.graph_mut()

    # Two-stage summation: nodes are capped at 64 ports (the engine-wide
    # silence-mask width, node.rs:62,69), so 64 stereo voices mix through
    # 4 group sums of 16 voices each.
    groups = 4
    per_group = NUM_VOICES // groups
    group_sums = [g.add_node(2 * per_group, 2, SumNode()) for _ in range(groups)]
    mixer = g.add_node(2 * groups, 2, SumNode())
    for gi, grp in enumerate(group_sums):
        g.connect(grp, 0, mixer, 2 * gi)
        g.connect(grp, 1, mixer, 2 * gi + 1)
    voices = []
    for i in range(NUM_VOICES):
        smp = g.add_node(0, 2, SamplerNode(80.0, poolable=True))
        grp = group_sums[i // per_group]
        slot = i % per_group
        g.connect(smp, 0, grp, 2 * slot)
        g.connect(smp, 1, grp, 2 * slot + 1)
        voices.append(smp)

    bus_vol = g.add_node(2, 2, VolumeNode(70.0))
    bus_pan = g.add_node(2, 2, StereoPanNode(0.0))
    clip = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(mixer, 0, bus_vol, 0)
    g.connect(mixer, 1, bus_vol, 1)
    g.connect(bus_vol, 0, bus_pan, 0)
    g.connect(bus_vol, 1, bus_pan, 1)
    g.connect(bus_pan, 0, clip, 0)
    g.connect(bus_pan, 1, clip, 1)
    g.connect(clip, 0, g.graph_out_node(), 0)
    g.connect(clip, 1, g.graph_out_node(), 1)

    # load + start the voices: looped clips, detuned playback rates
    # (sampler resampling), staggered starts via seeks
    for i, vid in enumerate(voices):
        node = g.node(vid)
        node.set_sample(make_clip(seed=i))
        node.set_loop_range(LoopRange.FULL)
        node.set_playback_rate(2 ** ((i % 7 - 3) / 12.0))  # ±3 semitones
        node.set_playhead((i % 16) / 64.0)
        node.set_envelope(0.004, 0.004)
        node.play()

    sink = WavSink(out_path, SR, 2)
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=1024, chunk_buffers=8), sink=sink
    )
    cx.render_offline(2.0)
    stats = cx.stream.stats()
    cx.deactivate()

    print(
        f"rendered 2.0 s of {NUM_VOICES}-voice mix → {out_path}  "
        f"(render/buffer p50 {stats['render_ms_p50']:.2f} ms, "
        f"p99 {stats['render_ms_p99']:.2f} ms incl. one-time compiles / "
        f"{stats['buffer_budget_ms']:.2f} ms budget)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:2])
