"""Mastering bus: dynamics + loudness workflow.

A music bed (pink noise) and a dialogue voice (beep) run through the
game-audio master chain:

    music ──┐
            ├── ducker (dialogue sidechain) ── compressor ──
    voice ──┘      linear-phase FIR high-shelf ── limiter ── out
                                                      │
                                               loudness meter

While the stream runs, dialogue toggles on and off (the music ducks under
it), and the loudness meter is polled every ~100 ms to feed the EBU R128
integrated-loudness gate.  Finishes by printing the measured program
loudness and writing the bounce to a WAV file.

Run:  python examples/mastering_bus.py [out.wav]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from firewheel_tpu import FirewheelCtx, StreamConfig
from firewheel_tpu.backend.stream import WavSink
from firewheel_tpu.nodes import (
    BeepTestNode,
    CompressorNode,
    DuckerNode,
    FirFilterNode,
    IntegratedLoudness,
    LimiterNode,
    LoudnessMeterNode,
    NoiseNode,
    SumNode,
    design_windowed_sinc,
)

SR = 48000
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mastering_bus.wav"


def main():
    cx = FirewheelCtx()
    g = cx.graph

    music = g.add_node(0, 2, NoiseNode("pink", gain_db=-14.0, seed=11))
    voice_node = BeepTestNode(280.0, -12.0, False)
    voice = g.add_node(0, 2, voice_node)
    duck = g.add_node(4, 2, DuckerNode(threshold_db=-40.0, duck_db=-12.0,
                                       attack_secs=0.01, release_secs=0.25))
    mix = g.add_node(4, 2, SumNode())
    comp = g.add_node(2, 2, CompressorNode(threshold_db=-18.0, ratio=3.0,
                                           attack_secs=0.01,
                                           release_secs=0.15, makeup_db=3.0))
    # linear-phase "air" shelf: +2 dB above 8 kHz as a 255-tap FIR
    # (lowpass complement blend -> zero phase warp on the master bus;
    # runs on the MXU via ops/direct_conv)
    lp = design_windowed_sinc("lowpass", 255, SR, 8000.0)
    air = np.zeros(255, np.float32)
    air[127] = 1.259  # +2 dB full-band ...
    air += lp * (1.0 - 1.259)  # ... minus the excess below 8 kHz
    eq = g.add_node(2, 2, FirFilterNode(air))
    lim = g.add_node(2, 2, LimiterNode(ceiling_db=-1.0,
                                       lookahead_secs=0.003))
    meter = g.add_node(2, 2, LoudnessMeterNode())

    for c in range(2):
        g.connect(music, c, duck, c)          # main bus
        g.connect(voice, c, duck, 2 + c)      # sidechain
        g.connect(duck, c, mix, c)            # ducked music
        g.connect(voice, c, mix, 2 + c)       # + the dialogue itself
        g.connect(mix, c, comp, c)
        g.connect(comp, c, eq, c)
        g.connect(eq, c, lim, c)
        g.connect(lim, c, meter, c)
        g.connect(meter, c, g.graph_out_node(), c)

    sink = WavSink(OUT, SR, 2)
    cx.activate(StreamConfig(SR, 2, buffer_frames=256), sink=sink,
                duration_secs=4.0)

    integ = IntegratedLoudness()
    stream = cx._active.stream
    polled = 0
    while not stream.finished:
        if stream.error is not None:
            raise stream.error
        cx.update()
        sec = stream.frames_rendered / SR
        # dialogue line from 1.0 s to 2.5 s
        voice_node.set_enabled(1.0 < sec < 2.5)
        if polled < int(sec * 10):
            r = LoudnessMeterNode.read(cx.node_state(meter))
            integ.push(r["gating_block_lufs"])
            polled += 1
            if polled % 10 == 0:
                print(
                    f"  t={sec:4.1f}s momentary {r['momentary_lufs']:6.1f} "
                    f"LUFS  short-term {r['short_term_lufs']:6.1f} LUFS"
                )

    r = LoudnessMeterNode.read(cx.node_state(meter))
    cx.deactivate()
    print(f"program loudness (gated, integrated): {integ.value():.1f} LUFS")
    print(f"final short-term: {r['short_term_lufs']:.1f} LUFS")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
