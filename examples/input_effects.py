"""Live-input insert chain: process an external feed through the graph.

    external stereo input ── filter ── echo ── hard clip ── out

The reference processes stream input the same way (deinterleave →
graph_in → schedule → graph_out, ``processor.rs:95-158``); here the feed
comes from an ``input_source`` callable (a capture device, a network
stream, another engine's bus — anything that returns ``[ch, n]`` f32 on
demand) and the graph runs it through an insert chain on the
accelerator.  The demo feed is a 500 Hz + 9 kHz two-tone so the
lowpass's work is visible in the output spectrum.

Run:  python examples/input_effects.py [out.wav]
      python examples/input_effects.py --mic   # real capture device
      FIREWHEEL_TPU_PLATFORM=cpu forces the CPU backend.

``--mic`` swaps the synthetic feed for a real OS capture device
(``SoundDeviceSource``, needs sounddevice) and streams it through the
same insert chain in realtime to the OS speakers — live monitoring.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from firewheel_tpu import (
    AudioGraphConfig,
    FirewheelCtx,
    StreamConfig,
    WavSink,
)
from firewheel_tpu.nodes import EchoNode, FilterNode, FilterType, HardClipNode

SR = 48000
MIC = "--mic" in sys.argv[1:]
_pos_args = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = _pos_args[0] if _pos_args else "/tmp/input_effects.wav"


def main():
    cx = FirewheelCtx(AudioGraphConfig(num_graph_inputs=2, num_graph_outputs=2))
    g = cx.graph
    filt = g.add_node(2, 2, FilterNode(FilterType.LOWPASS, 3000.0))
    echo = g.add_node(2, 2, EchoNode(delay_secs=0.1, feedback=0.3, wet=0.5))
    clip = g.add_node(2, 2, HardClipNode(-1.0))
    gi, go = g.graph_in_node(), g.graph_out_node()
    for c in range(2):
        g.connect(gi, c, filt, c)
        g.connect(filt, c, echo, c)
        g.connect(echo, c, clip, c)
        g.connect(clip, c, go, c)

    if MIC:
        # live monitoring: real capture device → insert chain → speakers
        from firewheel_tpu.backend.os_audio import (
            SoundDeviceSink,
            SoundDeviceSource,
            os_audio_available,
        )

        if not os_audio_available():
            sys.exit("--mic needs the optional sounddevice package")
        src = SoundDeviceSource(SR, num_channels=2)
        sink = SoundDeviceSink(SR, 2)
        cx.activate(
            StreamConfig(SR, 2, num_in_channels=2, realtime=True),
            sink=sink,
            input_source=src,
        )
        import time

        print("monitoring live input for 10 s (ctrl-c to stop)...")
        try:
            end = time.time() + 10.0
            while time.time() < end:
                cx.update()
                time.sleep(0.015)
        finally:
            cx.deactivate()
            src.close()
            sink.close()
            print(
                f"capture starves: {src.starve_count}, "
                f"overflows: {src.overflow_count}"
            )
        return

    pos = [0]

    def input_source(n):
        """The 'capture device': 500 Hz fundamental + 9 kHz hiss."""
        t = (pos[0] + np.arange(n)) / SR
        pos[0] += n
        x = 0.4 * np.sin(2 * np.pi * 500.0 * t) + 0.3 * np.sin(
            2 * np.pi * 9000.0 * t
        )
        return np.stack([x, x]).astype(np.float32)

    sink = WavSink(OUT, SR, 2)
    cx.activate(
        StreamConfig(SR, 2, num_in_channels=2),
        sink=sink,
        input_source=input_source,
    )
    cx.render_offline(2.0)
    cx.deactivate()
    print(f"processed 2.0 s of live input → {OUT}")


if __name__ == "__main__":
    main()
