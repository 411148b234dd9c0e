"""Beep test: the minimal end-to-end engine example.

Mirrors the reference's ``examples/beep_test/src/main.rs:10-52``: add a
BeepTestNode (440 Hz, -12 dB) → connect both ports to graph out → activate →
poll ``update()`` every 15 ms for 4 seconds.  Instead of an OS speaker the
stream renders into a WAV file.

Run:  python examples/beep_test.py [out.wav]
      python examples/beep_test.py --play   # OS speakers (needs sounddevice)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from firewheel_tpu import FirewheelCtx, StreamConfig, UpdateStatus, WavSink
from firewheel_tpu.nodes import BeepTestNode

BEEP_FREQUENCY_HZ = 440.0
BEEP_GAIN_DB = -12.0
BEEP_DURATION_SECS = 4.0
UPDATE_INTERVAL_SECS = 0.015


def main(out_path: str = "beep_test.wav"):
    print("Firewheel beep test...")

    play = out_path == "--play"
    cx = FirewheelCtx()
    graph = cx.graph_mut()
    beep_node = graph.add_node(
        0, 2, BeepTestNode(BEEP_FREQUENCY_HZ, BEEP_GAIN_DB, True)
    )
    graph.connect(beep_node, 0, graph.graph_out_node(), 0)
    graph.connect(beep_node, 1, graph.graph_out_node(), 1)

    if play:
        # real OS speakers via the optional sounddevice backend — the cpal
        # playback path (firewheel-cpal/src/lib.rs:207-229); realtime
        # pacing keeps the device ring fed
        from firewheel_tpu.backend.os_audio import SoundDeviceSink

        cfg = StreamConfig(sample_rate=48000, num_out_channels=2, realtime=True)
        sink = SoundDeviceSink(cfg.sample_rate, cfg.num_out_channels)
    else:
        cfg = StreamConfig(sample_rate=48000, num_out_channels=2)
        sink = WavSink(out_path, cfg.sample_rate, cfg.num_out_channels)
    cx.activate(cfg, sink=sink, duration_secs=BEEP_DURATION_SECS)

    start = time.monotonic()
    while time.monotonic() - start < BEEP_DURATION_SECS:
        time.sleep(UPDATE_INTERVAL_SECS)
        result = cx.update()
        if result.status == UpdateStatus.ACTIVE and result.graph_error:
            print("graph error:", result.graph_error)
        elif result.status == UpdateStatus.DEACTIVATED:
            print("Deactivated unexpectedly:", result.error)
            break
        if cx.stream and cx.stream.frames_rendered >= 48000 * BEEP_DURATION_SECS:
            break

    cx.deactivate()
    if play:
        sink.close()
        print(f"finished (played {sink.underflow_count} underflows)")
    else:
        print(f"finished → {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
