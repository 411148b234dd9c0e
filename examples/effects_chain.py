"""Effects chain: BASELINE config 4 end-to-end.

    sampler ── biquad filter ── echo ── hard clip ── convolution reverb ── out

A synthesized Karplus-Strong pluck plays through the full effects chain via
the streaming context (``FirewheelCtx``), with live control during the
stream: the pluck retriggers at different playback rates (exercising the
sampler's cubic resampler) and the filter cutoff sweeps down and back up.
The bounce lands in a WAV file.

Reference scope: the DESIGN_DOC effect list (``DESIGN_DOC.md:11-28`` —
filters, delays, clippers, convolutional reverb are all reference TODOs,
implemented here) and the reference streaming lifecycle
(``crates/firewheel-graph/src/context.rs``).

Run:  python examples/effects_chain.py [out.wav]
      FIREWHEEL_TPU_PLATFORM=cpu python examples/effects_chain.py   # force CPU
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from firewheel_tpu import FirewheelCtx, StreamConfig, UpdateStatus, WavSink
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import (
    ConvolutionReverbNode,
    EchoNode,
    FilterNode,
    HardClipNode,
    SamplerNode,
)

SR = 48000
DURATION_SECS = 6.0
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/effects_chain.wav"


def karplus_strong_pluck(freq_hz: float, secs: float, sr: int = SR):
    """Plucked-string synthesis: noise burst through a feedback comb."""
    rng = np.random.default_rng(5)
    period = int(round(sr / freq_hz))
    n = int(secs * sr)
    buf = np.zeros(n, np.float32)
    buf[:period] = rng.uniform(-1.0, 1.0, period).astype(np.float32)
    for i in range(period, n):
        buf[i] = 0.996 * 0.5 * (buf[i - period] + buf[i - period + 1])
    return np.stack([buf, buf])  # stereo


def exp_decay_ir(secs: float, t60_secs: float, sr: int = SR):
    """Synthetic stereo room: decorrelated exponentially-decaying noise."""
    rng = np.random.default_rng(9)
    n = int(secs * sr)
    t = np.arange(n, dtype=np.float32) / sr
    env = np.exp(-6.91 * t / t60_secs)  # -60 dB at t60
    ir = rng.standard_normal((2, n)).astype(np.float32) * env
    return ir / np.abs(ir).sum(axis=-1, keepdims=True)


def main():
    cx = FirewheelCtx()
    g = cx.graph

    pluck = karplus_strong_pluck(220.0, 1.2)
    sampler_node = SamplerNode(percent_volume=100.0, quality="cubic")
    sampler_node.set_sample(SampleResource(pluck))

    sampler = g.add_node(0, 2, sampler_node)
    filt_node = FilterNode("lowpass", frequency_hz=6000.0, q=0.9)
    filt = g.add_node(2, 2, filt_node)
    echo = g.add_node(2, 2, EchoNode(delay_secs=0.28, feedback=0.35, wet=0.4))
    clip = g.add_node(2, 2, HardClipNode(threshold_db=-3.0))
    rev = g.add_node(
        2, 2, ConvolutionReverbNode(exp_decay_ir(0.6, 0.5), wet=0.35)
    )
    go = g.graph_out_node()

    chain = [sampler, filt, echo, clip, rev, go]
    for src, dst in zip(chain[:-1], chain[1:]):
        for ch in range(2):
            g.connect(src, ch, dst, ch)

    cfg = StreamConfig(sample_rate=SR, num_out_channels=2)
    sink = WavSink(OUT, cfg.sample_rate, cfg.num_out_channels)
    cx.activate(cfg, sink=sink, duration_secs=DURATION_SECS)

    # live control script keyed to STREAM time (frames rendered), not wall
    # time — automation lands at the same point in the audio whether the
    # stream is paced realtime or renders offline through first-compile
    # stalls (the axon tunnel's first compile of a shape can take minutes).
    triggers = [(0.0, 1.0), (1.0, 1.5), (2.0, 0.75), (3.0, 2.0), (4.0, 1.0)]
    next_trig = 0
    sampler_node.play()

    target_frames = int(SR * DURATION_SECS)
    deadline = time.monotonic() + 900.0  # wall safety cap (tunnel compiles)
    while time.monotonic() < deadline:
        t = cx.stream.frames_rendered / SR if cx.stream else 0.0
        if next_trig < len(triggers) and t >= triggers[next_trig][0]:
            _, rate = triggers[next_trig]
            sampler_node.set_playback_rate(rate)
            sampler_node.set_playhead(0.0)
            sampler_node.play()
            next_trig += 1
        # cutoff sweep: 6 kHz -> 600 Hz -> 6 kHz over the stream
        sweep = 0.5 - 0.5 * np.cos(2 * np.pi * t / DURATION_SECS)
        filt_node.set_frequency(6000.0 * (0.1 + 0.9 * (1.0 - sweep)))
        result = cx.update()
        if result.status == UpdateStatus.DEACTIVATED:
            print("deactivated unexpectedly:", result.error)
            break
        if cx.stream and cx.stream.frames_rendered >= target_frames:
            break

    cx.deactivate()
    print(f"effects chain bounce → {OUT}")


if __name__ == "__main__":
    main()
