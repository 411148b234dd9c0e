"""On-chip endurance soak: a long-lived streaming engine under live load.

The single-dispatch and fleet benches measure *peak* throughput over
seconds; a production game/serving host runs for hours with live edits,
event polling, and checkpoints, and the axon notes in
``docs/KNOWN_ISSUES.md`` record a *within-process throughput drift* whose
long-horizon behavior was unmeasured.  This soak closes that gap
(reference behavior: the cpal stream runs indefinitely,
``firewheel-cpal/src/lib.rs`` — there is no "session length" concept):

- a ~30-node game mixer streams continuously at device speed through the
  full ``FirewheelCtx`` engine (``update()`` pump, ArraySink);
- every pump cycle: parameter churn (volume/pan/filter sweeps) and
  ``poll_events()``;
- every ``--edit-period`` seconds: a live topology edit (insert or remove
  an effects link mid-stream → compile + deferred double-buffered swap
  with state migration);
- at the halfway mark: ``save_checkpoint`` (wall cost reported);
- every ``--window`` seconds a JSON line with that window's p50/p99/max
  per-buffer render latency, realtime factor, host RSS, program/jit cache
  sizes, and live device-buffer count.

Run (only process on the tunnel; self-terminating):

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/soak_onchip.py \
        --minutes 31 --out /tmp/soak.jsonl

Results land in ``docs/PERF.md`` ("On-chip endurance soak").
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[{time.time() - T0:8.1f}s]", *a, file=sys.stderr, flush=True)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def build_graph(cx, sr):
    """~30-node game mixer: 3 sources -> per-source strips -> bus FX ->
    master dynamics.  Mirrors the shape a shipped game runs forever."""
    from firewheel_tpu.core.sample_resource import SampleResource
    from firewheel_tpu.nodes import (
        BeepTestNode, CompressorNode, FilterNode, FilterType, LoopRange,
        GateNode, LimiterNode, ModDelayNode, NoiseNode,
        SamplerNode, StereoPanNode, SumNode, VolumeNode, WaveshaperNode,
    )

    g = cx.graph_mut()
    rng = np.random.default_rng(4)
    clip = (rng.standard_normal((2, 1 << 15)) * 0.2).astype(np.float32)
    t = np.arange(1 << 15) / sr
    clip[0] += 0.3 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    clip[1] += 0.3 * np.sin(2 * np.pi * 330.0 * t).astype(np.float32)

    sampler_node = SamplerNode(percent_volume=90.0, quality="linear")
    sampler_node.set_sample(SampleResource(clip))
    sampler_node.set_loop_range(LoopRange.FULL)
    sampler_node.play()

    sources = [
        g.add_node(0, 2, BeepTestNode(440.0, -12.0, True)),
        g.add_node(0, 2, NoiseNode("white", gain_db=-24.0, seed=11)),
        g.add_node(0, 2, sampler_node),
    ]
    strips, churn = [], []
    for si, src in enumerate(sources):
        vol_node = VolumeNode(80.0)
        pan_node = StereoPanNode(0.0)
        filt_node = FilterNode(FilterType.LOWPASS, frequency_hz=6000.0)
        vol = g.add_node(2, 2, vol_node)
        pan = g.add_node(2, 2, pan_node)
        filt = g.add_node(2, 2, filt_node)
        chain = [src, vol, pan, filt]
        for a, b in zip(chain[:-1], chain[1:]):
            g.connect(a, 0, b, 0)
            g.connect(a, 1, b, 1)
        strips.append(filt)
        churn.append((vol_node, pan_node, filt_node))

    bus = g.add_node(2 * len(strips), 2, SumNode())
    for i, s in enumerate(strips):
        g.connect(s, 0, bus, 2 * i)
        g.connect(s, 1, bus, 2 * i + 1)
    chorus = g.add_node(2, 2, ModDelayNode.chorus(rate_hz=0.7, mix=0.3))
    shaper = g.add_node(2, 2, WaveshaperNode("tanh", 2.0))
    gate = g.add_node(2, 2, GateNode(threshold_db=-60.0))
    comp = g.add_node(2, 2, CompressorNode(threshold_db=-18.0))
    lim = g.add_node(2, 2, LimiterNode(ceiling_db=-1.0))
    master_vol_node = VolumeNode(90.0)
    master = g.add_node(2, 2, master_vol_node)
    chain = [bus, chorus, shaper, gate, comp, lim, master, g.graph_out_node()]
    for a, b in zip(chain[:-1], chain[1:]):
        g.connect(a, 0, b, 0)
        g.connect(a, 1, b, 1)
    # live-edit splice point: between limiter and master volume
    return churn, master_vol_node, (lim, master)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=31.0)
    ap.add_argument("--window", type=float, default=60.0)
    ap.add_argument("--edit-period", type=float, default=60.0)
    ap.add_argument("--out", default="/tmp/soak_onchip.jsonl")
    ap.add_argument("--pump-secs", type=float, default=2.048,
                    help="audio seconds rendered per pump slice; keep it an "
                         "EXACT chunk multiple (3 x 256 x 128 / 48000) -- an "
                         "odd tail decomposes into single-buffer dispatches "
                         "(only {1, chunk} are warmed), which on a ~30 ms-RTT "
                         "tunnel costs more than the whole chunked slice")
    ap.add_argument("--chunk-buffers", type=int, default=256,
                    help="stream buffers per device dispatch (the dispatch "
                         "RPC is ~66 ms regardless of size -- bigger chunks "
                         "amortize it; 256 x 128 = 0.68 s/dispatch, ~10x rt "
                         "with depth-1 pipelined fetch)")
    args = ap.parse_args()

    import firewheel_tpu as fw
    from firewheel_tpu import executor as fx
    from firewheel_tpu.nodes import FilterNode, FilterType, StereoPanNode

    import jax

    SR, BLOCK = 48000, 128
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform}); soak {args.minutes:.0f} min, "
        f"edit every {args.edit_period:.0f}s, window {args.window:.0f}s")

    cx = fw.FirewheelCtx()
    churn, master_vol, (splice_a, splice_b) = build_graph(cx, SR)
    class DiscardSink:
        """Counts frames, keeps nothing: a 30-min device-speed soak can
        render hundreds of audio-hours — accumulating them would swamp
        RSS and invalidate the leak measurement."""
        frames = 0

        def write(self, interleaved, num_channels):
            DiscardSink.frames += len(interleaved) // num_channels
            self.last = interleaved[-8:].copy()  # finite-ness probe

    sink = DiscardSink()
    cx.activate(
        fw.StreamConfig(SR, 2, buffer_frames=BLOCK,
                        chunk_buffers=args.chunk_buffers),
        sink=sink,
    )
    log("activated; first pump (compiles the mixer program)...")
    t_c0 = time.time()
    cx.render_offline(args.pump_secs)
    log(f"first slice rendered in {time.time() - t_c0:.1f}s "
        f"(includes session setup + compile)")

    rng = np.random.default_rng(7)
    deadline = T0 + args.minutes * 60.0
    ckpt_at = T0 + args.minutes * 30.0  # halfway
    next_edit = time.time() + args.edit_period
    win_start = time.time()
    win_frames0 = cx.stream.frames_rendered
    inserted = []  # stack of live-inserted node ids
    events_total = 0
    edits_total = 0
    ckpt_wall = None
    windows = []
    outf = open(args.out, "w")

    def emit_window():
        nonlocal win_start, win_frames0
        now = time.time()
        stream = cx.stream
        times = np.asarray(stream._render_times, np.float64) * 1e3
        stream._render_times.clear()  # window-local percentiles
        frames = stream.frames_rendered - win_frames0
        wall = now - win_start
        row = {
            "t_min": round((now - T0) / 60.0, 2),
            "rt_factor": round(frames / SR / wall, 1),
            "p50_ms": round(float(np.percentile(times, 50)), 4)
            if times.size else None,
            "p99_ms": round(float(np.percentile(times, 99)), 4)
            if times.size else None,
            "max_ms": round(float(times.max()), 3) if times.size else None,
            "buffers_timed": int(times.size),
            "rss_mb": round(rss_mb(), 1),
            "program_cache": len(fx._PROGRAM_CACHE),
            "jit_packed": len(
                stream._processor._program._jit_packed_cache
            ) if hasattr(stream._processor, "_program") else None,
            "live_arrays": len(jax.live_arrays()),
            "chain_depth": len(inserted),
            "edits": edits_total,
            "events": events_total,
            "underflows": stream.underflow_count,
        }
        windows.append(row)
        outf.write(json.dumps(row) + "\n")
        outf.flush()
        log("window:", json.dumps(row))
        win_start = now
        win_frames0 = stream.frames_rendered

    while time.time() < deadline:
        # stream a slice at device speed
        cx.render_offline(args.pump_secs)
        if cx.stream is None or cx.stream.error is not None:
            log(f"STREAM ERROR: {cx.stream.error if cx.stream else 'gone'}")
            break

        # per-cycle live load: param churn + event polling
        for vol_node, pan_node, filt_node in churn:
            vol_node.set_percent_volume(float(rng.uniform(40.0, 100.0)))
            pan_node.set_pan(float(rng.uniform(-1.0, 1.0)))
            filt_node.set_frequency(float(rng.uniform(1000.0, 12000.0)))
        master_vol.set_percent_volume(float(rng.uniform(70.0, 100.0)))
        events_total += len(cx.poll_events())

        now = time.time()
        if now >= next_edit:
            g = cx.graph_mut()
            tail = inserted[-1] if inserted else splice_a
            if len(inserted) < 3:
                node = (
                    FilterNode(FilterType.HIGHPASS,
                               frequency_hz=float(rng.uniform(40, 200)))
                    if len(inserted) % 2 == 0
                    else StereoPanNode(float(rng.uniform(-0.5, 0.5)))
                )
                nid = g.add_node(2, 2, node)
                g.disconnect(tail, 0, splice_b, 0)
                g.disconnect(tail, 1, splice_b, 1)
                g.connect(tail, 0, nid, 0)
                g.connect(tail, 1, nid, 1)
                g.connect(nid, 0, splice_b, 0)
                g.connect(nid, 1, splice_b, 1)
                inserted.append(nid)
                log(f"live edit #{edits_total + 1}: inserted node "
                    f"({type(node).__name__}), chain depth {len(inserted)}")
            else:
                while inserted:
                    g.remove_node(inserted.pop())
                new_tail = splice_a
                g.connect(new_tail, 0, splice_b, 0)
                g.connect(new_tail, 1, splice_b, 1)
                log(f"live edit #{edits_total + 1}: removed the inserted "
                    f"chain (back to base topology)")
            edits_total += 1
            next_edit = now + args.edit_period

        if ckpt_wall is None and now >= ckpt_at:
            t0 = time.time()
            cx.save_checkpoint("/tmp/soak_ck")
            ckpt_wall = time.time() - t0
            log(f"mid-soak checkpoint saved in {ckpt_wall:.2f}s")

        if time.time() - win_start >= args.window:
            emit_window()

    if time.time() - win_start >= args.window / 4:
        emit_window()  # final partial window (skip if just emitted)
    stats = cx.stream.stats() if cx.stream else {}
    cx.deactivate()
    outf.close()

    p99s = [w["p99_ms"] for w in windows if w["p99_ms"] is not None]
    rts = [w["rt_factor"] for w in windows]
    rsss = [w["rss_mb"] for w in windows]
    summary = {
        "minutes": round((time.time() - T0) / 60.0, 1),
        "windows": len(windows),
        "frames_total": stats.get("frames_rendered"),
        "underflows": stats.get("underflow_count"),
        "rt_first_window": rts[0] if rts else None,
        "rt_last_window": rts[-1] if rts else None,
        "rt_drift_pct": round((rts[-1] / rts[0] - 1.0) * 100.0, 1)
        if len(rts) >= 2 else None,
        "p99_ms_min": min(p99s) if p99s else None,
        "p99_ms_max": max(p99s) if p99s else None,
        "rss_mb_first": rsss[0] if rsss else None,
        "rss_mb_last": rsss[-1] if rsss else None,
        "edits": edits_total,
        "events": events_total,
        "checkpoint_wall_s": round(ckpt_wall, 2) if ckpt_wall else None,
    }
    print(json.dumps(summary))
    log("summary:", json.dumps(summary))


if __name__ == "__main__":
    main()
