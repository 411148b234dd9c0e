"""Benchmark: batched realtime factor of a 64-node 48 kHz stereo graph.

The BASELINE target (driver-set): ≥1000× realtime per chip, outputs within
1e-6 of the CPU reference (the latter is enforced by the golden test suite;
this harness measures throughput + latency).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
Diagnostics go to stderr.

Method: the 64-node mixer graph (19 voices × beep→volume→pan → sum →
filter→echo→clip→meter, `__graft_entry__._mixer_graph`) is batched over B
independent instances (vmap) and K blocks per dispatch (lax.scan).
Dispatches chain on device state so they serialize on the device but the
host never blocks between them; we sync once per timed window.  Realtime
factor = rendered audio seconds / wall seconds.

Rigor (round-2): the headline is the MEDIAN of ≥5 timed windows (the axon
tunnel adds dispatch jitter; a single-trial best is not defensible) — best
and spread are reported as secondary fields.  A long chained window
(4× the pipeline depth) amortizes per-dispatch host/tunnel overhead toward
the device-work floor and is reported as `amortized`.  When the compiled
executable exposes a cost model, flops/bytes per dispatch are logged for
the roofline estimate in docs/PERF.md.

Node count: 64 includes the graph_in/graph_out sentinels (62 processing
nodes) — the reference counts sentinels as nodes too (graph.rs:133,146).

Modes: default = device-throughput headline ONLY — the JSON line prints
the moment the sweep finishes (round-4 lesson: an appended serving leg's
multi-minute cold compile overran the driver budget and the round lost
its artifact; BENCH_r04.json rc=124).  ``--serve`` = the serving loop
(egress included) as its own headline; ``--megakernel`` / ``--hybrid`` =
the Pallas lowerings (DEMOTED to experimental, docs/PERF.md).

Drift anchor: the headline swings ±35 % round-to-round on the tunnel
(269k↔376k) for reasons the repo's own discipline says are session
weather, not regressions (docs/PERF.md "In-graph backend A/B
discipline").  The default mode therefore also times a FIXED tiny
control program (compiled+measured in the same process, same chained-
dispatch pattern) and reports ``anchor_ms`` plus
``value_x_anchor = value * anchor_ms`` — a drift-insensitive product to
compare across rounds: if the tunnel slows every dispatch by s, the
headline drops ~1/s while the anchor grows ~s and the product holds.
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


def bench_megakernel():
    """`bench.py --megakernel`: the Pallas megakernel lowering of the same
    64-node mixer, on the attached chip.  One JSON line, same contract."""
    t_start = time.time()
    import jax

    from __graft_entry__ import _mixer_graph
    from firewheel_tpu.executor_pallas import MegaRenderer

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    program = _mixer_graph(block=BLOCK)

    best = None
    # tile=8 keeps the per-tile VMEM footprint compilable (tile=32 at
    # B=4096/K=16 fails server-side compile); measured round 2 on v5e:
    # B=4096 median 26037x, B=1024 median 6086x — both below the XLA
    # lowering at matched configs (docs/PERF.md).
    for batch, k_blocks, tile in [(4096, 16, 8), (1024, 8, 8)]:
        try:
            mega = MegaRenderer(program, batch=batch, num_blocks=k_blocks,
                                tile=tile)
            params, state = mega.stack_params(), mega.init_state()
            t0 = time.time()
            out, om, state = mega.render_chunk(params, state, 0)
            jax.block_until_ready(out)
            log(f"  B={batch} K={k_blocks} tile={tile}: compile+first "
                f"{time.time()-t0:.1f}s")
            audio_s = batch * k_blocks * BLOCK / SR
            rts = []
            for trial in range(5):
                t0 = time.time()
                o = None
                for i in range(4):
                    o, _, state = mega.render_chunk(
                        params, state, (i + 1) * k_blocks * BLOCK
                    )
                jax.block_until_ready(o)
                rts.append(4 * audio_s / (time.time() - t0))
                log(f"  trial {trial}: {rts[-1]:.0f}x")
            res = {
                "median": float(np.median(rts)),
                "best": float(np.max(rts)),
                "spread": float((np.max(rts) - np.min(rts)) / np.median(rts)),
                "cfg": (batch, k_blocks, tile),
            }
            if best is None or res["median"] > best["median"]:
                best = res
        except Exception as e:
            log(f"  megakernel B={batch} failed: {str(e).splitlines()[0][:160]}")
        if time.time() - t_start > 420:
            break

    if best is None:
        print(json.dumps({"metric": "megakernel bench failed", "value": 0.0,
                          "unit": "x realtime", "vs_baseline": 0.0}))
        return
    b, k, tile = best["cfg"]
    print(json.dumps({
        "metric": (
            "median realtime factor, Pallas megakernel lowering, 64-node "
            f"48kHz stereo graph, batch={b}, K={k}, tile={tile}, "
            "median of 5 trials"
        ),
        "value": round(best["median"], 1),
        "unit": "x realtime",
        "vs_baseline": round(best["median"] / TARGET, 3),
        "best": round(best["best"], 1),
        "spread": round(best["spread"], 3),
    }), flush=True)


def measure_anchor(budget_s=120.0):
    """The drift anchor: a FIXED tiny program (512×512 matmul chain, 16
    iterations per dispatch, 8 chained dispatches per window, median of
    5 windows) timed in the same process as the headline.  Its wall time
    tracks tunnel/session weather (dispatch RPC latency, server load,
    chip clock) with negligible sensitivity to the engine's own code, so
    ``headline × anchor_ms`` is comparable across rounds.  Returns
    ``(median window wall ms, compile+first s)``, or ``(None, None)`` on
    failure/overrun.

    The compile time doubles as a SESSION-MODE probe: the axon server
    has a bimodal compile mode (docs/PERF.md "Pathological-binary
    sessions") where every fresh compile runs ~40× slow AND the
    compiled mixer binary executes ~100-180× slow.  A fresh anchor
    compile takes seconds in a healthy session and 3-4 minutes in the
    pathological mode, so ``compile_s > 60`` ⇒ sweep smaller configs
    first (they are the only ones that can finish compiling inside the
    driver's budget)."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    try:
        n = 512
        w = jnp.eye(n, dtype=jnp.float32) * np.float32(0.999)

        @jax.jit
        def step(x):
            for _ in range(16):
                x = jnp.tanh(x @ w)
            return x

        x = jnp.ones((n, n), jnp.float32)
        x = step(x)
        jax.block_until_ready(x)
        compile_s = time.time() - t0
        log(f"anchor: compile+first {compile_s:.1f}s")
        walls = []
        for trial in range(5):
            t1 = time.time()
            y = x
            for _ in range(8):
                y = step(y)
            jax.block_until_ready(y)
            walls.append(time.time() - t1)
            if time.time() - t0 > budget_s and len(walls) >= 3:
                break
        ms = float(np.median(walls)) * 1e3
        log(f"anchor: median {ms:.2f} ms / 8 chained dispatches "
            f"(spread {(max(walls)-min(walls))/np.median(walls):.3f})")
        return ms, compile_s
    except Exception as e:  # the anchor must never sink the artifact
        log(f"anchor failed: {str(e).splitlines()[0][:160]}")
        return None, None


def measure_serve(program, batch, k_blocks, trials=7, budget_s=150.0,
                  n_chunks=4, output_format="pcm16"):
    """The full SERVING loop, device→host egress included: render with
    a compressed on-device output format and fetch every chunk to the
    host, overlapping the fetch of chunk t with the dispatch of chunk
    t+1 (``BatchRenderer.render_stream``).  Realtime factor counts only
    audio that actually REACHED the host — the number a fleet can ship,
    not just compute.  ``output_format``: ``"pcm16"`` (2 B/sample) or
    ``"adpcm4"`` (0.5 B/sample IMA ADPCM, encoded on device —
    ops/adpcm_device.py).  Returns a result dict (or raises)."""
    import jax

    from firewheel_tpu.parallel import BatchRenderer

    br = BatchRenderer(program, batch=batch, output_format=output_format)
    params, state = br.stack_params(), br.init_state()
    t0 = time.time()
    out, _om, state = br.render_chunk(params, state, num_blocks=k_blocks)
    host = np.asarray(out)  # full-output fetch (never slices: CLAUDE.md)
    chunk_mb = host.nbytes / 1e6
    log(f"  serve B={batch} K={k_blocks}: compile+first fetch "
        f"{time.time()-t0:.1f}s; chunk = {chunk_mb:.1f} MB {output_format}")
    audio_per_chunk = batch * k_blocks * BLOCK / SR

    t_cfg = time.time()
    rts, fetched = [], {"bytes": 0}

    def eat(a):
        fetched["bytes"] += a.nbytes

    sample = k_blocks * BLOCK
    for trial in range(trials):
        fetched["bytes"] = 0
        t0 = time.time()
        _, state, sample = br.render_stream(
            params, state, num_chunks=n_chunks, num_blocks=k_blocks,
            start_sample=sample, on_chunk=eat,
        )
        wall = time.time() - t0
        rts.append(n_chunks * audio_per_chunk / wall)
        log(f"  serve trial {trial}: {wall*1e3:.0f} ms for "
            f"{n_chunks*audio_per_chunk:.0f} audio-s, "
            f"{fetched['bytes']/1e6:.0f} MB fetched → {rts[-1]:.0f}x "
            f"({fetched['bytes']/wall/1e9:.2f} GB/s egress)")
        if time.time() - t_cfg > budget_s and len(rts) >= 5:
            log("  (serve budget reached)")
            break
    median = float(np.median(rts))
    wall_at_median = n_chunks * audio_per_chunk / median
    return {
        "median": median,
        "best": float(np.max(rts)),
        "spread": round(float((np.max(rts) - np.min(rts)) / median), 3),
        "egress_GBps": round(
            n_chunks * chunk_mb / 1e3 / wall_at_median, 3
        ),
        "chunk_mb": round(chunk_mb, 1),
        "cfg": (batch, k_blocks),
        "format": output_format,
    }


def bench_serve():
    """`bench.py --serve`: the serving loop with egress as its own
    headline.  One JSON line, same contract."""
    t_start = time.time()
    import jax

    from __graft_entry__ import _mixer_graph

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    program = _mixer_graph(block=BLOCK)
    best, results = None, {}
    # adpcm4 (0.5 B/sample, on-device IMA encode) ships 4× fewer bytes
    # than pcm16 → ~4× shipped throughput on an egress-bound attach, and
    # at 4 bits the loop stops being egress-bound on THIS attach, so
    # chunk size matters again: the headline B=8192 K=32 config
    # amortizes per-dispatch overhead and is measured first (its compile
    # through the tunnel is many minutes when the server cache is cold —
    # the budget check below runs between configs, never mid-config).
    for fmt, batch, k in [("adpcm4", 8192, 32), ("pcm16", 4096, 16),
                          ("adpcm4", 4096, 16)]:
        try:
            res = measure_serve(program, batch, k, output_format=fmt)
        except Exception as e:
            log(f"  serve B={batch} K={k} {fmt} failed: "
                f"{str(e).splitlines()[0][:160]}")
            continue
        results.setdefault(fmt, res)
        if res["median"] > results[fmt]["median"]:
            results[fmt] = res
        if best is None or res["median"] > best["median"]:
            best = res
        if time.time() - t_start > 900:
            log("time budget reached")
            break
    if best is None:
        print(json.dumps({"metric": "serve bench failed", "value": 0.0,
                          "unit": "x realtime", "vs_baseline": 0.0}))
        return
    b, k = best["cfg"]
    out = {
        "metric": (
            "median realtime factor of the SERVING loop — render → "
            f"{best['format'].upper()} on device → host fetch, fetch of "
            "chunk t overlapped with dispatch of t+1 — 64-node 48kHz "
            f"stereo graph, batch={b}, K={k}, median of >=5 trials"
        ),
        "value": round(best["median"], 1),
        "unit": "x realtime (audio shipped to host)",
        "vs_baseline": round(best["median"] / TARGET, 3),
        "best": round(best["best"], 1),
        "spread": best["spread"],
        "egress_GBps": best["egress_GBps"],
        "format": best["format"],
    }
    for fmt, res in results.items():
        out[f"served_{fmt}"] = round(res["median"], 1)
    print(json.dumps(out), flush=True)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _mixer_graph
    from firewheel_tpu.parallel import BatchRenderer

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    # drift anchor BEFORE the sweep: seconds of compile, absorbs session
    # setup, and its failure can never block the JSON line
    anchor_ms, anchor_compile_s = measure_anchor()
    # 30 s: a healthy-session anchor compile is ~10 s; 43.9 s preceded a
    # 35-minute pathological (8192,32) compile (2026-08-20), so lean
    # conservative — smallest-first only costs a few hit-served configs.
    slow_compile = anchor_compile_s is None or anchor_compile_s > 30.0
    if slow_compile:
        log("SLOW-COMPILE SESSION detected (anchor compile "
            f"{anchor_compile_s if anchor_compile_s else float('nan'):.0f}s"
            " > 30s): fresh compiles will run ~40x slow and may produce "
            "pathological binaries — sweeping smallest configs first")

    program = _mixer_graph(block=BLOCK)
    log(f"graph: 64 nodes (62 processing + 2 sentinels), block={BLOCK}, sr={SR}")

    def cost_analysis(br, k_blocks):
        """flops/bytes per dispatch from the compiled executable, if the
        backend exposes a cost model (logged for the PERF.md roofline)."""
        try:
            fn = br._chunk_cache[k_blocks]
            params = br.stack_params()
            state = br.init_state()
            b, ni, f = br.batch, program.num_graph_inputs, BLOCK
            gi = jnp.zeros((b, k_blocks, ni, f), jnp.float32)
            im = jnp.ones((b, k_blocks, ni), bool)
            compiled = fn.lower(
                params, state, gi, im,
                jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32),
            ).compile()
            costs = compiled.cost_analysis()
            if isinstance(costs, list):
                costs = costs[0]
            return {
                "flops": float(costs.get("flops", float("nan"))),
                "bytes": float(costs.get("bytes accessed", float("nan"))),
            }
        except Exception as e:
            log(f"  cost model unavailable: {type(e).__name__}: {e}")
            return None

    def bench_config(batch, k_blocks, pipeline=8, trials=7, budget_s=120.0):
        br = BatchRenderer(program, batch=batch)
        params = br.stack_params()
        state = br.init_state()

        # compile + warm
        t0 = time.time()
        out, om, state = br.render_chunk(params, state, num_blocks=k_blocks)
        jax.block_until_ready(out)
        log(f"  B={batch} K={k_blocks}: compile+first run {time.time()-t0:.1f}s")

        audio_per_dispatch = batch * k_blocks * BLOCK / SR

        def window(n_dispatch):
            nonlocal state
            t0 = time.time()
            out = None
            for i in range(n_dispatch):
                out, om, state = br.render_chunk(
                    params, state,
                    start_sample=(i + 1) * k_blocks * BLOCK,
                    num_blocks=k_blocks,
                )
            jax.block_until_ready(out)
            wall = time.time() - t0
            return n_dispatch * audio_per_dispatch / wall, wall

        # The trial budget starts AFTER compile (session setup + first
        # compile can eat minutes on the tunnel; trials themselves are tens
        # of ms) and never cuts below 5 trials — the harness standard is
        # median of >=5.
        t_cfg = time.time()
        rts = []
        for trial in range(trials):
            rt, wall = window(pipeline)
            rts.append(rt)
            log(f"  trial {trial}: {wall*1e3:.1f} ms for "
                f"{pipeline*audio_per_dispatch:.1f} audio-s → {rt:.0f}x")
            if time.time() - t_cfg > budget_s and len(rts) >= 5:
                log("  (config budget reached)")
                break
        median = float(np.median(rts))
        best = float(np.max(rts))
        spread = float((np.max(rts) - np.min(rts)) / median) if median else 0.0

        # long window: amortize per-dispatch host/tunnel overhead toward
        # the device-work floor
        amortized, wall = window(4 * pipeline)
        log(f"  amortized ({4*pipeline} chained dispatches): {amortized:.0f}x "
            f"({wall*1e3:.0f} ms)")

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

        costs = cost_analysis(br, k_blocks)
        if costs:
            dev_s = pipeline * audio_per_dispatch / amortized / pipeline
            log(f"  cost model: {costs['flops']:.3e} flops, "
                f"{costs['bytes']:.3e} bytes per dispatch "
                f"(→ {costs['flops']/dev_s:.3e} flop/s, "
                f"{costs['bytes']/dev_s:.3e} B/s amortized)")
        return {
            "median": median,
            "best": best,
            "spread": round(spread, 3),
            "amortized": amortized,
            "p99_block_ms": p99_block_ms,
        }

    # Candidate configs.  (8192,32) — the historical 280-392k headline —
    # goes LAST as of 2026-08-20: every fresh compile of it that day took
    # 20-35 min and produced a pathological (~2,200x) binary regardless
    # of session mode (three independent fresh compiles; the morning
    # 392k was a cache hit on the round-4-era good binary, since
    # evicted — its large executable LRU-evicts within ~30-60 min).
    # (4096,32)/(8192,16) fresh-compile good (155k/71k measured) in
    # minutes, so they carry the artifact.  In a slow-compile session
    # the order flips smallest-first so SOME config always finishes
    # inside the driver budget.
    configs = [(4096, 32), (8192, 16), (4096, 16), (8192, 32)]
    if slow_compile:
        configs = [(4096, 16), (4096, 32), (8192, 16)]
    # pathological-binary classifier (docs/PERF.md: same HLO compiles to
    # a ~100-180x-slower executable in some sessions while plain matmuls
    # run at full speed): a config whose per-dispatch wall is >10x the
    # anchor's per-dispatch wall is flagged, and flagged results lose the
    # headline to any unflagged config regardless of median.
    anchor_dispatch_ms = (anchor_ms / 8.0) if anchor_ms else None

    def is_pathological(res, batch, k):
        if anchor_dispatch_ms is None:
            return False
        audio = batch * k * BLOCK / SR
        per_dispatch_ms = audio / res["median"] * 1e3
        return per_dispatch_ms > 10.0 * anchor_dispatch_ms

    # Shared sweep state + single-shot emitter: a watchdog thread prints
    # the artifact at T=1500 s if the sweep hasn't — a wedged multi-minute
    # compile must never leave the driver with rc=124 and no JSON line
    # (round-4 postmortem).  The watchdog does NO device work (worker
    # threads must never dispatch on axon — CLAUDE.md).
    import threading

    sweep = {"res": None, "cfg": None, "path": True}
    emitted = threading.Event()

    def emit(via):
        if emitted.is_set():
            return
        emitted.set()
        best_res, best_cfg = sweep["res"], sweep["cfg"]
        if best_res is None:
            out = {
                "metric": (
                    "bench incomplete: first config still compiling at "
                    "the watchdog deadline (slow-compile session — see "
                    "docs/PERF.md 'Pathological-binary sessions'); no "
                    "trial completed"
                ),
                "value": 0.0, "unit": "x realtime", "vs_baseline": 0.0,
            }
            if anchor_ms is not None:
                out["anchor_ms"] = round(anchor_ms, 2)
            if anchor_compile_s is not None:
                out["anchor_compile_s"] = round(anchor_compile_s, 1)
            print(json.dumps(out), flush=True)
            return
        result = {
            "metric": (
                "median realtime factor (audio-sec/sec/chip), 64-node "
                f"48kHz stereo graph, batch={best_cfg[0]}, "
                f"K={best_cfg[1]}, median of >=5 trials; p99 block "
                f"latency {best_res['p99_block_ms']:.3f} ms"
            ),
            "value": round(best_res["median"], 1),
            "unit": "x realtime",
            "vs_baseline": round(best_res["median"] / TARGET, 3),
            "best": round(best_res["best"], 1),
            "spread": best_res["spread"],
            "amortized": round(best_res["amortized"], 1),
        }
        if anchor_ms is not None:
            result["anchor_ms"] = round(anchor_ms, 2)
            # drift-insensitive product: compare THIS across rounds
            result["value_x_anchor"] = round(
                best_res["median"] * anchor_ms, 0)
        if anchor_compile_s is not None:
            result["anchor_compile_s"] = round(anchor_compile_s, 1)
        # binary_mode: "ok" = the headline executable runs at
        # anchor-relative speed; "pathological" = EVERY measured config
        # hit the server's bad compile mode and the value understates
        # the engine by ~2 orders of magnitude.
        if anchor_ms is not None:
            result["binary_mode"] = (
                "pathological" if sweep["path"] else "ok")
        if via == "watchdog":
            result["emitted_by"] = "watchdog"
        print(json.dumps(result), flush=True)

    def watchdog():
        time.sleep(max(0.0, 1500.0 - (time.time() - t_start)))
        if not emitted.is_set():
            log("watchdog deadline: emitting the artifact now")
            emit("watchdog")

    threading.Thread(target=watchdog, daemon=True).start()

    for batch, k in configs:
        try:
            res = bench_config(batch, k)
        except Exception as e:  # OOM etc.
            log(f"  B={batch} K={k} failed: {e}")
            continue
        path = is_pathological(res, batch, k)
        if path:
            log(f"  B={batch} K={k}: PATHOLOGICAL BINARY "
                f"(per-dispatch ≫ anchor; median {res['median']:.0f}x)")
        better = (sweep["res"] is None
                  or (sweep["path"] and not path)
                  or (path == sweep["path"]
                      and res["median"] > sweep["res"]["median"]))
        if better:
            sweep["res"], sweep["cfg"], sweep["path"] = res, (batch, k), path
        if emitted.is_set():
            log("artifact already emitted by watchdog; stopping sweep")
            return
        if time.time() - t_start > 420:
            log("time budget reached")
            break
    best_res, best_cfg, best_path = sweep["res"], sweep["cfg"], sweep["path"]

    # Poisoned-cache re-roll: if EVERY measured config hit a bad cached
    # binary but THIS session compiles fast (good mode), compile
    # never-before-used shapes — fresh cache keys compile fresh, and a
    # good-mode fresh compile yields a good binary (docs/PERF.md
    # "Pathological-binary sessions").  K=31 ≈ K=32 in work/shape.
    if (best_res is not None and best_path and not slow_compile
            and not emitted.is_set() and time.time() - t_start < 600):
        log("all configs pathological in a fast-compile session: "
            "re-rolling with fresh shapes")
        for batch, k in [(8192, 31), (4096, 31)]:
            try:
                res = bench_config(batch, k)
            except Exception as e:
                log(f"  B={batch} K={k} failed: {e}")
                continue
            if not is_pathological(res, batch, k):
                sweep["res"], sweep["cfg"], sweep["path"] = (
                    res, (batch, k), False)
                break
            log(f"  B={batch} K={k}: still pathological")
            if emitted.is_set() or time.time() - t_start > 900:
                break
        best_res, best_cfg = sweep["res"], sweep["cfg"]

    if best_res is not None:
        log(f"best: {best_cfg} → median {best_res['median']:.0f}x realtime "
            f"(best {best_res['best']:.0f}x, spread {best_res['spread']}, "
            f"amortized {best_res['amortized']:.0f}x), p99 block latency "
            f"{best_res['p99_block_ms']:.3f} ms (budget {BLOCK/SR*1e3:.2f} ms)")

    # the JSON line prints NOW — nothing runs between the sweep and the
    # artifact (round-4 postmortem: BENCH_r04 rc=124, parsed=null).  The
    # serving loop is `--serve`; megakernel/hybrid are demoted modes.
    emit("sweep")


def bench_hybrid():
    """`bench.py --hybrid`: the hybrid (Pallas-island) lowering of the
    BASELINE effects-chain vs the XLA path, interleaved windows (the
    within-process drift lesson, docs/PERF.md).  One JSON line."""
    import jax
    import jax.numpy as jnp

    from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
    from firewheel_tpu.core.sample_resource import SampleResource
    from firewheel_tpu.executor_pallas import HybridMegaRenderer
    from firewheel_tpu.nodes import (
        ConvolutionReverbNode, EchoNode, FilterNode, HardClipNode,
        SamplerNode,
    )
    from firewheel_tpu.parallel import BatchRenderer

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(3)
    clip_audio = (rng.standard_normal((2, 8192)) * 0.25).astype(np.float32)
    ir = (rng.standard_normal((2, 256)) * np.exp(
        -np.arange(256, dtype=np.float32) / 48.0)).astype(np.float32)
    g = AudioGraph(AudioGraphConfig(0, 2))
    sn = SamplerNode(percent_volume=100.0, quality="cubic")
    sn.set_sample(SampleResource(clip_audio)); sn.play()
    sampler = g.add_node(0, 2, sn)
    filt = g.add_node(2, 2, FilterNode("lowpass", frequency_hz=6000.0, q=0.9))
    echo = g.add_node(2, 2, EchoNode(delay_secs=0.01, feedback=0.35, wet=0.4))
    clip = g.add_node(2, 2, HardClipNode(threshold_db=-3.0))
    rev = g.add_node(2, 2, ConvolutionReverbNode(ir, wet=0.35))
    chain = [sampler, filt, echo, clip, rev, g.graph_out_node()]
    for a, b in zip(chain[:-1], chain[1:]):
        for ch in range(2):
            g.connect(a, ch, b, ch)
    pkg = g.compile(SR, BLOCK)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)

    B, K, PIPE = 1024, 8, 4
    br = BatchRenderer(prog, batch=B)
    xp, xs = br.stack_params(), br.init_state()
    gi = jnp.zeros((B, K, 0, BLOCK), jnp.float32)
    im = jnp.zeros((B, K, 0), bool)
    o, _, xs = br.render_chunk(xp, xs, gi, im, 0, num_blocks=K)
    jax.block_until_ready(o)
    hy = HybridMegaRenderer(prog, batch=B, num_blocks=K, tile=8)
    hp, hs = hy.stack_params(), hy.init_state()
    o, _, hs = hy.render_chunk(hp, hs)
    jax.block_until_ready(o)
    log("both lowerings compiled; interleaving windows")
    audio = B * K * BLOCK / SR * PIPE
    xla_rts, hyb_rts = [], []
    state = {"x": xs, "h": hs}
    for r in range(7):
        t0 = time.time()
        for i in range(PIPE):
            o, _, state["x"] = br.render_chunk(
                xp, state["x"], gi, im, (i + 1) * K * BLOCK, num_blocks=K)
        jax.block_until_ready(o)
        xla_rts.append(audio / (time.time() - t0))
        t0 = time.time()
        for i in range(PIPE):
            o, _, state["h"] = hy.render_chunk(
                hp, state["h"], start_sample=(i + 1) * K * BLOCK)
        jax.block_until_ready(o)
        hyb_rts.append(audio / (time.time() - t0))
        log(f"  round {r}: xla {xla_rts[-1]:.0f}x, hybrid {hyb_rts[-1]:.0f}x")
    xm, hm = float(np.median(xla_rts)), float(np.median(hyb_rts))
    print(json.dumps({
        "metric": (
            "median realtime factor, hybrid Pallas-island lowering of the "
            f"effects-chain (sampler->filter->echo->clip->reverb), B={B} "
            f"K={K}, interleaved vs XLA ({xm:.0f}x)"
        ),
        "value": round(hm, 1),
        "unit": "x realtime",
        "vs_baseline": round(hm / TARGET, 3),
        "speedup_vs_xla": round(hm / xm, 3),
    }), flush=True)


if __name__ == "__main__":
    if "--megakernel" in sys.argv[1:]:
        bench_megakernel()
    elif "--hybrid" in sys.argv[1:]:
        bench_hybrid()
    elif "--serve" in sys.argv[1:]:
        bench_serve()
    else:
        main()
