"""Game-server serving path: many independent game instances on one chip.

The reference is a single-game engine (one graph, one audio thread).  The
TPU-native serving story batches B independent *instances* of the graph
into one compiled program (``parallel.BatchRenderer``) and drives them
with a per-instance control plane:

* every dispatch renders K blocks for ALL instances (one ``vmap``-wide
  program — the per-instance cost amortizes to microseconds);
* a client command ("player 7 muted the music") edits only that
  instance's param slice (``update_instance`` — O(one instance) of
  host→device traffic, no recompiles, no disturbance to the other B−1);
* a client reconnect resets only that instance's recurrent state
  (``reset_instance``).

Run:  python examples/game_server.py      (FIREWHEEL_TPU_PLATFORM=cpu to
      force CPU; renders a short session and prints per-instance stats)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import (
    BeepTestNode, SamplerNode, StereoPanNode, SumNode, VolumeNode,
)
from firewheel_tpu.parallel import BatchRenderer

SR, BLOCK, K = 48000, 128, 16
B = 16  # game instances


def build_game_graph():
    """One game's audio: two tones -> volume -> pan, plus a one-shot SFX
    sampler summed in (its finish is reported per instance via events)."""
    g = AudioGraph(AudioGraphConfig(0, 2))
    music = g.add_node(0, 2, BeepTestNode(330.0, -18.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    pan = g.add_node(2, 2, StereoPanNode(0.0))
    sfx_node = SamplerNode(100.0)
    rng = np.random.default_rng(0)
    sfx_node.set_sample(SampleResource(
        (rng.standard_normal((2, 1024)) * 0.05).astype(np.float32),
        device=False,
    ))
    sfx = g.add_node(0, 2, sfx_node)
    g.connect(music, 0, vol, 0)
    g.connect(music, 1, vol, 1)
    g.connect(vol, 0, pan, 0)
    g.connect(vol, 1, pan, 1)
    mix = g.add_node(4, 2, SumNode())
    g.connect(pan, 0, mix, 0)
    g.connect(pan, 1, mix, 1)
    g.connect(sfx, 0, mix, 2)
    g.connect(sfx, 1, mix, 3)
    g.connect(mix, 0, g.graph_out_node(), 0)
    g.connect(mix, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, BLOCK)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    return g, prog, {"music": music, "vol": vol, "pan": pan, "sfx": sfx}


def main():
    g, prog, ids = build_game_graph()
    br = BatchRenderer(prog, batch=B)

    # per-instance bring-up: each game gets its own pan position, and the
    # even-numbered games fire their SFX one-shot at t=0
    plist = []
    for b in range(B):
        g.node(ids["pan"]).set_pan(-1.0 + 2.0 * b / (B - 1))
        sfx = g.node(ids["sfx"])
        if b % 2 == 0:
            sfx.play()
        else:
            sfx.pause()
        plist.append(prog.collect_params())
    params = br.stack_params(plist)
    state = br.init_state()

    sample = 0

    def dispatch():
        nonlocal state, sample
        out, om, state = br.render_chunk(
            params, state, start_sample=sample, num_blocks=K
        )
        sample += K * BLOCK
        return np.asarray(out)  # [B, K, 2, F]

    out = dispatch()
    print(f"serving {B} instances, {out.shape} per dispatch "
          f"({K * BLOCK / SR * 1e3:.1f} ms of audio each)")

    # --- events: which games' SFX finished? (device counters, one poll) ---
    done = sorted(e.instance for e in br.poll_events(state)
                  if e.name == "finished")
    print(f"SFX finished in instances: {done}")
    assert done == [b for b in range(B) if b % 2 == 0], done

    # --- control plane: player 7 mutes; player 3 reconnects ---------------
    g.node(ids["vol"]).set_percent_volume(0.0)
    g.node(ids["pan"]).set_pan(-1.0 + 2.0 * 7 / (B - 1))
    params = br.update_instance(params, 7, prog.collect_params())
    state = br.reset_instance(state, 3)

    # let instance 7's mute ramp settle (10 ms smoother), then check
    for _ in range(8):
        out = dispatch()

    rms = out[:, -4:].std(axis=(1, 2, 3))
    print("per-instance rms (instance 7 muted):")
    print("  " + "  ".join(f"{b}:{rms[b]:.4f}" for b in range(B)))
    assert rms[7] < 1e-6, "muted instance still audible"
    assert all(rms[b] > 1e-3 for b in range(B) if b != 7), "instance lost"
    print("OK: per-instance control isolated; "
          f"{B * sample / SR:.1f} instance-seconds rendered")


if __name__ == "__main__":
    main()
