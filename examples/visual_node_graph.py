"""Visual node graph: live DAG editing with visualization.

The functional analog of the reference's ``examples/visual_node_graph`` (an
egui DAG editor, ``examples/visual_node_graph/src/{main,system,ui}.rs``): a
palette of node types is instantiated into a running engine, edited live
(connect with cycle checking, volume drags), and the graph + compiled
schedule are rendered — here as terminal ASCII, a Graphviz DOT file, and a
drag-the-nodes interactive HTML page instead of an egui window.

Run:  python examples/visual_node_graph.py [out.html]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
from firewheel_tpu.graph import CycleDetected
from firewheel_tpu.nodes import (
    BeepTestNode,
    FilterNode,
    FilterType,
    HardClipNode,
    MonoToStereoNode,
    StereoPanNode,
    StereoToMonoNode,
    SumNode,
    VolumeNode,
)
from firewheel_tpu.utils.viz import ascii_graph, schedule_table, to_dot, to_html


def main(out_html: str = "visual_node_graph.html"):
    cx = FirewheelCtx()
    g = cx.graph_mut()

    # The palette (mirrors the 9 node configs in system.rs:53-63).
    beep_a = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    beep_b = g.add_node(0, 2, BeepTestNode(660.0, -18.0, True))
    vol_a = g.add_node(2, 2, VolumeNode(100.0))
    vol_b = g.add_node(2, 2, VolumeNode(60.0))
    mixer = g.add_node(6, 2, SumNode())  # ports 4/5 left free
    to_mono = g.add_node(2, 1, StereoToMonoNode())
    to_stereo = g.add_node(1, 2, MonoToStereoNode())
    pan = g.add_node(2, 2, StereoPanNode(0.3))
    clip = g.add_node(2, 2, HardClipNode(0.0))

    # Wire it like a user dragging connections (cycle check on, ui:
    # system.rs:88 passes true).
    g.connect(beep_a, 0, vol_a, 0, check_for_cycles=True)
    g.connect(beep_a, 1, vol_a, 1, check_for_cycles=True)
    g.connect(beep_b, 0, vol_b, 0, check_for_cycles=True)
    g.connect(beep_b, 1, vol_b, 1, check_for_cycles=True)
    g.connect(vol_a, 0, mixer, 0, check_for_cycles=True)
    g.connect(vol_a, 1, mixer, 1, check_for_cycles=True)
    g.connect(vol_b, 0, mixer, 2, check_for_cycles=True)
    g.connect(vol_b, 1, mixer, 3, check_for_cycles=True)
    g.connect(mixer, 0, to_mono, 0, check_for_cycles=True)
    g.connect(mixer, 1, to_mono, 1, check_for_cycles=True)
    g.connect(to_mono, 0, to_stereo, 0, check_for_cycles=True)
    g.connect(to_stereo, 0, pan, 0, check_for_cycles=True)
    g.connect(to_stereo, 1, pan, 1, check_for_cycles=True)
    g.connect(pan, 0, clip, 0, check_for_cycles=True)
    g.connect(pan, 1, clip, 1, check_for_cycles=True)
    g.connect(clip, 0, g.graph_out_node(), 0, check_for_cycles=True)
    g.connect(clip, 1, g.graph_out_node(), 1, check_for_cycles=True)

    # a cycle attempt is rejected, graph untouched (ui feedback path)
    try:
        g.connect(clip, 0, mixer, 4, check_for_cycles=True)
    except CycleDetected:
        print("(cycle attempt rejected, as the editor would show)")

    print("\n=== graph ===")
    print(ascii_graph(g))

    sink = ArraySink()
    cx.activate(StreamConfig(48000, 2, buffer_frames=512), sink=sink)

    # live param edits while rendering (the DragValue → set_volume path,
    # ui.rs:312-335)
    va = g.node(vol_a)
    for pct in (100.0, 75.0, 50.0, 25.0):
        va.set_percent_volume(pct)
        cx.render_offline(0.1)

    schedule = None
    # grab the current compiled schedule for visualization
    proc = cx.stream._processor
    if proc._program is not None:
        schedule = proc._program.schedule
        print("\n=== compiled schedule ===")
        print(schedule_table(schedule))

    cx.deactivate()
    audio = sink.audio(2)
    print(f"\nrendered {audio.shape[1] / 48000:.2f}s of audio")

    dot_path = os.path.splitext(out_html)[0] + ".dot"
    with open(dot_path, "w") as f:
        f.write(to_dot(g, schedule))
    with open(out_html, "w") as f:
        f.write(to_html(g, schedule, title="firewheel_tpu — visual node graph"))
    print(f"wrote {dot_path} and {out_html} (open in a browser; drag nodes)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
