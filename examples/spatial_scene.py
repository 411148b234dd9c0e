"""Spatial scene: 128 3D-positioned emitters + dB meters, 256-node graph.

BASELINE config #5 ("Spatial scene: 128 3D-positioned emitters + dB meters,
256-node graph").  128 beep emitters are scattered on a circle around the
listener, each through a 3D spatializer; subgroups meet at summation nodes,
a metered master bus clips the mix, and the emitters orbit the listener via
automation during the render.

Node count: 128 emitters + 128 spatializers + 4 group sums + master sum +
volume + meter + clip + 2 sentinels = 266.

Run:  python examples/spatial_scene.py [out.wav]
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from firewheel_tpu import FirewheelCtx, StreamConfig, WavSink
from firewheel_tpu.core.automation import AutomationCurve
from firewheel_tpu.nodes import (
    BeepTestNode,
    DbMeterNode,
    HardClipNode,
    Spatializer3DNode,
    SumNode,
    VolumeNode,
)

SR = 48000
NUM_EMITTERS = 128
GROUPS = 4


def main(out_path: str = "spatial_scene.wav"):
    cx = FirewheelCtx()
    g = cx.graph_mut()

    per_group = NUM_EMITTERS // GROUPS
    group_sums = [
        g.add_node(2 * per_group, 2, SumNode()) for _ in range(GROUPS)
    ]
    master = g.add_node(2 * GROUPS, 2, SumNode())
    spatializers = []

    for i in range(NUM_EMITTERS):
        angle = 2 * math.pi * i / NUM_EMITTERS
        radius = 3.0 + (i % 5)
        pos = (radius * math.sin(angle), 0.0, -radius * math.cos(angle))
        freq = 110.0 * 2 ** ((i % 24) / 12.0)
        emitter = g.add_node(0, 1, BeepTestNode(freq, -30.0, True))
        spat = g.add_node(1, 2, Spatializer3DNode(position=pos))
        g.connect(emitter, 0, spat, 0)
        grp = group_sums[i // per_group]
        slot = i % per_group
        g.connect(spat, 0, grp, 2 * slot)
        g.connect(spat, 1, grp, 2 * slot + 1)
        spatializers.append((spat, angle, radius))

    for gi, grp in enumerate(group_sums):
        g.connect(grp, 0, master, 2 * gi)
        g.connect(grp, 1, master, 2 * gi + 1)

    vol = g.add_node(2, 2, VolumeNode(90.0))
    meter = g.add_node(2, 2, DbMeterNode())
    clip = g.add_node(2, 2, HardClipNode(0.0))
    g.connect(master, 0, vol, 0)
    g.connect(master, 1, vol, 1)
    g.connect(vol, 0, meter, 0)
    g.connect(vol, 1, meter, 1)
    g.connect(meter, 0, clip, 0)
    g.connect(meter, 1, clip, 1)
    g.connect(clip, 0, g.graph_out_node(), 0)
    g.connect(clip, 1, g.graph_out_node(), 1)

    n_nodes = len(list(g.nodes()))
    print(f"graph: {n_nodes} nodes ({NUM_EMITTERS} emitters)")

    # orbit the scene: every emitter sweeps 90° over the render
    for spat, angle, radius in spatializers[:: max(1, NUM_EMITTERS // 32)]:
        node = g.node(spat)

        def mover(t_angle, node=node, base=angle, r=radius):
            a = base + t_angle
            node.set_position((r * math.sin(a), 0.0, -r * math.cos(a)))

        cx.automation.add(
            f"orbit-{spat!r}",
            mover,
            AutomationCurve.linear([(0.0, 0.0), (1.5, math.pi / 2)]),
        )

    sink = WavSink(out_path, SR, 2)
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=1024, chunk_buffers=8), sink=sink
    )
    cx.render_offline(1.5)
    reading = DbMeterNode.read(cx.node_state(meter))
    stats = cx.stream.stats()
    cx.deactivate()

    print(
        f"rendered 1.5 s → {out_path}; master "
        f"peak {reading['peak_db'].round(1)} dB, "
        f"rms {reading['rms_db'].round(1)} dB; "
        f"render/buffer p50 {stats['render_ms_p50']:.2f} ms, "
        f"p99 {stats['render_ms_p99']:.2f} ms incl. one-time compiles / "
        f"{stats['buffer_budget_ms']:.2f} ms budget"
    )


if __name__ == "__main__":
    main(*sys.argv[1:2])
