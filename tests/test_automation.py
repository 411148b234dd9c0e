"""Automation tests: bezier curve evaluation and the param-automator loop
(DESIGN_DOC.md:31 scope)."""

import numpy as np

from firewheel_tpu.core.automation import (
    AutomationCurve,
    Keyframe,
    ParamAutomator,
)


def test_hold_curve():
    c = AutomationCurve.hold(0.7)
    assert c.value_at(0.0) == 0.7
    assert c.value_at(100.0) == 0.7


def test_linear_curve():
    c = AutomationCurve.linear([(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)])
    assert abs(c.value_at(0.5) - 0.5) < 1e-9
    assert abs(c.value_at(1.5) - 0.75) < 1e-9
    assert c.value_at(-1.0) == 0.0
    assert c.value_at(5.0) == 0.5


def test_bezier_ease():
    """Ease-in-out: flat handles at both ends → slow start, slow end."""
    c = AutomationCurve(
        [
            Keyframe(0.0, 0.0, out_handle=(0.5, 0.0)),
            Keyframe(1.0, 1.0, in_handle=(-0.5, 0.0)),
        ]
    )
    # midpoint still 0.5 by symmetry
    assert abs(c.value_at(0.5) - 0.5) < 1e-6
    # eased: far from linear near the ends
    assert c.value_at(0.1) < 0.03
    assert c.value_at(0.9) > 0.97
    # monotone
    ts = np.linspace(0, 1, 101)
    vs = [c.value_at(t) for t in ts]
    assert all(b >= a - 1e-9 for a, b in zip(vs, vs[1:]))


def test_automator_drives_setter():
    values = []
    auto = ParamAutomator()
    auto.add("v", values.append, AutomationCurve.linear([(0.0, 0.0), (1.0, 100.0)]))
    for t in [0.0, 0.25, 0.5, 1.0]:
        auto.tick(t)
    assert np.allclose(values, [0.0, 25.0, 50.0, 100.0], atol=1e-6)


def test_automator_oneshot_finishes():
    values = []
    auto = ParamAutomator()
    auto.add("v", values.append, AutomationCurve.linear([(0.0, 0.0), (1.0, 1.0)]))
    auto.tick(2.0)  # past the end → final value, lane retired
    auto.tick(3.0)
    assert values == [1.0]


def test_automator_loop():
    values = []
    auto = ParamAutomator()
    auto.add(
        "v",
        values.append,
        AutomationCurve.linear([(0.0, 0.0), (1.0, 1.0)]),
        loop=True,
    )
    auto.tick(0.5)
    auto.tick(1.5)
    auto.tick(2.25)
    assert np.allclose(values, [0.5, 0.5, 0.25])


def test_automator_start_delay_and_remove():
    values = []
    auto = ParamAutomator()
    auto.add("v", values.append, AutomationCurve.hold(5.0), start_time=1.0)
    auto.tick(0.5)  # before start
    assert values == []
    auto.tick(1.5)
    assert values == [5.0]
    # lane retired itself (one-shot past its end)
    assert not auto.remove("v")
    # removal of an active lane works
    auto.add("w", values.append, AutomationCurve.linear([(0.0, 0.0), (9.0, 1.0)]))
    assert auto.remove("w")
    assert not auto.remove("w")


def test_ctx_integration():
    """FirewheelCtx ticks automation on the stream clock."""
    import time

    from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
    from firewheel_tpu.nodes import BeepTestNode, VolumeNode

    cx = FirewheelCtx()
    g = cx.graph_mut()
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)

    vol_node = g.node(vol)
    cx.automation.add(
        "fade",
        vol_node.set_percent_volume,
        AutomationCurve.linear([(0.0, 100.0), (0.25, 0.0)]),
    )
    sink = ArraySink()
    cx.activate(StreamConfig(48000, 2, buffer_frames=512), sink=sink)
    cx.render_offline(0.5)
    cx.deactivate()
    audio = sink.audio(2)
    # faded to silence by the end
    assert np.abs(audio[:, :2000]).max() > 0.1
    assert np.abs(audio[:, -2000:]).max() < 1e-3
