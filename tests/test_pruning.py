"""Opt-in compile-time dormancy pruning (SURVEY §7 "(b) compile-time
pruning"; VERDICT r2 item 9).

``graph.prune_dormant = True`` drops dormant sources (``is_dormant()``)
and every ``silence_transparent`` subgraph fed only by them from the
compiled schedule — the static counterpart of the reference's per-block
silence-mask skipping (volume.rs:94-100).  Re-enable via
``notify_dormancy_changed()`` recompiles; parked node state resumes
frozen (no reset, no leak).
"""

import numpy as np

from firewheel_tpu import (
    ArraySink,
    AudioGraph,
    AudioGraphConfig,
    FirewheelCtx,
    ScheduleProgram,
    StreamConfig,
)
from firewheel_tpu.executor import clear_program_cache, node_key
from firewheel_tpu.nodes import (
    BeepTestNode,
    HardClipNode,
    StereoPanNode,
    SumNode,
    VolumeNode,
)

SR, F = 48000, 128


def _sched_names(pkg):
    return [sn.id.debug_name for sn in pkg.schedule.schedule]


def build_two_voice(prune: bool):
    g = AudioGraph(AudioGraphConfig(0, 2))
    g.prune_dormant = prune
    s = g.add_node(4, 2, SumNode())
    live = g.add_node(0, 2, BeepTestNode(440.0, -18.0, True))
    live_vol = g.add_node(2, 2, VolumeNode(100.0))
    dead = g.add_node(0, 2, BeepTestNode(880.0, -18.0, False))  # disabled
    dead_vol = g.add_node(2, 2, VolumeNode(100.0))
    dead_pan = g.add_node(2, 2, StereoPanNode(0.3))
    for ch in range(2):
        g.connect(live, ch, live_vol, ch)
        g.connect(live_vol, ch, s, ch)
        g.connect(dead, ch, dead_vol, ch)
        g.connect(dead_vol, ch, dead_pan, ch)
        g.connect(dead_pan, ch, s, ch + 2)
        g.connect(s, ch, g.graph_out_node(), ch)
    return g, dead


class TestPruningCompile:
    def test_dormant_subgraph_dropped_from_schedule(self):
        g, _ = build_two_voice(prune=True)
        pkg = g.compile(SR, F)
        names = _sched_names(pkg)
        # the disabled beep AND its transparent downstream chain are gone
        assert names.count("beep_test") == 1
        assert names.count("volume") == 1
        assert "stereo_pan" not in names and "pan" not in "".join(names)
        # unpruned control
        g2, _ = build_two_voice(prune=False)
        names2 = _sched_names(g2.compile(SR, F))
        assert names2.count("beep_test") == 2

    def test_pruned_output_matches_unpruned(self):
        clear_program_cache()
        outs = []
        for prune in (True, False):
            g, _ = build_two_voice(prune)
            pkg = g.compile(SR, F)
            prog = ScheduleProgram(
                pkg.schedule, dict(pkg.new_node_processors), SR
            )
            import jax.numpy as jnp

            o, _, _ = prog.render_chunk(
                prog.collect_params(), prog.init_state(),
                jnp.zeros((8, 0, F), jnp.float32), jnp.zeros((8, 0), bool),
            )
            outs.append(np.asarray(o))
        # the dormant voice contributes exact silence either way
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-7)
        assert np.abs(outs[0]).max() > 0.05  # live voice is actually there

    def test_nontransparent_node_not_pruned(self):
        """A node without silence_transparent (e.g. a clip with observable
        semantics left False by default? HardClip IS transparent — use a
        meter-ish stand-in) stays scheduled even when fed by silence."""
        from firewheel_tpu.nodes import DbMeterNode

        g = AudioGraph(AudioGraphConfig(0, 2))
        g.prune_dormant = True
        dead = g.add_node(0, 2, BeepTestNode(880.0, -18.0, False))
        meter = g.add_node(2, 2, DbMeterNode())
        for ch in range(2):
            g.connect(dead, ch, meter, ch)
            g.connect(meter, ch, g.graph_out_node(), ch)
        names = _sched_names(g.compile(SR, F))
        assert "beep_test" not in names
        # the meter keeps reading (decaying to the floor) — not pruned
        assert any("meter" in n for n in names)

    def test_prune_off_by_default(self):
        g = AudioGraph(AudioGraphConfig(0, 2))
        dead = g.add_node(0, 2, BeepTestNode(880.0, -18.0, False))
        g.connect(dead, 0, g.graph_out_node(), 0)
        g.connect(dead, 1, g.graph_out_node(), 1)
        names = _sched_names(g.compile(SR, F))
        assert "beep_test" in names


class TestPruningLive:
    def test_reenable_resumes_frozen_state(self):
        """Disable → prune → re-enable: the beep's recurrent state is
        parked while pruned and revived on reschedule — not reset."""
        clear_program_cache()
        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        g = cx.graph
        g.prune_dormant = True
        beep_node = BeepTestNode(440.0, -18.0, True)
        beep = g.add_node(0, 2, beep_node)
        s = g.add_node(2, 2, SumNode())
        for ch in range(2):
            g.connect(beep, ch, s, ch)
            g.connect(s, ch, g.graph_out_node(), ch)
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False),
            sink=sink,
        )
        cx.render_offline(0.1)
        proc = cx.stream._processor

        beep_node.set_enabled(False)
        g.notify_dormancy_changed()
        cx.render_offline(0.05)
        st_parked = proc.node_state(beep)
        assert st_parked is not None, "pruned state must stay reachable"
        assert node_key(beep) in proc._parked_state
        cx.render_offline(0.1)  # silence keeps rendering while pruned
        st_parked2 = proc.node_state(beep)
        for a, b in zip(
            np.asarray(list(st_parked.values())[0]).ravel(),
            np.asarray(list(st_parked2.values())[0]).ravel(),
        ):
            np.testing.assert_array_equal(a, b)  # frozen, not advancing

        beep_node.set_enabled(True)
        g.notify_dormancy_changed()
        cx.render_offline(0.1)
        assert node_key(beep) not in proc._parked_state
        cx.deactivate()

        a = sink.audio(2)[0]
        # mid-section is silent, head and tail carry the tone
        n = len(a)
        head, tail = a[: SR // 20], a[-SR // 20:]
        mid = a[n // 2 - SR // 50: n // 2 + SR // 50]
        assert np.abs(head).max() > 0.05
        assert np.abs(tail).max() > 0.05

    def test_empty_after_pruning_everything(self):
        """All sources dormant: the schedule degenerates to sentinels and
        renders pure silence with silent masks."""
        clear_program_cache()
        g = AudioGraph(AudioGraphConfig(0, 2))
        g.prune_dormant = True
        dead = g.add_node(0, 2, BeepTestNode(880.0, -18.0, False))
        vol = g.add_node(2, 2, VolumeNode(100.0))
        clip = g.add_node(2, 2, HardClipNode(0.0))
        for ch in range(2):
            g.connect(dead, ch, vol, ch)
            g.connect(vol, ch, clip, ch)
            g.connect(clip, ch, g.graph_out_node(), ch)
        pkg = g.compile(SR, F)
        assert _sched_names(pkg) == ["graph_in", "graph_out"]
        prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
        import jax.numpy as jnp

        from firewheel_tpu.core.node import BlockInfo

        o, om, _ = prog.render_block(
            prog.collect_params(), prog.init_state(),
            jnp.zeros((0, F), jnp.float32), jnp.zeros((0,), bool),
            BlockInfo(0.0, 0, 0),
        )
        assert np.abs(np.asarray(o)).max() == 0.0
        assert bool(np.all(np.asarray(om)))
