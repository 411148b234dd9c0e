"""Deferred schedule install: live topology edits never stall the stream.

VERDICT r2 item 1: the reference recompiles a dirty graph inside one
update() frame and hot-swaps next block (context.rs:118-127).  Here the
compile is XLA, so the processor stages the incoming schedule, keeps
rendering the OLD one, background-compiles the new programs one step per
pump, and installs (state-migrating) the moment size-1 is executable.
"""

import numpy as np
import pytest

from firewheel_tpu import (
    ArraySink,
    AudioGraphConfig,
    FirewheelCtx,
    StreamConfig,
)
from firewheel_tpu.executor import clear_program_cache
from firewheel_tpu.nodes import BeepTestNode, SumNode, VolumeNode

SR, F = 48000, 128


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_program_cache()
    yield
    clear_program_cache()


def _spectrum_has(freq, a, thresh_db=-40.0):
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    spec = spec / (spec.max() + 1e-12)
    idx = int(round(freq * len(a) / SR))
    window = spec[max(0, idx - 3): idx + 4]
    return 20 * np.log10(window.max() + 1e-12) > thresh_db


def build_ctx(deferred=True):
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    g = cx.graph
    s = g.add_node(4, 2, SumNode())
    beep = g.add_node(0, 2, BeepTestNode(440.0, -18.0, True))
    for ch in range(2):
        g.connect(beep, ch, s, ch)
        g.connect(s, ch, g.graph_out_node(), ch)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F, deferred_swap=deferred),
        sink=sink,
    )
    return cx, g, s, sink


class TestDeferredSwap:
    def test_edit_keeps_rendering_then_applies(self):
        cx, g, s, sink = build_ctx()
        proc = cx.stream._processor
        assert proc.deferred_swap
        cx.render_offline(0.1)

        # live edit: add a second voice
        beep2 = g.add_node(0, 2, BeepTestNode(880.0, -18.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch + 2)
        # the very next update ships the schedule; the processor stages
        # (not installs) it at its next message poll
        cx._cx.update()
        proc.poll_messages()
        assert proc.has_pending()
        # stream continues while pending; eventually the swap lands
        cx.render_offline(0.5)
        assert not proc.has_pending()
        cx.deactivate()

        a = sink.audio(2)[0]
        head, tail = a[: SR // 20], a[-SR // 5:]
        assert _spectrum_has(440.0, head)
        assert not _spectrum_has(880.0, head)
        assert _spectrum_has(880.0, tail)
        assert _spectrum_has(440.0, tail)  # old voice kept streaming

    def test_state_migrates_across_deferred_swap(self):
        """Surviving nodes keep recurrent state: the beep's phase is
        continuous through the install (no click/restart)."""
        cx, g, s, sink = build_ctx()
        cx.render_offline(0.05)
        beep2 = g.add_node(0, 2, BeepTestNode(660.0, -30.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch + 2)
        cx.render_offline(0.3)
        cx.deactivate()
        a = sink.audio(2)[0]
        # a phase reset at the swap would produce a sample-scale jump;
        # the 440 Hz sine's max first difference stays bounded by its
        # analytic slope (2*pi*f/sr * amplitude, ~7.3% of peak)
        amp = np.abs(a).max()
        max_step = np.abs(np.diff(a)).max()
        assert max_step < 1.2 * (2 * np.pi * 880.0 / SR) * amp

    def test_merged_pendings_install_final_topology(self):
        """Two rapid edits: the superseded pending folds into the next."""
        cx, g, s, sink = build_ctx()
        proc = cx.stream._processor
        cx.render_offline(0.05)

        beep2 = g.add_node(0, 2, BeepTestNode(880.0, -18.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch + 2)
        cx._cx.update()
        proc.poll_messages()
        assert proc.has_pending()
        # second edit before the first installs: remove it again
        g.remove_node(beep2)
        cx._cx.update()
        proc.poll_messages()
        cx.render_offline(0.3)
        assert not proc.has_pending()
        # the add-then-removed node was deactivated, not leaked
        assert len(proc._processors) == 4  # 2 sentinels + sum + beep
        cx.deactivate()
        a = sink.audio(2)[0]
        tail = a[-SR // 5:]
        assert _spectrum_has(440.0, tail)
        assert not _spectrum_has(880.0, tail)

    def test_chunked_stream_tail_warms_after_install(self):
        """chunk_buffers > 1: install happens at size 1, the chunk program
        warms behind it and becomes dispatchable."""
        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        g = cx.graph
        s = g.add_node(4, 2, SumNode())
        beep = g.add_node(0, 2, BeepTestNode(440.0, -18.0, True))
        for ch in range(2):
            g.connect(beep, ch, s, ch)
            g.connect(s, ch, g.graph_out_node(), ch)
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=F, chunk_buffers=4), sink=sink
        )
        proc = cx.stream._processor
        cx.render_offline(0.05)
        assert 4 in proc._warmed_sizes

        beep2 = g.add_node(0, 2, BeepTestNode(660.0, -18.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch + 2)
        cx.render_offline(0.5)
        assert not proc.has_pending()
        assert proc._strict_sizes and 4 in proc._warmed_sizes
        cx.deactivate()
        a = sink.audio(2)[0]
        assert _spectrum_has(660.0, a[-SR // 5:])

    def test_non_deferred_installs_next_buffer(self):
        """Reference semantics still available: deferred_swap=False."""
        cx, g, s, sink = build_ctx(deferred=False)
        proc = cx.stream._processor
        assert not proc.deferred_swap
        cx.render_offline(0.05)
        beep2 = g.add_node(0, 2, BeepTestNode(880.0, -18.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch + 2)
        cx.render_offline(0.1)
        assert not proc.has_pending()
        cx.deactivate()
        assert _spectrum_has(880.0, sink.audio(2)[0][-SR // 20:])


class TestEditDuringTailWarming:
    def test_edit_while_tail_warming_does_not_crash(self):
        """Review finding: a live edit arriving while the pending is only
        tail-warming an already-installed program (package=None) must not
        dereference the handed-over package — it supersedes the leftover
        warming and stages normally."""
        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        g = cx.graph
        s = g.add_node(4, 2, SumNode())
        beep = g.add_node(0, 2, BeepTestNode(440.0, -18.0, True))
        for ch in range(2):
            g.connect(beep, ch, s, ch)
            g.connect(s, ch, g.graph_out_node(), ch)
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=F, chunk_buffers=4,
                         deferred_swap=True),
            sink=sink,
        )
        proc = cx.stream._processor
        cx.render_offline(0.05)

        # edit #1: stage, then advance just enough to INSTALL (size-1
        # compiled) while the chunk-size program still tail-warms
        beep2 = g.add_node(0, 2, BeepTestNode(880.0, -18.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch + 2)
        cx._cx.update()
        proc.poll_messages()
        assert proc.has_pending()
        proc.advance_pending(max_steps=1)   # compiles size 1 -> installs
        assert proc.has_pending()           # tail-warming remains
        assert proc._pending.package is None

        # edit #2 lands DURING tail-warming
        g.remove_node(beep2)
        cx._cx.update()
        proc.poll_messages()                # must not raise
        assert proc.has_pending()
        cx.render_offline(0.3)
        assert not proc.has_pending()
        cx.deactivate()
        a = sink.audio(2)[0]
        assert _spectrum_has(440.0, a[-SR // 5:])
        assert not _spectrum_has(880.0, a[-SR // 5:])
