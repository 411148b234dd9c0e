"""Per-block parameter timelines: block-accurate control inside chunks.

VERDICT r2 item 3: the reference applies params every block (volume.rs:92);
chunked dispatch snapshots once per K blocks.  Timeline leaves (PerBlock)
ride the chunk scan's xs, so a scheduled change lands on its exact
128-frame block even inside a 32-block dispatch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    ArraySink,
    AudioGraph,
    AudioGraphConfig,
    FirewheelCtx,
    ScheduleProgram,
    StreamConfig,
)
from firewheel_tpu.core.automation import AutomationCurve
from firewheel_tpu.executor import PerBlock, _split_timelines, clear_program_cache
from firewheel_tpu.nodes import BeepTestNode, VolumeNode

SR, F = 48000, 128


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_program_cache()
    yield
    clear_program_cache()


def beep_vol_program():
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vn = VolumeNode(100.0)
    vol = g.add_node(2, 2, vn)
    for ch in range(2):
        g.connect(beep, ch, vol, ch)
        g.connect(vol, ch, g.graph_out_node(), ch)
    pkg = g.compile(SR, F)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    return prog, vn


def packed_init(prog):
    state = {k: None for k in ()}  # placeholder, real below
    real = {}
    for key, proc in prog._procs.items():
        real[key] = proc.init_state()
    return prog.pack_state(real)


class TestSplit:
    def test_split_and_placeholder(self):
        tree = {"a": {"x": PerBlock(np.arange(4, dtype=np.float32))},
                "b": {"y": np.float32(2.0)}}
        static, tl = _split_timelines(tree)
        assert static["a"]["x"] == np.float32(0.0)
        assert list(tl.keys()) == [0]  # flatten order: a.x first
        np.testing.assert_array_equal(tl[0], np.arange(4, dtype=np.float32))

    def test_no_timelines_passthrough(self):
        tree = {"a": np.float32(1.0)}
        static, tl = _split_timelines(tree)
        assert tl == {} and static["a"] == np.float32(1.0)


class TestScheduledSet:
    def test_step_lands_on_exact_block(self):
        """One K=8 chunk with a gain step scheduled at block 4 must equal
        eight sequential single-block dispatches with the set applied
        between blocks 3 and 4."""
        K = 8
        # chunked render with a scheduled set
        prog, vn = beep_vol_program()
        packed = packed_init(prog)
        vn.set_percent_volume(25.0, at_sample=4 * F)
        gi = np.zeros((K, 0, F), np.float32)
        im = np.zeros((K, 0), bool)
        params = prog.collect_params(blocks=K, start_sample=0)
        outs, _, _ = prog.render_packed(params, packed, gi, im, 0, blocks=K)
        outs = np.asarray(outs)

        # sequential reference (fresh program+node: same topology)
        prog2, vn2 = beep_vol_program()
        packed2 = packed_init(prog2)
        seq = []
        for b in range(K):
            if b == 4:
                vn2.set_percent_volume(25.0)
            p = prog2.collect_params(
                blocks=1, start_sample=b * F, frames=F
            )
            o, _, packed2 = prog2.render_packed(
                p, packed2, np.zeros((0, F), np.float32),
                np.zeros((0,), bool), b * F, blocks=1,
            )
            seq.append(np.asarray(o)[0])
        seq = np.stack(seq)
        np.testing.assert_allclose(outs, seq, atol=1e-6, rtol=0)
        # sanity: the step is audible at block 4, not at block 0
        rms = np.sqrt((outs[:, 0] ** 2).mean(axis=-1))
        # steady before the step, decaying through the 10 ms smoother after
        assert abs(rms[3] - rms[0]) < 0.05 * rms[0]
        assert rms[5] < 0.8 * rms[3] and rms[7] < 0.6 * rms[3]

    def test_past_due_set_applies_at_block_zero(self):
        prog, vn = beep_vol_program()
        packed = packed_init(prog)
        vn.set_percent_volume(10.0, at_sample=0)
        params = prog.collect_params(blocks=4, start_sample=8 * F)
        # the set was due before this window: timeline is all-new-value
        key = [k for k, p in prog._procs.items()
               if type(p).__name__ == "VolumeProcessor"][0]
        tl = params[key]["raw_gain"]
        assert isinstance(tl, PerBlock)
        assert np.all(tl.values == tl.values[0])
        assert vn._scheduled == []

    def test_future_set_stays_queued(self):
        prog, vn = beep_vol_program()
        vn.set_percent_volume(10.0, at_sample=100 * F)
        prog.collect_params(blocks=4, start_sample=0)
        assert len(vn._scheduled) == 1  # not consumed yet

    def test_consume_false_touches_nothing(self):
        prog, vn = beep_vol_program()
        vn.set_percent_volume(10.0, at_sample=2 * F)
        params = prog.collect_params(
            blocks=8, start_sample=0, consume=False
        )
        assert len(vn._scheduled) == 1
        key = [k for k, p in prog._procs.items()
               if type(p).__name__ == "VolumeProcessor"][0]
        tl = params[key]["raw_gain"]
        assert np.all(tl.values == np.float32(vn.raw_gain()))


class TestAutomationChunkInvariance:
    def _render(self, chunk_buffers):
        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        g = cx.graph
        beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        vn = VolumeNode(100.0)
        vol = g.add_node(2, 2, vn)
        for ch in range(2):
            g.connect(beep, ch, vol, ch)
            g.connect(vol, ch, g.graph_out_node(), ch)
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=F, chunk_buffers=chunk_buffers),
            sink=sink,
        )
        cx.automation.add(
            "sweep",
            vn.set_percent_volume,
            AutomationCurve.linear([(0.0, 100.0), (0.25, 0.0)]),
            block_accurate=True,
        )
        cx.render_offline(0.3)
        cx.deactivate()
        return sink.audio(2)[0]

    def test_sweep_identical_chunked_vs_unchunked(self):
        a1 = self._render(chunk_buffers=1)
        a8 = self._render(chunk_buffers=8)
        n = min(len(a1), len(a8))
        np.testing.assert_allclose(a1[:n], a8[:n], atol=1e-6, rtol=0)
        # and the sweep actually happened
        assert np.abs(a1[: SR // 20]).max() > 10 * np.abs(a1[-SR // 20:]).max()


class TestBlockAccurateLaneLifecycle:
    """Review findings: final clamped value + cursor reset."""

    def test_final_clamped_value_is_scheduled(self):
        """A non-loop lane's last set carries value_at(end_time) (the
        clamped final value), not the value one block short of it."""
        from firewheel_tpu.core.automation import ParamAutomator

        auto = ParamAutomator()
        sets = []
        auto.add(
            "fade",
            lambda v, at_sample=None: sets.append((at_sample, v)),
            AutomationCurve.linear([(0.0, 1.0), (1.0, 0.0)]),  # 1 s fade
            start_time=0.0,
            block_accurate=True,
        )
        # tick well past the curve end in several horizons
        for start in range(0, 2 * SR, 4096):
            auto.tick_blocks(start, 4096, SR, F)
        assert not auto._lanes  # finished lane removed
        assert sets, "lane never fired"
        last_at, last_v = sets[-1]
        assert last_v == 0.0, f"parked at {last_v}, not the clamped end"
        # and the final set is at/after the curve end
        assert last_at >= SR

    def test_cursor_resets_on_reactivation(self):
        """After deactivate/activate the stream clock restarts at 0; a
        stale lane cursor must not park the lane until it catches up."""
        from firewheel_tpu.core.automation import ParamAutomator

        auto = ParamAutomator()
        sets = []
        auto.add(
            "lfo",
            lambda v, at_sample=None: sets.append(at_sample),
            AutomationCurve.linear([(0.0, 0.0), (10.0, 1.0)]),
            loop=True,
            block_accurate=True,
        )
        auto.tick_blocks(0, 4096, SR, F)
        n1 = len(sets)
        assert n1 > 0
        # simulate a stream restart without reset: cursor is far ahead
        auto.reset_block_cursors()
        auto.tick_blocks(0, 4096, SR, F)
        assert len(sets) > n1, "lane frozen after restart"

    def test_ctx_reactivation_resets_cursors(self):
        """The FirewheelCtx activate path calls reset_block_cursors."""
        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        g = cx.graph
        beep = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
        vn = VolumeNode(100.0)
        vol = g.add_node(2, 2, vn)
        for ch in range(2):
            g.connect(beep, ch, vol, ch)
            g.connect(vol, ch, g.graph_out_node(), ch)
        cx.automation.add(
            "vol",
            vn.set_percent_volume,
            AutomationCurve.linear([(0.0, 100.0), (100.0, 0.0)]),
            loop=True,
            block_accurate=True,
        )
        sink = ArraySink()
        cfg = StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False)
        cx.activate(cfg, sink=sink)
        cx.render_offline(0.1)
        lane = cx.automation._lanes["vol"]
        assert lane.next_sample and lane.next_sample > 0
        cx.deactivate()
        cx.activate(cfg, sink=ArraySink())
        assert lane.next_sample is None  # rewound at activate
        cx.render_offline(0.05)
        assert lane.next_sample and lane.next_sample > 0  # scheduling again
        cx.deactivate()


class TestScheduledSamplerCommands:
    """Sample-accurate (block-exact) sampler triggering: play/stop/seek
    with ``at_sample=`` land on their exact 128-frame block inside a
    chunked dispatch via the same PerBlock timelines as volume."""

    def _program(self):
        from firewheel_tpu.core.sample_resource import SampleResource
        from firewheel_tpu.nodes import SamplerNode

        rng = np.random.default_rng(7)
        clip = (rng.standard_normal((2, SR)) * 0.3).astype(np.float32)
        g = AudioGraph(AudioGraphConfig(0, 2))
        sn = SamplerNode(percent_volume=100.0)
        sn.set_sample(SampleResource(clip))
        sid = g.add_node(0, 2, sn)
        for ch in range(2):
            g.connect(sid, ch, g.graph_out_node(), ch)
        pkg = g.compile(SR, F)
        prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
        return prog, sn

    def _render_chunk_packed(self, prog, k, start):
        packed = prog.pack_state(prog.init_state()) if not hasattr(
            self, "_st") else self._st
        params = prog.collect_params(blocks=k, start_sample=start)
        gi = jnp.zeros((k, 0, F), jnp.float32)
        im = jnp.zeros((k, 0), bool)
        outs, oms, self._st = prog.render_packed(
            params, packed, gi, im, start, blocks=k
        )
        return np.asarray(outs)

    def test_play_lands_on_exact_block(self):
        clear_program_cache()
        prog, sn = self._program()
        k = 16
        trigger_block = 5
        sn.play(at_sample=trigger_block * F)
        out = self._render_chunk_packed(prog, k, 0)
        del self._st
        # blocks before the trigger are silent; the trigger block is not
        energy = np.abs(out).max(axis=(1, 2))
        assert np.all(energy[:trigger_block] == 0.0), energy
        assert energy[trigger_block] > 0.01
        # playback starts AT the trigger block: the first nonzero sample
        # across channels is exactly the block start
        nz = np.nonzero(np.abs(out.reshape(k, 2, F)[..., :]).sum(axis=1).ravel())[0]
        assert nz[0] == trigger_block * F

    def test_stop_and_seek_land_mid_chunk(self):
        clear_program_cache()
        prog, sn = self._program()
        k = 16
        sn.play()
        out1 = self._render_chunk_packed(prog, k, 0)
        assert np.abs(out1).max() > 0.01
        # schedule a stop at block 4 of the NEXT chunk
        stop_at = (k + 4) * F
        sn.stop(at_sample=stop_at)
        out2 = self._render_chunk_packed(prog, k, k * F)
        del self._st
        energy = np.abs(out2).max(axis=(1, 2))
        assert np.all(energy[:4] > 0.0)
        # declick release may bleed into the stop block; by the next
        # block everything is silent
        assert np.all(energy[5:] == 0.0), energy

    def test_chunked_matches_unchunked(self):
        """A scheduled trigger renders identically at K=16 and K=1."""
        clear_program_cache()
        outs = []
        for k in (16, 1):
            prog, sn = self._program()
            sn.play(at_sample=7 * F)
            st = prog.pack_state(prog.init_state())
            chunks = []
            n_blocks = 16
            b = 0
            while b < n_blocks:
                params = prog.collect_params(blocks=k, start_sample=b * F)
                gi = jnp.zeros((k, 0, F), jnp.float32)
                im = jnp.zeros((k, 0), bool)
                o, _, st = prog.render_packed(params, st, gi, im, b * F, blocks=k)
                chunks.append(np.asarray(o))
                b += k
            outs.append(np.concatenate(chunks, axis=0))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_unpacked_path_keeps_commands_queued(self):
        prog, sn = self._program()
        sn.play(at_sample=123456)
        p = prog.collect_params()  # no start_sample: immediate snapshot
        key = [k for k in p if "sampler" in k][0]
        assert not bool(np.asarray(p[key]["playing"]))
        assert sn._scheduled  # still queued
