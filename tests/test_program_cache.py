"""Cross-program compile cache: isomorphic schedules share executables.

The live-edit latency story (VERDICT r2 item 1): a topology edit builds a
fresh ScheduleProgram, but editing BACK to a previously-seen shape (the
add-voice / remove-voice / re-add editor pattern) must not recompile.
Programs whose canonical signatures match adopt each other's packed-path
jits + packers; outputs must be identical to an uncached render.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.executor import _PROGRAM_CACHE, clear_program_cache, node_key
from firewheel_tpu.nodes import BeepTestNode, HardClipNode, StereoPanNode, VolumeNode

SR, F = 48000, 128


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_program_cache()
    yield
    clear_program_cache()


def mixer_graph(n_voices=3, freqs=None):
    g = AudioGraph(AudioGraphConfig(0, 2))
    from firewheel_tpu.nodes import SumNode

    s = g.add_node(2 * n_voices, 2, SumNode())
    vol_ids = []
    for v in range(n_voices):
        f = (freqs or [220.0, 330.0, 440.0, 550.0])[v % 4]
        beep = g.add_node(0, 2, BeepTestNode(f, -18.0, True))
        vol = g.add_node(2, 2, VolumeNode(80.0))
        vol_ids.append(vol)
        for ch in range(2):
            g.connect(beep, ch, vol, ch)
            g.connect(vol, ch, s, 2 * v + ch)
    clip = g.add_node(2, 2, HardClipNode(0.0))
    for ch in range(2):
        g.connect(s, ch, clip, ch)
        g.connect(clip, ch, g.graph_out_node(), ch)
    return g, vol_ids


def program_of(g, procs=None):
    """Compile and track the live processor set across recompiles (the
    GraphProcessor bookkeeping, inlined for these unit tests)."""
    pkg = g.compile(SR, F)
    procs = dict(procs) if procs else {}
    for nid in pkg.nodes_to_remove:
        procs.pop(nid, None)
    procs.update(dict(pkg.new_node_processors))
    prog = ScheduleProgram(pkg.schedule, procs, SR)
    prog._test_procs = procs
    return prog


def packed_render(prog, blocks=2):
    state = {k: p.init_state() for k, p in prog._procs.items()}
    # _procs is canon-agnostic internally; the public path packs real keys
    real_state = {k: v for k, v in state.items()}
    packed = prog.pack_state(real_state)
    gi = np.zeros((blocks, 0, F), np.float32)
    im = np.zeros((blocks, 0), bool)
    outs, oms, packed = prog.render_packed(
        prog.collect_params(blocks=blocks), packed, gi, im, 0, blocks=blocks
    )
    return np.asarray(outs), packed


class TestSignature:
    def test_same_topology_same_signature(self):
        g1, _ = mixer_graph()
        g2, _ = mixer_graph()
        p1, p2 = program_of(g1), program_of(g2)
        assert p1.signature is not None
        assert p1.signature == p2.signature

    def test_rebuilt_after_edit_matches(self):
        """remove a voice then re-add it: new NodeIDs, same shape."""
        g, vols = mixer_graph()
        p1 = program_of(g)
        sig1 = p1.signature

        # grow: different shape
        beep = g.add_node(0, 2, BeepTestNode(550.0, -18.0, True))
        vol = g.add_node(2, 2, VolumeNode(70.0))
        for ch in range(2):
            g.connect(beep, ch, vol, ch)
        p2 = program_of(g, p1._test_procs)
        assert p2.signature != sig1

        # shrink back: same shape as p1 even though NodeIDs advanced
        g.remove_node(vol)
        g.remove_node(beep)
        p3 = program_of(g, p2._test_procs)
        assert p3.signature == sig1

    def test_param_changes_do_not_change_signature(self):
        g1, _ = mixer_graph(freqs=[220.0, 330.0, 440.0])
        g2, _ = mixer_graph(freqs=[110.0, 550.0, 660.0])
        assert program_of(g1).signature == program_of(g2).signature

    def test_different_node_type_changes_signature(self):
        g1, _ = mixer_graph(n_voices=2)
        g2, _ = mixer_graph(n_voices=2)
        # replace the clip with a pan on g2's tail — different kernel type
        p1 = program_of(g1)
        g3 = AudioGraph(AudioGraphConfig(0, 2))
        beep = g3.add_node(0, 2, BeepTestNode(220.0, -18.0, True))
        pan = g3.add_node(2, 2, StereoPanNode(0.3))
        for ch in range(2):
            g3.connect(beep, ch, pan, ch)
            g3.connect(pan, ch, g3.graph_out_node(), ch)
        p3 = program_of(g3)
        assert p1.signature != p3.signature


class TestAdoption:
    def test_isomorphic_program_adopts_compiled_artifacts(self):
        g1, _ = mixer_graph()
        p1 = program_of(g1)
        out1, _ = packed_render(p1)
        assert len(p1._jit_packed_cache) == 1

        g2, _ = mixer_graph()
        p2 = program_of(g2)
        # shared objects, not copies
        assert p2._jit_packed_cache is p1._jit_packed_cache
        assert p2._param_packer is p1._param_packer
        out2, _ = packed_render(p2)
        # no new program compiled for the shared size
        assert len(p1._jit_packed_cache) == 1
        np.testing.assert_array_equal(out1, out2)

    def test_adopted_render_matches_uncached(self):
        g1, _ = mixer_graph(freqs=[220.0, 330.0, 440.0])
        p1 = program_of(g1)
        packed_render(p1)

        # different params, same shape: rides p1's executable
        g2, _ = mixer_graph(freqs=[110.0, 550.0, 660.0])
        p2 = program_of(g2)
        out2, _ = packed_render(p2)

        # ground truth: same graph rendered with sharing disabled
        g3, _ = mixer_graph(freqs=[110.0, 550.0, 660.0])
        pkg = g3.compile(SR, F)
        p3 = ScheduleProgram(
            pkg.schedule, dict(pkg.new_node_processors), SR,
            share_compiled=False,
        )
        assert p3.signature is None
        out3, _ = packed_render(p3)
        np.testing.assert_array_equal(out2, out3)

    def test_cache_entry_registered_once(self):
        g1, _ = mixer_graph()
        p1 = program_of(g1)
        n = len(_PROGRAM_CACHE)
        p2 = program_of(mixer_graph()[0])
        assert len(_PROGRAM_CACHE) == n
        assert _PROGRAM_CACHE[p1.signature] is p1


class TestSignatureKeyVsGroupKey:
    """signature_key (compile-cache identity) is split from group_key
    (pooling eligibility): a default non-poolable SamplerNode must not
    force every live edit of the surrounding graph to recompile
    (round-4 soak regression — progcache stayed 0 for the game mixer)."""

    def _sampler_graph(self, poolable=False, n=4096):
        from firewheel_tpu.core.sample_resource import SampleResource
        from firewheel_tpu.nodes import LoopRange, SamplerNode

        g = AudioGraph(AudioGraphConfig(0, 2))
        clip = np.linspace(-0.2, 0.2, n, dtype=np.float32)[None, :].repeat(2, 0)
        smp = SamplerNode(percent_volume=90.0, poolable=poolable)
        smp.set_sample(SampleResource(clip))
        smp.set_loop_range(LoopRange.FULL)
        smp.play()
        src = g.add_node(0, 2, smp)
        vol = g.add_node(2, 2, VolumeNode(80.0))
        for ch in range(2):
            g.connect(src, ch, vol, ch)
            g.connect(vol, ch, g.graph_out_node(), ch)
        return g

    def test_nonpoolable_sampler_program_is_cacheable(self):
        p1 = program_of(self._sampler_graph())
        assert p1.signature is not None
        out1, _ = packed_render(p1)
        p2 = program_of(self._sampler_graph())
        assert p2.signature == p1.signature
        assert p2._jit_packed_cache is p1._jit_packed_cache
        out2, _ = packed_render(p2)
        assert len(p1._jit_packed_cache) == 1  # adopted, not recompiled
        np.testing.assert_array_equal(out1, out2)

    def test_poolable_and_nonpoolable_never_alias(self):
        # pooling is structural (vmapped vs per-node plan): equal
        # signature_keys must still split on the group_key flag
        p_np = program_of(self._sampler_graph(poolable=False))
        p_p = program_of(self._sampler_graph(poolable=True))
        assert p_np.signature is not None and p_p.signature is not None
        assert p_np.signature != p_p.signature

    def test_sample_shape_is_structural(self):
        p1 = program_of(self._sampler_graph(n=4096))
        p2 = program_of(self._sampler_graph(n=8192))
        assert p1.signature != p2.signature

    def test_streaming_sampler_program_is_cacheable(self):
        from firewheel_tpu.nodes.streaming_sampler import (
            CallbackStreamReader, StreamingSamplerNode,
        )

        def make():
            g = AudioGraph(AudioGraphConfig(0, 2))
            node = StreamingSamplerNode()
            node.set_reader(CallbackStreamReader(
                lambda start, n: np.zeros((2, n), np.float32),
                num_channels=2, len_frames=SR, sample_rate=SR,
            ))
            src = g.add_node(0, 2, node)
            for ch in range(2):
                g.connect(src, ch, g.graph_out_node(), ch)
            return g

        p1, p2 = program_of(make()), program_of(make())
        assert p1.signature is not None
        assert p1.signature == p2.signature

    def test_default_custom_node_still_opts_out(self):
        from firewheel_tpu.core.node import AudioNode, NodeProcessor

        class OpaqueProc(NodeProcessor):
            def kernel(self, params, state, inputs, in_mask, info):
                return inputs, state, in_mask

            def init_state(self):
                return {}

            def collect_params(self, **kw):
                return {}

        from firewheel_tpu.core.node import AudioNodeInfo

        class OpaqueNode(AudioNode):
            debug_name = "opaque"

            def info(self):
                return AudioNodeInfo(
                    num_max_supported_inputs=2,
                    num_max_supported_outputs=2,
                )

            def activate(self, sample_rate, max_block_frames,
                         num_inputs, num_outputs):
                return OpaqueProc(sample_rate, max_block_frames,
                                  num_inputs, num_outputs)

        g = AudioGraph(AudioGraphConfig(0, 2))
        beep = g.add_node(0, 2, BeepTestNode(440.0, -18.0, True))
        op = g.add_node(2, 2, OpaqueNode())
        for ch in range(2):
            g.connect(beep, ch, op, ch)
            g.connect(op, ch, g.graph_out_node(), ch)
        assert program_of(g).signature is None


class TestProcessorPathMigration:
    def test_live_edit_back_to_warmed_shape_needs_no_new_program(self):
        """Through the public ctx path: add a voice, remove it — the
        return edit reuses the original shape's compiled programs."""
        from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig
        from firewheel_tpu.nodes import SumNode

        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        g = cx.graph
        s = g.add_node(2, 2, SumNode())
        beep = g.add_node(0, 2, BeepTestNode(440.0, -18.0, True))
        for ch in range(2):
            g.connect(beep, ch, s, ch)
            g.connect(s, ch, g.graph_out_node(), ch)
        sink = ArraySink()
        cx.activate(StreamConfig(SR, 2, buffer_frames=F), sink=sink)
        cx.render_offline(0.05)
        proc = cx.stream._processor
        sig0 = proc._program.signature
        cache0 = proc._program._jit_packed_cache
        n_warm = len(cache0)
        assert n_warm >= 1

        # edit: replace the beep (remove + add) — isomorphic result
        g.remove_node(beep)
        beep2 = g.add_node(0, 2, BeepTestNode(660.0, -18.0, True))
        for ch in range(2):
            g.connect(beep2, ch, s, ch)
        cx.render_offline(0.05)
        assert proc._program.signature == sig0
        assert proc._program._jit_packed_cache is cache0
        assert len(cache0) == n_warm  # no new compiles for warmed sizes
        cx.deactivate()
        a = sink.audio(2)
        assert np.abs(a).max() > 0.01


class TestGroupPartitionStructural:
    """The pooling plan groups CONSECUTIVE nodes with EQUAL group_key
    VALUES — so two programs with identical signature_keys but different
    partitions (pooled pair vs per-node pair) trace different packed
    layouts and must not alias in the donor cache (review r4: the
    signature encoded only `group_key() is not None`)."""

    def _tagged_chain(self, tags):
        from firewheel_tpu.nodes import BeepTestNode, VolumeNode

        class TaggedVolumeNode(VolumeNode):
            def __init__(self, tag):
                super().__init__(80.0)
                self._tag = tag

            def activate(self, *a, **kw):
                proc = super().activate(*a, **kw)
                tag = self._tag
                base = proc.group_key()
                proc.group_key = lambda: ("tagged", base, tag)
                proc.signature_key = lambda: ("tagged", base)
                return proc

        g = AudioGraph(AudioGraphConfig(0, 2))
        prev = g.add_node(0, 2, BeepTestNode(220.0, -18.0, True))
        for t in tags:
            v = g.add_node(2, 2, TaggedVolumeNode(t))
            for ch in range(2):
                g.connect(prev, ch, v, ch)
            prev = v
        for ch in range(2):
            g.connect(prev, ch, g.graph_out_node(), ch)
        return g

    def test_partition_splits_the_signature(self):
        p_pooled = program_of(self._tagged_chain(["a", "a"]))
        p_split = program_of(self._tagged_chain(["a", "b"]))
        assert p_pooled.signature is not None
        assert p_split.signature is not None
        assert p_pooled.signature != p_split.signature
        # canonical renumbering: equal structure = equal signature,
        # independent of the tag values themselves
        assert program_of(
            self._tagged_chain(["z", "z"])
        ).signature == p_pooled.signature
        assert program_of(
            self._tagged_chain(["p", "q"])
        ).signature == p_split.signature
        # both plans render the same audio (same params everywhere)
        o1, _ = packed_render(p_pooled)
        o2, _ = packed_render(p_split)
        np.testing.assert_allclose(o1, o2, atol=2e-6)
