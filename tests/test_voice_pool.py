"""VoicePool: fire-and-forget polyphony over a fixed pooled sampler bank.

Pins the three properties the design document's "pools of nodes" story
needs on TPU: play() is retrace-free (topology never dirties), triggers
land sample-accurately, and allocation/stealing/priority behave like a
game engine expects.  Ref: DESIGN_DOC.md:35; sampler.rs control surface.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import (
    ArraySink,
    AudioGraphConfig,
    FirewheelCtx,
    SampleResource,
    StreamConfig,
    VoicePool,
)
from firewheel_tpu.executor import clear_program_cache, node_key

SR, F = 48000, 128


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_program_cache()
    yield
    clear_program_cache()


def ones_clip(frames, channels=1, value=1.0, sr=SR):
    return SampleResource(
        np.full((channels, frames), value, np.float32), sample_rate=sr
    )


def ramp_clip(frames, sr=SR):
    return SampleResource(
        np.linspace(0.1, 1.0, frames, dtype=np.float32)[None, :],
        sample_rate=sr,
    )


def build_ctx(num_voices=4, **pool_kw):
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    pool = VoicePool(cx.graph, num_voices=num_voices,
                     max_clip_frames=512, declick_secs=0.0, **pool_kw)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False), sink=sink
    )
    return cx, pool, sink


class TestRendering:
    def test_one_shot_sample_accurate_trigger(self):
        cx, pool, sink = build_ctx()
        clip = ones_clip(256)
        h = pool.play(clip, gain_db=0.0, pan=0.0, when=2 * F, now=0)
        assert h is not None
        cx.render_offline(8 * F / SR)
        cx.deactivate()
        L, R = sink.audio(2)
        # silent before the trigger sample...
        assert np.abs(L[: 2 * F]).max() == 0.0
        # ...full level from it (equal-power center pan ≈ 0.707)
        body = L[2 * F : 2 * F + 256]
        assert body.min() > 0.5, body.min()
        np.testing.assert_allclose(L[2 * F + 300 :], 0.0, atol=1e-6)
        np.testing.assert_allclose(L, R, atol=1e-6)  # centered

    def test_pan_and_gain(self):
        """A `when=` trigger ≥1 block out lets the pan smoother SNAP
        while the voice is still silence-masked (pan.py resets state
        under all-silent input) — the recommended game pattern."""
        cx, pool, sink = build_ctx()
        pool.play(ones_clip(256), gain_db=-6.0, pan=-1.0, when=F, now=0)
        cx.render_offline(5 * F / SR)
        cx.deactivate()
        L, R = sink.audio(2)
        body = slice(F, F + 256)
        assert np.abs(L[body]).max() > 0.3  # hard left carries signal
        assert np.abs(R[body]).max() < 1e-5  # right silent (snapped pan)
        # −6 dB ≈ ×0.501 into the hard-left equal-power gain (=1.0)
        np.testing.assert_allclose(L[F + 100], 0.501, atol=0.01)

    def test_loop_wraps_true_length_not_pad(self):
        """A 300-frame looped clip in a 512 bucket must wrap at 300 —
        trailing pad zeros would otherwise gap the loop."""
        cx, pool, sink = build_ctx()
        pool.play(ones_clip(300, value=0.5), loop=True, now=0)
        cx.render_offline(16 * F / SR)  # 2048 frames ≫ clip
        cx.deactivate()
        L, _ = sink.audio(2)
        # after the first wrap the signal must still be present —
        # check a window fully inside the second/third loop pass
        assert np.abs(L[600:900]).min() > 0.1, "loop gapped (pad leaked in)"

    def test_mono_clip_into_stereo_pool_and_mixdown(self):
        cx, pool, sink = build_ctx()
        pool.play(ones_clip(200, channels=1), now=0)
        pool.play(ones_clip(200, channels=4, value=0.25), now=0)
        cx.render_offline(4 * F / SR)
        cx.deactivate()
        L, R = sink.audio(2)
        assert np.abs(L[:200]).max() > 0.5
        np.testing.assert_allclose(L, R, atol=1e-6)


class TestZeroRecompile:
    def test_play_never_dirties_graph_or_program(self):
        cx, pool, sink = build_ctx()
        pool.preload(ramp_clip(400), ones_clip(256))
        cx.render_offline(2 * F / SR)
        proc = cx.stream._processor
        prog_before = proc._program
        assert not cx.graph.needs_compile()
        for i in range(6):
            pool.play(ramp_clip(100 + 37 * i), gain_db=-3.0 * i,
                      pan=0.2 * i - 0.5, now=i * F)
            cx.render_offline(F / SR)
        assert not cx.graph.needs_compile(), "play() dirtied the topology"
        assert cx.stream._processor._program is prog_before, (
            "play() triggered a program swap/retrace"
        )
        cx.deactivate()

    def test_voices_pool_into_one_group(self):
        """All N samplers share a group_key after clips are padded to the
        bucket — the whole bank traces as one vmapped kernel."""
        cx, pool, _ = build_ctx(num_voices=6)
        clip = ones_clip(333)
        for _ in range(6):
            pool.play(clip, now=0)
        procs = {
            node_key(nid): p
            for nid, p in cx.stream._processor._processors.items()
        }
        keys = {
            p.group_key() for p in procs.values()
            if type(p).__name__ == "SamplerProcessor"
        }
        assert len(keys) == 1, f"samplers split into {len(keys)} groups"
        cx.deactivate()


class TestAllocation:
    def test_steals_lowest_priority_oldest(self):
        cx, pool, _ = build_ctx(num_voices=2)
        clip = ones_clip(128)
        h1 = pool.play(clip, loop=True, priority=1, now=0)
        h2 = pool.play(clip, loop=True, priority=5, now=10)
        h3 = pool.play(clip, loop=True, priority=3, now=20)
        assert h3 is not None
        assert not h1.alive, "lowest-priority voice should have been stolen"
        assert h2.alive
        assert pool.active_voices(now=30) == 2
        cx.deactivate()

    def test_drop_when_outranked(self):
        cx, pool, _ = build_ctx(num_voices=2)
        clip = ones_clip(128)
        pool.play(clip, loop=True, priority=5, now=0)
        pool.play(clip, loop=True, priority=5, now=0)
        assert pool.play(clip, loop=True, priority=1, now=0) is None
        assert pool.active_voices(now=0) == 2
        cx.deactivate()

    def test_one_shots_free_after_duration(self):
        cx, pool, _ = build_ctx(num_voices=2)
        clip = ones_clip(256)  # bucket 512 → busy 512 stream samples
        pool.play(clip, now=0)
        pool.play(clip, now=0)
        assert pool.active_voices(now=100) == 2
        assert pool.active_voices(now=513) == 0
        h = pool.play(clip, now=600)  # a free voice, no steal needed
        assert h is not None and h.alive is True
        cx.deactivate()

    def test_stale_handle_is_noop(self):
        cx, pool, _ = build_ctx(num_voices=1)
        clip = ones_clip(128)
        h1 = pool.play(clip, loop=True, gain_db=0.0, now=0)
        v = pool._voices[0]
        h2 = pool.play(clip, loop=True, gain_db=-12.0, now=10)  # steals
        pct_after = v.sampler.percent_volume()
        h1.set_gain_db(+6.0)  # stale: must not touch the new sound
        assert v.sampler.percent_volume() == pct_after
        h2.set_gain_db(-3.0)  # live handle still works
        assert v.sampler.percent_volume() != pct_after
        assert not h1.alive and h2.alive
        cx.deactivate()

    def test_stop_all_and_handle_stop(self):
        cx, pool, _ = build_ctx(num_voices=3)
        clip = ones_clip(128)
        h = pool.play(clip, loop=True, now=0)
        pool.play(clip, loop=True, now=0)
        assert pool.active_voices(now=0) == 2
        h.stop()
        assert pool.active_voices(now=1) == 1
        pool.stop_all()
        assert pool.active_voices(now=1) == 0
        cx.deactivate()

    def test_clock_binding(self):
        t = {"s": 0}
        cx = FirewheelCtx(AudioGraphConfig(0, 2))
        pool = VoicePool(cx.graph, num_voices=2, max_clip_frames=512,
                         clock=lambda: t["s"])
        sink = ArraySink()
        cx.activate(
            StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False),
            sink=sink,
        )
        clip = ones_clip(256)
        pool.play(clip)  # now from clock (0)
        assert pool.active_voices() == 1
        t["s"] = 1000  # past the 512-sample busy window
        assert pool.active_voices() == 0
        cx.deactivate()


def test_same_voice_scheduled_retrigger():
    """Two sample-accurate triggers landing on the SAME voice (1-voice
    pool) must both fire: play() is a message (play_seq edge), so the
    second trigger clears the one-shot `ended` latch even when `playing`
    stayed latched True — and re-targeting keeps earlier-scheduled shots
    (only commands at/after the new trigger are dropped)."""
    cx, pool, sink = build_ctx(num_voices=1)
    clip = ones_clip(256, value=0.5)
    h1 = pool.play(clip, when=2 * F, now=2 * F - 1)
    h2 = pool.play(clip, when=10 * F, now=10 * F - 1)
    assert h1 is not None and h2 is not None
    cx.render_offline(14 * F / SR)
    cx.deactivate()
    L, _ = sink.audio(2)
    assert np.abs(L[2 * F : 2 * F + 256]).max() > 0.3, "first trigger lost"
    assert np.abs(L[10 * F : 10 * F + 256]).max() > 0.3, "re-trigger lost"
    assert np.abs(L[6 * F : 8 * F]).max() < 1e-6  # gap between shots


def test_bucket_growth_documented_retrace():
    """Without max_clip_frames the bucket derives from the first clip and
    grows for longer ones (shape change = one retrace, by design)."""
    cx = FirewheelCtx(AudioGraphConfig(0, 2))
    pool = VoicePool(cx.graph, num_voices=2, declick_secs=0.0)
    sink = ArraySink()
    cx.activate(
        StreamConfig(SR, 2, buffer_frames=F, deferred_swap=False), sink=sink
    )
    pool.play(ones_clip(100), now=0)
    assert pool.bucket_frames == 128
    pool.play(ones_clip(1000), now=0)
    assert pool.bucket_frames == 1024
    cx.render_offline(2 * F / SR)  # renders fine post-growth
    cx.deactivate()
    L, _ = sink.audio(2)
    assert np.abs(L).max() > 0.3


def test_trigger_lands_on_exact_sample():
    """`when=` triggers are SAMPLE-accurate, not block-accurate: a trigger
    37 samples into a block starts the shot on exactly that sample (the
    play timeline carries a sub-block offset the kernel applies at the
    trigger block)."""
    cx, pool, sink = build_ctx()
    clip = ones_clip(256)
    when = 2 * F + 37
    h = pool.play(clip, gain_db=0.0, pan=0.0, when=when, now=0)
    assert h is not None
    cx.render_offline(8 * F / SR)
    cx.deactivate()
    L = sink.audio(2)[0]
    assert np.abs(L[:when]).max() == 0.0
    assert L[when] > 0.5
    body = L[when : when + 256]
    assert body.min() > 0.5, body.min()
