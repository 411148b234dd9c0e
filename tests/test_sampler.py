"""Sampler node tests: playback, loops, seeks, one-shot end, resampling —
against a scalar golden model of the reference semantics
(sampler.rs:323-560).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import LoopRange, SamplerNode

SR = 48000
F = 128
INFO = BlockInfo.make()
RNG = np.random.default_rng(7)


def make_clip(frames=1000, channels=2):
    data = RNG.standard_normal((channels, frames)).astype(np.float32)
    return SampleResource(data, device=False), data


def run_blocks(node, proc, state, n_blocks):
    """Render n blocks; returns concatenated [ch, n*F] audio + final state."""
    outs = []
    empty = jnp.zeros((0, F), jnp.float32)
    emask = jnp.zeros((0,), bool)
    for _ in range(n_blocks):
        p = proc.collect_params()
        out, state, om = proc.kernel(p, state, empty, emask, INFO)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1), state


def fresh(node, num_out=2):
    proc = node.activate(SR, F, 0, num_out)
    return proc, proc.init_state()


def test_not_playing_is_silent():
    clip, data = make_clip()
    node = SamplerNode(100.0)
    node.set_sample(clip)
    proc, state = fresh(node)
    audio, state = run_blocks(node, proc, state, 2)
    assert (audio == 0).all()


def test_no_sample_is_silent():
    node = SamplerNode(100.0)
    node.play()
    proc, state = fresh(node)
    audio, _ = run_blocks(node, proc, state, 1)
    assert (audio == 0).all()


def test_oneshot_playback_bit_exact():
    clip, data = make_clip(frames=300)
    node = SamplerNode(100.0)  # unity gain, no smoothing needed
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node)
    audio, state = run_blocks(node, proc, state, 3)  # 384 frames > 300
    np.testing.assert_array_equal(audio[:, :300], data)
    assert (audio[:, 300:] == 0).all()
    # ended: further blocks silent
    audio2, state = run_blocks(node, proc, state, 1)
    assert (audio2 == 0).all()
    # reference semantics: play() while host-playing is a no-op; stop+play replays
    node.stop()
    node.play()
    audio3, state = run_blocks(node, proc, state, 1)
    np.testing.assert_array_equal(audio3, data[:, :F])


def test_full_loop_wraps():
    clip, data = make_clip(frames=100)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.set_loop_range(LoopRange.FULL)
    node.play()
    proc, state = fresh(node)
    audio, _ = run_blocks(node, proc, state, 2)  # 256 frames over a 100-loop
    expected = data[:, np.arange(256) % 100]
    np.testing.assert_array_equal(audio, expected)


def test_loop_range_secs():
    clip, data = make_clip(frames=1000)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    start_f, end_f = 200, 500
    node.set_loop_range(LoopRange.range_secs(start_f / SR, end_f / SR))
    node.set_playhead(start_f / SR)
    node.play()
    proc, state = fresh(node)
    audio, _ = run_blocks(node, proc, state, 4)  # 512 frames over a 300-loop
    pos = start_f + (np.arange(512) % (end_f - start_f))
    np.testing.assert_array_equal(audio, data[:, pos])


def test_seek_mid_playback():
    clip, data = make_clip(frames=2000)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node)
    a1, state = run_blocks(node, proc, state, 1)
    node.set_playhead(1000 / SR)
    a2, state = run_blocks(node, proc, state, 1)
    np.testing.assert_array_equal(a1, data[:, :F])
    np.testing.assert_array_equal(a2, data[:, 1000 : 1000 + F])


def test_pause_freezes_playhead():
    clip, data = make_clip(frames=2000)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node)
    a1, state = run_blocks(node, proc, state, 1)
    node.pause()
    a2, state = run_blocks(node, proc, state, 2)
    assert (a2 == 0).all()
    node.play()
    a3, state = run_blocks(node, proc, state, 1)
    np.testing.assert_array_equal(a3, data[:, F : 2 * F])


def test_gain_smoothing_applied():
    clip, data = make_clip(frames=8000)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node)
    a1, state = run_blocks(node, proc, state, 1)
    node.set_percent_volume(50.0)  # raw gain 0.25
    a2, state = run_blocks(node, proc, state, 55)  # > settle time (~10 ms
    # time constant, epsilon 1e-5 → ~11 tau ≈ 5300 samples)
    np.testing.assert_allclose(
        a2[:, -F:], data[:, 55 * F : 56 * F] * np.float32(0.25), atol=1e-6
    )


def test_muted_is_silent():
    clip, data = make_clip()
    node = SamplerNode(0.0)
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node)
    audio, _ = run_blocks(node, proc, state, 2)
    assert (audio == 0).all()


def test_mono_sample_duplicates_to_stereo():
    clip, data = make_clip(frames=500, channels=1)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node, num_out=2)
    audio, _ = run_blocks(node, proc, state, 1)
    np.testing.assert_array_equal(audio[0], data[0, :F])
    np.testing.assert_array_equal(audio[1], data[0, :F])


def test_extra_outputs_silent():
    clip, data = make_clip(frames=500, channels=2)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.play()
    proc, state = fresh(node, num_out=4)
    p = proc.collect_params()
    out, _, om = proc.kernel(
        p, proc.init_state(), jnp.zeros((0, F), jnp.float32),
        jnp.zeros((0,), bool), INFO,
    )
    om = np.asarray(om)
    assert not om[0] and not om[1] and om[2] and om[3]
    assert (np.asarray(out)[2:] == 0).all()


class TestResampling:
    def test_rate_half_linear_interp(self):
        frames = 400
        data = np.arange(frames, dtype=np.float32)[None, :] / frames
        clip = SampleResource(data, device=False)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        node.set_playback_rate(0.5)
        node.play()
        proc, state = fresh(node, num_out=1)
        audio, _ = run_blocks(node, proc, state, 1)
        # positions k*0.5 → linear ramp at half slope
        expected = (np.arange(F) * 0.5 / frames).astype(np.float32)
        np.testing.assert_allclose(audio[0], expected, atol=1e-6)

    def test_rate_double_skips(self):
        clip, data = make_clip(frames=4000, channels=1)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        node.set_playback_rate(2.0)
        node.play()
        proc, state = fresh(node, num_out=1)
        audio, state = run_blocks(node, proc, state, 2)
        np.testing.assert_allclose(
            audio[0], data[0, : 2 * 2 * F : 2], atol=1e-6
        )

    def test_fractional_rate_carries_across_blocks(self):
        frames = 10000
        data = RNG.standard_normal((1, frames)).astype(np.float32)
        clip = SampleResource(data, device=False)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        rate = 1.2345
        node.set_playback_rate(rate)
        node.play()
        proc, state = fresh(node, num_out=1)
        audio, _ = run_blocks(node, proc, state, 8)
        n = 8 * F
        # golden: positions accumulated per block with integer+frac carry
        pos = []
        ph, fr = 0, np.float32(0.0)
        for blk in range(8):
            off = fr + np.arange(F, dtype=np.float32) * np.float32(rate)
            pos.append(ph + np.floor(off))
            w = off - np.floor(off)
            adv = fr + np.float32(F) * np.float32(rate)
            ph += int(np.floor(adv))
            fr = np.float32(adv - np.floor(adv))
        pos = np.concatenate(pos).astype(np.int64)
        off_all = []
        ph, fr = 0, np.float32(0.0)
        got = audio[0]
        # verify: each output sample interpolates adjacent input frames
        i0 = pos
        i1 = np.minimum(pos + 1, frames - 1)
        # reconstruct weights identically
        ws = []
        fr = np.float32(0.0)
        for blk in range(8):
            off = fr + np.arange(F, dtype=np.float32) * np.float32(rate)
            ws.append(off - np.floor(off))
            adv = fr + np.float32(F) * np.float32(rate)
            fr = np.float32(adv - np.floor(adv))
        w = np.concatenate(ws)
        expected = data[0, i0] + (data[0, i1] - data[0, i0]) * w
        np.testing.assert_allclose(got, expected, atol=2e-6)

    def test_rate_one_is_bit_exact(self):
        clip, data = make_clip(frames=1000, channels=1)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        node.set_playback_rate(1.0)
        node.play()
        proc, state = fresh(node, num_out=1)
        audio, _ = run_blocks(node, proc, state, 4)
        np.testing.assert_array_equal(audio[0], data[0, : 4 * F])


class TestEnvelope:
    def test_attack_fades_in(self):
        clip, data = make_clip(frames=4000, channels=1)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        node.set_envelope(attack_secs=0.005, release_secs=0.005)  # 240 smp
        node.play()
        proc, state = fresh(node, num_out=1)
        audio, state = run_blocks(node, proc, state, 3)
        env = np.clip(np.arange(1, 3 * F + 1) / (0.005 * SR), 0, 1)
        np.testing.assert_allclose(
            audio[0], data[0, : 3 * F] * env.astype(np.float32), atol=1e-5
        )

    def test_release_fades_out_then_freezes(self):
        clip, data = make_clip(frames=8000, channels=1)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        node.set_envelope(attack_secs=0.0, release_secs=0.002)  # 96 samples
        node.play()
        proc, state = fresh(node, num_out=1)
        a1, state = run_blocks(node, proc, state, 1)
        node.pause()
        a2, state = run_blocks(node, proc, state, 2)
        # fade continues playback for ~96 samples then silence
        env = np.clip(1.0 - np.arange(1, 2 * F + 1) / (0.002 * SR), 0, 1)
        np.testing.assert_allclose(
            a2[0], data[0, F : 3 * F] * env.astype(np.float32), atol=1e-5
        )
        assert (a2[0, 100:] == 0).all()
        # resume: playhead advanced one fade block, not further
        node.play()
        a3, state = run_blocks(node, proc, state, 1)
        env_in = np.clip(np.arange(1, F + 1) * 2.0, 0, 1)  # attack 0 → instant
        np.testing.assert_allclose(a3[0], data[0, 2 * F : 3 * F], atol=1e-5)

    def test_zero_envelope_is_reference_exact(self):
        clip, data = make_clip(frames=1000, channels=1)
        node = SamplerNode(100.0)
        node.set_sample(clip)
        node.play()
        proc, state = fresh(node, num_out=1)
        audio, _ = run_blocks(node, proc, state, 2)
        np.testing.assert_array_equal(audio[0], data[0, : 2 * F])


def test_playhead_below_loop_range_plays_through():
    """Playhead below the loop range plays linearly up to the loop end,
    then wraps into the loop (sampler.rs:446-484 play-through semantics;
    regression: uint32 underflow used to jump to a garbage position)."""
    clip, data = make_clip(frames=1000, channels=1)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    start_f, end_f = 600, 900
    node.set_loop_range(LoopRange.range_secs(start_f / SR, end_f / SR))
    # seek BELOW the range start (set_loop_range with out-of-range playhead
    # keeps it, matching sampler.rs:405-411)
    node.set_playhead(100 / SR)
    node.play()
    proc, state = fresh(node, num_out=1)
    audio, _ = run_blocks(node, proc, state, 8)  # 1024 frames
    # linear portion: frames 100..900
    lin = min(end_f - 100, 8 * F)
    np.testing.assert_array_equal(audio[0, :lin], data[0, 100 : 100 + lin])
    # then wraps into [600, 900)
    rest = 8 * F - lin
    pos = start_f + (np.arange(rest) % (end_f - start_f))
    np.testing.assert_array_equal(audio[0, lin:], data[0, pos])


def test_loop_end_beyond_clip_is_clamped():
    clip, data = make_clip(frames=500, channels=1)
    node = SamplerNode(100.0)
    node.set_sample(clip)
    node.set_loop_range(LoopRange.range_secs(400 / SR, 2000 / SR))  # end > clip
    node.set_playhead(400 / SR)
    node.play()
    proc, state = fresh(node, num_out=1)
    audio, _ = run_blocks(node, proc, state, 2)
    pos = 400 + (np.arange(2 * F) % 100)  # clamped loop [400, 500)
    np.testing.assert_array_equal(audio[0], data[0, pos])


def test_muted_freezes_playhead():
    """Review finding (parity, sampler.rs:436-443): a muted voice must not
    consume its clip inaudibly or latch `ended` — the reference's muted
    early-return freezes playback before any playhead advance."""
    # the exponential gain smoother reaches the 1e-5 mute threshold only
    # after ~43 blocks (11.5 time constants of the 10 ms ramp) — size the
    # clip so the voice is still mid-clip at settle, and the muted sit
    # long enough that an un-frozen playhead would cross the clip end
    res, data = make_clip(frames=96 * F)
    node = SamplerNode(percent_volume=100.0)
    node.set_sample(res)
    proc, state = fresh(node)
    node.play()
    audio, state = run_blocks(node, proc, state, 1)
    assert np.abs(audio).max() > 0
    node.set_percent_volume(0.0)
    # fade covers ~44 blocks; the remaining muted blocks must not advance
    muted, state = run_blocks(node, proc, state, 60)
    assert np.abs(muted[:, -F:]).max() == 0.0
    frozen = int(np.asarray(state["playhead"]))
    assert not bool(np.asarray(state["ended"])), "muted voice latched ended"
    _, state2 = run_blocks(node, proc, state, 4)
    assert int(np.asarray(state2["playhead"])) == frozen  # fully frozen
    # restore the volume: playback resumes from the frozen playhead
    node.set_percent_volume(100.0)
    resumed, state3 = run_blocks(node, proc, state2, 2)
    assert np.abs(resumed).max() > 0
    expected = data[:, frozen: frozen + F]
    # the first resumed block ramps up from the frozen position: compare
    # against the clip content there (allowing the gain ramp)
    got = np.asarray(resumed[:, :F])
    nz = np.abs(got) > 1e-6
    ratio = got[nz] / expected[nz]
    assert np.all(ratio > 0) and np.all(ratio <= 1.0 + 1e-6)


def test_stop_when_not_playing_keeps_playhead():
    """Review finding (parity, sampler.rs:118-119): node-side stop() is a
    no-op unless playing — pause() then stop() then play() resumes from
    the paused playhead, not the loop start."""
    res, data = make_clip(frames=8 * F)
    node = SamplerNode(percent_volume=100.0)
    node.set_sample(res)
    proc, state = fresh(node)
    node.play()
    _, state = run_blocks(node, proc, state, 2)
    node.pause()
    _, state = run_blocks(node, proc, state, 6)  # let declick settle
    paused = int(np.asarray(state["playhead"]))
    assert paused > 0
    node.stop()  # must be a no-op (not playing)
    node.play()
    resumed, state = run_blocks(node, proc, state, 1)
    # the resumed audio continues from the paused playhead
    expected = data[:, paused: paused + F]
    got = np.asarray(resumed[:, :F])
    nz = np.abs(got) > 1e-6
    ratio = got[nz] / expected[nz]
    assert np.all(ratio > 0) and np.all(ratio <= 1.0 + 1e-6)
