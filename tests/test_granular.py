"""GranularSamplerNode: independent time-stretch / pitch-shift playback.

Golden contract: an independent per-grain NumPy reference (explicit
Python grain loop — none of the kernel's vectorized formulation) must
match the kernel sample-for-sample at arbitrary tempo/pitch; neutral
settings are an identity after the one-grain warmup (periodic-Hann COLA
at 75 % overlap).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu.core.node import BlockInfo
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import GranularSamplerNode
from firewheel_tpu.testing import validate_node

SR = 48000
F = 128
INFO = BlockInfo.make()
RNG = np.random.default_rng(11)


def ref_granular(sample, L, A, tempo, pitch, n_frames, seek=0, block=F):
    """Independent reference: explicit grain loop.  The source cursor
    mirrors the kernel's per-block f32 fixed-point accumulation (the
    repo's golden convention: pin the engine's actual f32 semantics,
    not an unreachable float64 ideal); grain math is elementary f32."""
    P = L // A
    ch, n = sample.shape
    tempo32 = np.float32(tempo)
    pitch32 = np.float32(pitch)
    # per-block source cursor, kernel op order: adv = frac + F·tempo
    n_blocks = -(-n_frames // block)
    src_int = np.zeros(n_blocks, np.int64)
    src_frac = np.zeros(n_blocks, np.float32)
    si, sf = seek, np.float32(0.0)
    for b in range(n_blocks):
        src_int[b], src_frac[b] = si, sf
        adv = np.float32(sf + np.float32(block) * tempo32)
        si += int(np.floor(adv))
        sf = np.float32(adv - np.float32(np.floor(adv)))
    out = np.zeros((ch, n_frames), np.float64)
    g = 0
    while g * P < n_frames:
        t = g * P
        b, t_local = t // block, t % block
        # the kernel carries positions as (exact int base, small f32
        # offset) pairs — never absolute f32 (round-5 precision fix):
        # anchor = src_int + rel0, normalized to (a_int, fr0∈[0,1))
        rel0 = np.float32(src_frac[b] + np.float32(t_local) * tempo32)
        a_off = np.float32(np.floor(rel0))
        a_int = int(src_int[b]) + int(a_off)
        fr0 = np.float32(rel0 - a_off)
        if rel0 < np.float32(n - src_int[b]):  # cursor inside the clip
            ages = np.arange(L)
            ks = t + ages
            m = ks < n_frames
            w = 0.5 * (1.0 - np.cos(2.0 * np.pi * ages / L))
            pos_rel = fr0 + ages.astype(np.float32) * pitch32
            off = np.floor(pos_rel)
            fr = pos_rel - off
            p0 = a_int + off.astype(int)
            valid = p0 < n
            p0c = np.clip(p0, 0, n - 1)
            p1c = np.clip(p0 + 1, 0, n - 1)
            s = sample[:, p0c] + (sample[:, p1c] - sample[:, p0c]) * fr
            out[:, ks[m]] += (s * (w * valid))[:, m]
        g += 1
    return (out * (2.0 / A)).astype(np.float32)


def drive(node, n_blocks, ch_out=2, frames=F):
    proc = node.activate(SR, frames, 0, ch_out)
    state = proc.init_state()
    empty = jnp.zeros((0, frames), jnp.float32)
    emask = jnp.zeros((0,), bool)
    outs, finishes = [], []
    for _ in range(n_blocks):
        out, state, om = proc.kernel(
            proc.collect_params(), state, empty, emask, INFO
        )
        outs.append(np.asarray(out))
        finishes.append(int(state["finish_count"]))
    return np.concatenate(outs, axis=1), finishes, state


def make_node(clip, L=1024, A=4, tempo=1.0, semitones=0.0, align=True):
    node = GranularSamplerNode(grain_frames=L, overlap=A, align=align)
    node.set_sample(SampleResource(clip, sample_rate=float(SR)))
    node.set_tempo(tempo)
    node.set_pitch_semitones(semitones)
    node.play()
    return node


def test_contract():
    clip = RNG.standard_normal((2, 4000)).astype(np.float32)
    node = GranularSamplerNode()
    node.set_sample(SampleResource(clip, sample_rate=float(SR)))
    node.play()
    validate_node(node, 0, 2)


def test_neutral_is_identity_after_warmup():
    """tempo=1, pitch=0 st: every grain reads sample[k] and the Hann
    COLA sum is exactly overlap/2 — identity once all grains overlap."""
    L, A = 1024, 4
    clip = RNG.standard_normal((2, 6000)).astype(np.float32)
    node = make_node(clip, L, A)
    out, _, _ = drive(node, 40)
    warm = L - L // A  # full overlap from (A-1)·P on
    np.testing.assert_allclose(
        out[:, warm:5000], clip[:, warm:5000], atol=2e-5, rtol=0
    )


def test_neutral_identity_on_periodic_signal():
    """Regression: on a pure tone, an UN-normalized SOLA correlation
    picks louder candidate segments over the exact phase match (lag ±1
    beat lag 0 on a 440 Hz sine), breaking the neutral identity with
    err ~7e-2.  Normalized cross-correlation makes lag 0 the strict
    maximum — identity must hold with align=True on periodic input."""
    L, A = 1024, 4
    n = 6000
    tt = np.arange(n, dtype=np.float64) / SR
    clip = np.stack([
        0.5 * np.sin(2 * np.pi * 440.0 * tt),
        0.3 * np.sin(2 * np.pi * 221.0 * tt + 0.7),
    ]).astype(np.float32)
    node = make_node(clip, L, A, align=True)
    out, _, _ = drive(node, 40)
    warm = L - L // A
    np.testing.assert_allclose(
        out[:, warm:5000], clip[:, warm:5000], atol=2e-5, rtol=0
    )


@pytest.mark.parametrize("tempo,semitones", [
    (1.0, 0.0), (0.5, 0.0), (2.0, 0.0), (1.0, 12.0),
    (1.0, -7.0), (0.75, 5.0), (1.31, -3.2),
])
def test_matches_grain_loop_reference(tempo, semitones):
    """align=False pins the raw OLA math against the grain loop; the
    tolerance covers transcendental ulps and summation order only (the
    reference mirrors the kernel's f32 cursor)."""
    L, A = 1024, 4
    pitch = 2.0 ** (semitones / 12.0)
    clip = RNG.standard_normal((2, 5000)).astype(np.float32)
    node = make_node(clip, L, A, tempo, semitones, align=False)
    n_blocks = 30
    out, _, _ = drive(node, n_blocks)
    ref = ref_granular(clip, L, A, tempo, pitch, n_blocks * F)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=0)


def test_stretch_doubles_duration_same_pitch():
    """tempo=0.5: the clip takes ~2x as long and the tone stays put."""
    n = 8192
    t = np.arange(n) / SR
    clip = np.stack([0.4 * np.sin(2 * np.pi * 440.0 * t)] * 2).astype(
        np.float32)
    node = make_node(clip, 1024, 4, tempo=0.5)
    out, finishes, _ = drive(node, 150)
    # finish: cursor passes n at output frame n/tempo, tail <= L + P later
    fin_block = finishes.index(1)
    lo, hi = int(n / 0.5), int(n / 0.5) + 1024 + 256 + F
    assert lo <= (fin_block + 1) * F <= hi + F, (fin_block * F, lo, hi)
    seg = out[0, 4096:12288]
    w = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.argmax(w) * SR / len(seg)
    assert abs(f - 440.0) < 8.0, f


def test_pitch_shift_same_duration():
    """+12 st: frequency doubles, duration unchanged."""
    n = 8192
    t = np.arange(n) / SR
    clip = np.stack([0.4 * np.sin(2 * np.pi * 440.0 * t)] * 2).astype(
        np.float32)
    node = make_node(clip, 1024, 4, semitones=12.0)
    out, finishes, _ = drive(node, 90)
    fin_block = finishes.index(1)
    lo, hi = n, n + 1024 + 256 + F
    assert lo <= (fin_block + 1) * F <= hi + F
    seg = out[0, 2048:6144]
    w = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.argmax(w) * SR / len(seg)
    assert abs(f - 880.0) < 16.0, f


def test_pause_freezes_resume_continues():
    """pause() rings the grain tail out but freezes the source cursor;
    resume picks up where the pause landed (no one-grain skip)."""
    L, A = 1024, 4
    clip = RNG.standard_normal((2, 6000)).astype(np.float32)
    node = make_node(clip, L, A)
    proc = node.activate(SR, F, 0, 2)
    state = proc.init_state()
    empty = jnp.zeros((0, F), jnp.float32)
    emask = jnp.zeros((0,), bool)
    for _ in range(10):
        _, state, _ = proc.kernel(
            proc.collect_params(), state, empty, emask, INFO)
    src_at_pause = int(state["src_int"])
    node.pause()
    tail = []
    for _ in range(12):  # tail (L frames = 8 blocks) rings out, then silence
        out, state, om = proc.kernel(
            proc.collect_params(), state, empty, emask, INFO)
        tail.append((np.max(np.abs(np.asarray(out))), bool(np.asarray(om)[0])))
    assert int(state["src_int"]) == src_at_pause  # cursor frozen
    assert tail[0][0] > 0.0 and not tail[0][1]  # tail audible
    assert tail[-1][0] == 0.0 and tail[-1][1]  # then silent + masked
    node.play()  # resume (a message)
    out, state, om = proc.kernel(
        proc.collect_params(), state, empty, emask, INFO)
    assert not bool(np.asarray(om)[0])
    # resumed grains anchor at the paused cursor, not ahead of it
    assert src_at_pause <= int(state["src_int"]) <= src_at_pause + 2 * F


def test_stop_rewinds_and_replays():
    clip = RNG.standard_normal((2, 6000)).astype(np.float32)
    node = make_node(clip, 1024, 4)
    proc = node.activate(SR, F, 0, 2)
    state = proc.init_state()
    empty = jnp.zeros((0, F), jnp.float32)
    emask = jnp.zeros((0,), bool)
    first = None
    for _ in range(6):
        out, state, _ = proc.kernel(
            proc.collect_params(), state, empty, emask, INFO)
        first = np.asarray(out) if first is None else first
    node.stop()
    for _ in range(10):
        _, state, _ = proc.kernel(
            proc.collect_params(), state, empty, emask, INFO)
    node.play()
    out, state, _ = proc.kernel(
        proc.collect_params(), state, empty, emask, INFO)
    np.testing.assert_allclose(np.asarray(out), first, atol=1e-6, rtol=0)


def test_mono_clip_duplicates_to_stereo():
    clip = RNG.standard_normal((1, 4000)).astype(np.float32)
    node = make_node(clip, 1024, 4)
    out, _, _ = drive(node, 10)
    np.testing.assert_array_equal(out[0], out[1])
    assert np.max(np.abs(out)) > 0.0


def test_block_size_guard():
    node = GranularSamplerNode(grain_frames=512, overlap=4)  # cap: 384
    with pytest.raises(ValueError, match="max_block_frames"):
        node.activate(SR, 512, 0, 2)


def test_full_stack_engine_render():
    """GranularSamplerNode through the public engine API: graph, offline
    render, stretch audibly longer than the clip."""
    from firewheel_tpu import ArraySink, FirewheelCtx, StreamConfig

    n = 24000  # 0.5 s clip
    t = np.arange(n) / SR
    clip = np.stack([0.3 * np.sin(2 * np.pi * 330.0 * t)] * 2).astype(
        np.float32)
    cx = FirewheelCtx()
    g = cx.graph_mut()
    node = GranularSamplerNode()
    gid = g.add_node(0, 2, node)
    g.connect(gid, 0, g.graph_out_node(), 0)
    g.connect(gid, 1, g.graph_out_node(), 1)
    node.set_sample(SampleResource(clip, sample_rate=float(SR)))
    node.set_tempo(0.5)  # 0.5 s clip -> ~1 s of audio
    node.play()
    sink = ArraySink()
    cx.activate(StreamConfig(SR, 2, buffer_frames=512), sink=sink)
    cx.render_offline(1.5)
    cx.deactivate()
    L_out = sink.audio(2)[0]
    seg = L_out[24000:40000]  # past the clip's native end: still sounding
    assert np.sqrt(np.mean(seg**2)) > 0.1
    w = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.argmax(w) * SR / len(seg)
    assert abs(f - 330.0) < 6.0, f
    tail = L_out[55000:]  # ~1.15 s: finished, silent
    assert np.max(np.abs(tail)) == 0.0


def test_long_clip_precision_past_2pow24():
    """Round-4 advisor regression: absolute-f32 grain positions quantize
    to >=2-sample steps past 2^24 frames (~5.8 min at 48 kHz), detuning
    late playback.  Positions now ride (exact int base, small f32
    offset) pairs, so the neutral identity must hold verbatim even when
    playing at a seek position beyond 2^24."""
    L, A = 512, 4
    pos0 = 2**24 + 1237  # odd offset: absolute f32 cannot represent it
    n = pos0 + 20000
    clip = np.zeros((1, n), np.float32)
    # signal only where the test reads (cheap to build, gathers hit it)
    seg = RNG.standard_normal(20000).astype(np.float32)
    clip[0, pos0:] = seg
    node = make_node(clip, L, A, align=False)
    node.set_playhead(pos0 / SR)
    node.play()
    n_blocks = 40
    out, _, _ = drive(node, n_blocks, ch_out=1)
    warm = L - L // A
    np.testing.assert_allclose(
        out[0, warm:n_blocks * F],
        seg[warm:n_blocks * F],
        atol=2e-5, rtol=0,
    )
