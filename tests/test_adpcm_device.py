"""On-device IMA ADPCM egress (``output_format="adpcm4"``).

The device encoder (``ops/adpcm_device.py``) must be BIT-EXACT against
the host reference codec (``utils/adpcm.py``) — same greedy nibble
quantization, same decoder-mirrored reconstruction, same block layout —
so any WAV IMA decoder reproduces the stream.  Cuts shipped bytes 4×
vs pcm16 on the egress-bound serving path (docs/PERF.md).
"""

import numpy as np
import jax
import jax.numpy as jnp

from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.core.sample_resource import pcm_f32_to_i16
from firewheel_tpu.nodes import BeepTestNode, VolumeNode
from firewheel_tpu.ops.adpcm_device import (
    chunk_block_align,
    decode_ima_chunk,
    encode_ima_chunk,
)
from firewheel_tpu.parallel import BatchRenderer, make_mesh
from firewheel_tpu.utils.adpcm import decode_ima_blocks, encode_ima

SR = 48000
F = 128


def beep_program(freq=440.0):
    g = AudioGraph(AudioGraphConfig(0, 2))
    beep = g.add_node(0, 2, BeepTestNode(freq, -12.0, True))
    vol = g.add_node(2, 2, VolumeNode(100.0))
    g.connect(beep, 0, vol, 0)
    g.connect(beep, 1, vol, 1)
    g.connect(vol, 0, g.graph_out_node(), 0)
    g.connect(vol, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    return ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)


def _host_rows(pcm, block_align):
    """Host-encode each instance of int16 [B, S, No] with the reference
    codec → uint8 [B, block_align]."""
    B, S, No = pcm.shape
    rows = np.empty((B, block_align), np.uint8)
    for b in range(B):
        payload, frames = encode_ima(pcm[b].T, block_align)
        assert frames == S
        rows[b] = np.frombuffer(payload, np.uint8)
    return rows


def test_device_encoder_bit_exact_vs_host_codec():
    rng = np.random.default_rng(7)
    B, S, No = 5, 512, 2
    # mix of smooth tone, noise, and full-scale steps (exercises clamps)
    t = np.arange(S) / SR
    base = 0.8 * np.sin(2 * np.pi * 440.0 * t)
    pcm = np.stack(
        [
            np.stack([base, -base], axis=-1),
            rng.standard_normal((S, No)) * 0.4,
            np.clip(rng.standard_normal((S, No)) * 2.0, -1, 1),
            np.where(np.arange(S)[:, None] % 64 < 32, 0.99, -0.99)
            * np.ones((S, No)),
            np.zeros((S, No)),
        ]
    ).astype(np.float32)
    pcm_i16 = np.asarray(pcm_f32_to_i16(pcm))
    ba = chunk_block_align(No, S)
    dev = np.asarray(jax.jit(encode_ima_chunk)(pcm_i16))
    host = _host_rows(pcm_i16, ba)
    np.testing.assert_array_equal(dev, host)


def test_device_encoder_mono_and_decode_roundtrip():
    B, S, No = 3, 256, 1
    # smooth tones (ADPCM's design domain — white noise outruns the
    # step-size adaptation by construction), distinct phase per instance
    t = np.arange(S) / SR
    pcm = np.stack(
        [
            0.3 * np.sin(2 * np.pi * 440.0 * t + ph)
            for ph in (0.0, 1.1, 2.2)
        ]
    ).astype(np.float32)[:, :, None]
    pcm_i16 = np.asarray(pcm_f32_to_i16(pcm))
    ba = chunk_block_align(No, S)
    dev = np.asarray(jax.jit(encode_ima_chunk)(pcm_i16))
    np.testing.assert_array_equal(dev, _host_rows(pcm_i16, ba))
    # decode → lossy but close on a tone (4-bit quantization noise)
    dec = decode_ima_chunk(dev, No, S)  # [B, No, S]
    ref = pcm_i16.transpose(0, 2, 1).astype(np.float32)
    err = dec.astype(np.float32) - ref
    assert np.sqrt(np.mean(err**2)) < 0.01 * 32767


def test_frames_must_divide_by_8():
    import pytest

    with pytest.raises(ValueError):
        chunk_block_align(2, 100)
    with pytest.raises(ValueError):
        encode_ima_chunk(jnp.zeros((1, 100, 2), jnp.int16))


def test_batch_renderer_adpcm4_matches_host_pipeline():
    """adpcm4 output == host-encoding the f32 render's pcm16."""
    prog = beep_program()
    B, K = 4, 4
    fr = BatchRenderer(prog, batch=B)
    ar = BatchRenderer(prog, batch=B, output_format="adpcm4")
    out_f, _, _ = fr.render_chunk(fr.stack_params(), fr.init_state(),
                                  num_blocks=K)
    out_a, _, _ = ar.render_chunk(ar.stack_params(), ar.init_state(),
                                  num_blocks=K)
    No = prog.num_graph_outputs
    S = K * F
    ba = chunk_block_align(No, S)
    assert out_a.dtype == jnp.uint8 and out_a.shape == (B, ba)
    pcm = np.asarray(
        pcm_f32_to_i16(jnp.swapaxes(out_f, -1, -2))
    ).reshape(B, S, No)
    np.testing.assert_array_equal(np.asarray(out_a), _host_rows(pcm, ba))
    # the wire block is a STANDARD multi-channel IMA block: the generic
    # WAV-layout decoder reads it with the same block_align
    dec = decode_ima_blocks(np.asarray(out_a)[0].tobytes(), No, ba)
    assert dec.shape == (No, S + 1)  # +1 pad frame, dropped by clients
    err = dec[:, :S].astype(np.float32) - pcm[0].T.astype(np.float32)
    assert np.sqrt(np.mean(err**2)) < 0.02 * 32767


def test_adpcm4_sharded_equals_unsharded():
    prog = beep_program()
    B, K = 8, 2
    mesh = make_mesh({"dp": 4})
    plain = BatchRenderer(prog, batch=B, output_format="adpcm4")
    shard = BatchRenderer(prog, batch=B, output_format="adpcm4",
                          mesh=mesh, axis="dp")
    o1, _, _ = plain.render_chunk(plain.stack_params(), plain.init_state(),
                                  num_blocks=K)
    o2, _, _ = shard.render_chunk(shard.stack_params(), shard.init_state(),
                                  num_blocks=K)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_adpcm4_hybrid_lowering_matches_xla():
    prog = beep_program()
    B, K = 4, 2
    xla = BatchRenderer(prog, batch=B, output_format="adpcm4")
    hyb = BatchRenderer(prog, batch=B, output_format="adpcm4",
                        lowering="hybrid", hybrid_interpret=True, tile=4)
    o1, _, _ = xla.render_chunk(xla.stack_params(), xla.init_state(),
                                num_blocks=K)
    o2, _, _ = hyb.render_chunk(hyb.stack_params(), hyb.init_state(),
                                num_blocks=K)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
