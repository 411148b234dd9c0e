"""PCM16 serving output: device-side quantization in BatchRenderer.

``BatchRenderer(output_format="pcm16")`` returns game-ready interleaved
``int16[B, K, F, No]`` — the quantizer is the exact inverse of the
reference's i16→f32 load formula (sample_resource.rs:338-340), so fetch
bytes halve without changing what a client would hear after decode.
"""

import numpy as np
import jax
import jax.numpy as jnp

from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.core.sample_resource import pcm_f32_to_i16, pcm_i16_to_f32
from firewheel_tpu.nodes import BeepTestNode, VolumeNode
from firewheel_tpu.parallel import BatchRenderer, make_mesh

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


def test_roundtrip_full_i16_range():
    """Every value pcm_i16_to_f32 can produce quantizes back exactly."""
    i = np.arange(-32767, 32768, dtype=np.int16)
    back = np.asarray(jax.jit(pcm_f32_to_i16)(pcm_i16_to_f32(i)))
    np.testing.assert_array_equal(back, i)


def test_clip_and_edge_values():
    x = np.array([-2.0, -1.0, -1.0 + 1e-8, 0.0, 1.0, 2.0,
                  np.float32(0.5)], np.float32)
    got = np.asarray(pcm_f32_to_i16(x))
    assert got[0] == -32767 and got[1] == -32767      # clipped / exact -1
    assert got[3] == 0 and got[4] == 32767 and got[5] == 32767
    assert got[6] == int(np.round(0.5 * 32767))


def test_pcm16_matches_f32_render():
    prog = beep_program()
    B, K = 4, 3
    f32 = BatchRenderer(prog, batch=B)
    p16 = BatchRenderer(prog, batch=B, output_format="pcm16")
    out_f, mask_f, _ = f32.render_chunk(f32.stack_params(), f32.init_state(),
                                        num_blocks=K)
    out_i, mask_i, _ = p16.render_chunk(p16.stack_params(), p16.init_state(),
                                        num_blocks=K)
    assert out_i.dtype == jnp.int16
    assert out_i.shape == (B, K, F, prog.num_graph_outputs)
    expect = np.asarray(pcm_f32_to_i16(np.swapaxes(np.asarray(out_f), -1, -2)))
    np.testing.assert_array_equal(np.asarray(out_i), expect)
    np.testing.assert_array_equal(np.asarray(mask_i), np.asarray(mask_f))


def test_pcm16_under_mesh():
    mesh = make_mesh({"dp": 8})
    prog = beep_program()
    B, K = 16, 2
    ref = BatchRenderer(prog, batch=B)
    br = BatchRenderer(prog, batch=B, mesh=mesh, output_format="pcm16")
    out_f, _, _ = ref.render_chunk(ref.stack_params(), ref.init_state(),
                                   num_blocks=K)
    out_i, _, st = br.render_chunk(br.stack_params(), br.init_state(),
                                   num_blocks=K)
    expect = np.asarray(pcm_f32_to_i16(np.swapaxes(np.asarray(out_f), -1, -2)))
    np.testing.assert_array_equal(np.asarray(out_i), expect)
    # output stays batch-sharded (no gather between chunks)
    assert len(out_i.sharding.device_set) == 8
    # state chains: a second chunk renders the continuation
    out2, _, _ = br.render_chunk(br.stack_params(), st,
                                 start_sample=K * F, num_blocks=K)
    out2_f, _, _ = ref.render_chunk(ref.stack_params(),
                                    ref.render_chunk(ref.stack_params(),
                                                     ref.init_state(),
                                                     num_blocks=K)[2],
                                    start_sample=K * F, num_blocks=K)
    expect2 = np.asarray(pcm_f32_to_i16(np.swapaxes(np.asarray(out2_f), -1, -2)))
    np.testing.assert_array_equal(np.asarray(out2), expect2)


def test_pcm16_hybrid_lowering():
    prog = beep_program()
    B, K = 8, 2
    ref = BatchRenderer(prog, batch=B)
    hy = BatchRenderer(prog, batch=B, lowering="hybrid", tile=8,
                       hybrid_interpret=True, output_format="pcm16")
    out_f, _, _ = ref.render_chunk(ref.stack_params(), ref.init_state(),
                                   num_blocks=K)
    out_i, _, _ = hy.render_chunk(hy.stack_params(), hy.init_state(),
                                  num_blocks=K)
    assert out_i.dtype == jnp.int16
    expect = np.asarray(pcm_f32_to_i16(np.swapaxes(np.asarray(out_f), -1, -2)))
    # hybrid islands reorder float ops; quantized audio must agree to 1 LSB
    assert np.max(np.abs(np.asarray(out_i).astype(np.int32)
                         - expect.astype(np.int32))) <= 1
