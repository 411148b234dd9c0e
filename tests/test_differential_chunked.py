"""Differential fuzzer for the CHUNKED dispatch path (the hot path).

The static fuzzer drives `render_block` (one block per dispatch); the
streaming engine's hot path is K blocks per dispatch through
``lax.scan`` with packed params/state and per-block param timelines
(``processor._process_chunk`` → ``executor.render_packed``).  This fuzzer
renders random graphs through the FULL streaming processor with
``chunk_blocks=4`` and 512-frame buffers — exercising the scan body, the
packers, clock vectorization, timeline splicing, and the interleave
boundary — against the same naive per-block interpreter, including live
param pokes between buffers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from firewheel_tpu import GraphContext, UpdateStatus
from firewheel_tpu.core.node import BlockInfo, stream_time_from_sample
from firewheel_tpu.executor import clear_program_cache, node_key
from firewheel_tpu.processor import ProcessorStatus
from firewheel_tpu.testing import interpret_block

from test_differential_fuzz import F, SR, build_random_graph

K = 4  # blocks per chunk dispatch
BUFFERS = 3


@pytest.fixture(autouse=True)
def _fresh_cache():
    clear_program_cache()
    yield
    clear_program_cache()


def poke_random_param(rng, g, created):
    rec = created[int(rng.integers(len(created)))]
    node = g.node(rec[1])
    for name, lo, hi in (
        ("set_percent_volume", 0.0, 150.0),
        ("set_frequency", 100.0, 8000.0),
        ("set_feedback", 0.0, 0.8),
        ("set_pan", -1.0, 1.0),
        ("set_width", 0.0, 2.0),
        ("set_depth", 0.0, 1.0),
    ):
        setter = getattr(node, name, None)
        if setter is not None:
            setter(float(rng.uniform(lo, hi)))
            return


@pytest.mark.parametrize("seed", range(4))
def test_chunked_dispatch_differential(seed):
    rng = np.random.default_rng(1000 + seed)
    holder = {}

    def factory(n_in_ch):
        from firewheel_tpu import AudioGraphConfig

        holder["cx"] = GraphContext(AudioGraphConfig(n_in_ch, 2))
        return holder["cx"].graph

    g, created2, edges2 = build_random_graph(rng, graph_factory=factory)
    cx = holder["cx"]
    n_in = g.fuzz_num_inputs
    kin = node_key(cx.graph.graph_in_node())

    proc = cx.activate(SR, n_in, 2, F, chunk_blocks=K)
    res = cx.update()
    assert res.status == UpdateStatus.ACTIVE and res.graph_error is None
    proc.poll_messages()  # install the shipped schedule before inspecting

    procs = {node_key(nid): p for nid, p in proc._processors.items()}
    interp_state = {k: p.init_state() for k, p in procs.items()}

    span = K * F  # one buffer = one chunked dispatch
    sample = 0
    for buf in range(BUFFERS):
        gi_buf = (
            rng.standard_normal((span, n_in)).astype(np.float32) * 0.3
        )  # interleaved [frames, ch]
        out = np.zeros(span * 2, np.float32)

        # interpreter runs its blocks FIRST: params must be snapshotted
        # per block before process_interleaved consumes scheduled state
        ref_rows = []
        params = {k: p.collect_params() for k, p in procs.items()}
        for b in range(K):
            s = sample + b * F
            info = BlockInfo(
                stream_time_from_sample(jnp.uint32(s), float(SR)),
                jnp.asarray(s, jnp.uint32),
                jnp.asarray(0, jnp.uint32),
            )
            gi_b = jnp.asarray(gi_buf[b * F : (b + 1) * F].T)
            im_b = jnp.zeros((n_in,), bool)
            rows, _om, interp_state = interpret_block(
                created2, edges2, procs, params, interp_state,
                gi_b, im_b, info, kin,
            )
            ref_rows.append(np.asarray(rows))

        st = proc.process_interleaved(
            gi_buf.reshape(-1), out, n_in, 2, span, sample / SR
        )
        assert st == ProcessorStatus.OK

        got = out.reshape(span, 2).T
        ref = np.concatenate(ref_rows, axis=1)
        np.testing.assert_allclose(
            got, ref, atol=2e-5, rtol=0,
            err_msg=f"seed={seed} buffer={buf}: chunked dispatch diverged "
                    f"(nodes={[c[0] for c in created2]})",
        )
        sample += span
        poke_random_param(rng, cx.graph, created2)

    cx.deactivate(stream_is_running=False)
