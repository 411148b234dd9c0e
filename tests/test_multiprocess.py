"""Two-process DCN smoke: the multi-host serving path actually runs.

Spawns two real processes that join a ``jax.distributed`` group on the
CPU backend (2 local devices each → a 4-device global "dp" mesh), render
a dp-sharded ``BatchRenderer`` batch, and verify every host's
addressable output shards match a single-process unsharded reference —
upgrading ``parallel/distributed.py`` from unit-tested slicing math to
an executed cross-process path (SURVEY §5 distributed backend).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
os.environ["FIREWHEEL_TPU_PLATFORM"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())  # parent runs us with cwd=repo root
from firewheel_tpu.parallel.distributed import initialize_multihost
initialize_multihost(f"localhost:{port}", 2, rank)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

import numpy as np
from firewheel_tpu import AudioGraph, AudioGraphConfig, ScheduleProgram
from firewheel_tpu.nodes import BeepTestNode, VolumeNode
from firewheel_tpu.parallel import BatchRenderer, make_mesh

def program():
    g = AudioGraph(AudioGraphConfig(0, 2))
    b = g.add_node(0, 2, BeepTestNode(440.0, -12.0, True))
    vn = VolumeNode(100.0)
    v = g.add_node(2, 2, vn)
    g.connect(b, 0, v, 0); g.connect(b, 1, v, 1)
    g.connect(v, 0, g.graph_out_node(), 0); g.connect(v, 1, g.graph_out_node(), 1)
    pkg = g.compile(48000, 64)
    prog = ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), 48000)
    return prog, vn

B, K = 8, 2
prog, vol = program()
mesh = make_mesh({"dp": 4})
br = BatchRenderer(prog, batch=B, mesh=mesh, axis="dp")
params, state = br.stack_params(), br.init_state()
out, om, state = br.render_chunk(params, state, num_blocks=K)
# single-process unsharded reference (local devices only)
ref = BatchRenderer(prog, batch=B)
rparams, rstate = ref.stack_params(), ref.init_state()
rout, _, rstate = ref.render_chunk(rparams, rstate, num_blocks=K)
rout = np.asarray(rout)
for s in out.addressable_shards:
    got = np.asarray(s.data)
    want = rout[s.index[0]]
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)

# Multi-host per-instance control plane: update_instance must ride the
# SPMD jitted scatter (the eager .at[].set / np.asarray lift faults on
# non-addressable shards — ADVICE r2).  Every process makes the same call.
vol.set_percent_volume(50.0)
tree_i = prog.collect_params()
params2 = br.update_instance(params, 3, tree_i)
out2, _, _ = br.render_chunk(params2, state, num_blocks=K)
rparams2 = ref.update_instance(rparams, 3, tree_i)
rout2 = np.asarray(ref.render_chunk(rparams2, rstate, num_blocks=K)[0])
# reference continued from rstate; re-render sharded from same point
for s in out2.addressable_shards:
    got = np.asarray(s.data)
    want = rout2[s.index[0]]
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)

# Fleet checkpoint/resume across the two hosts (VERDICT r2 item 5): each
# process writes only its addressable shard, a FRESH renderer restores its
# own shard through make_array_from_process_local_data, and the resumed
# render is bit-exact vs the uninterrupted continuation.
ck = os.path.join(os.path.dirname(out_path), "fleet_ck")
br.save_checkpoint(ck, state, extra_meta={"app": {"tick": 7}})
truth, _, _ = br.render_chunk(params2, state, num_blocks=K)
assert os.path.exists(os.path.join(ck, f"state.rank{rank}.msgpack"))

import time
for _ in range(200):  # rank 0 writes meta.json; wait for the shared FS
    if os.path.exists(os.path.join(ck, "meta.json")):
        break
    time.sleep(0.05)

br3 = BatchRenderer(program()[0], batch=B, mesh=mesh, axis="dp")
state3, meta = br3.restore_checkpoint(ck)
assert meta["app"] == {"tick": 7}
resumed, _, _ = br3.render_chunk(params2, state3, num_blocks=K)
for s_t, s_r in zip(truth.addressable_shards, resumed.addressable_shards):
    assert s_t.index == s_r.index
    np.testing.assert_array_equal(np.asarray(s_t.data), np.asarray(s_r.data))

with open(out_path, "w") as f:
    f.write(f"RANK{rank}_OK")
print(f"RANK{rank}_OK", flush=True)
"""


def test_two_process_dp_render(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs, outs = [], []
    for rank in (0, 1):
        out = str(tmp_path / f"ok{rank}")
        outs.append(out)
        # run from the repo root so the child's repo-root resolution via
        # its own file path is double-covered by cwd
        p = subprocess.Popen(
            [sys.executable, str(child), str(rank), str(port), out],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        procs.append(p)
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed children timed out")
        logs.append(stdout)
    for rank, (p, out, log) in enumerate(zip(procs, outs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log[-2000:]}"
        assert open(out).read() == f"RANK{rank}_OK"
