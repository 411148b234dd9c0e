"""SessionServer: slot allocation, per-session isolation, event routing
(serving.py — the SERVING.md pattern as a component)."""

import numpy as np
import pytest

import firewheel_tpu as fw
from firewheel_tpu import SessionServer
from firewheel_tpu.core.sample_resource import SampleResource
from firewheel_tpu.nodes import BeepTestNode, SamplerNode, SumNode, VolumeNode

SR, F = 48000, 128
RNG = np.random.default_rng(5)


def make_template():
    """Template graph: tone -> volume, plus a one-shot SFX sampler, both
    summed to the output.  Idle state: volume 0, sampler paused."""
    g = fw.AudioGraph(fw.AudioGraphConfig(0, 2))
    tone = BeepTestNode(440.0, -12.0, True)
    vol = VolumeNode(0.0)  # idle template: muted
    sfx = SamplerNode(100.0)
    sfx.set_sample(SampleResource(
        (RNG.standard_normal((2, 256)) * 0.1).astype(np.float32),
        device=False,
    ))
    tid = g.add_node(0, 2, tone)
    vid = g.add_node(2, 2, vol)
    sid = g.add_node(0, 2, sfx)
    mix = g.add_node(4, 2, SumNode())
    g.connect(tid, 0, vid, 0)
    g.connect(tid, 1, vid, 1)
    g.connect(vid, 0, mix, 0)
    g.connect(vid, 1, mix, 1)
    g.connect(sid, 0, mix, 2)
    g.connect(sid, 1, mix, 3)
    g.connect(mix, 0, g.graph_out_node(), 0)
    g.connect(mix, 1, g.graph_out_node(), 1)
    pkg = g.compile(SR, F)
    prog = fw.ScheduleProgram(pkg.schedule, dict(pkg.new_node_processors), SR)
    return prog, {"tone": tone, "vol": vol, "sfx": sfx}


def rms(x):
    return float(np.sqrt((np.asarray(x, np.float64) ** 2).mean()))


def test_lifecycle_and_isolation():
    prog, n = make_template()
    srv = SessionServer(prog, capacity=4, chunk_blocks=8)
    assert srv.occupancy == 0

    h1 = srv.connect(lambda: n["vol"].set_percent_volume(100.0))
    h2 = srv.connect(lambda: n["vol"].set_percent_volume(0.0))
    assert h1 is not None and h2 is not None and srv.occupancy == 2
    out = None
    for _ in range(3):  # let h1's volume smoother settle
        out = np.asarray(srv.render())
    # session 1 audible, session 2 muted, vacant slots idle (muted)
    assert rms(out[h1.slot]) > 0.1
    assert rms(out[h2.slot]) < 1e-6
    assert rms(out[2]) < 1e-6 and rms(out[3]) < 1e-6

    # live per-session control: mute h1, unmute h2
    h1.update(lambda: n["vol"].set_percent_volume(0.0))
    h2.update(lambda: n["vol"].set_percent_volume(100.0))
    for _ in range(8):  # the 10 ms smoother snaps to 0 after ~5.5k samples
        out = np.asarray(srv.render())
    assert rms(out[h1.slot]) < 1e-6
    assert rms(out[h2.slot]) > 0.1

    # capacity exhaustion → None; disconnect frees the slot
    h3, h4 = srv.connect(), srv.connect()
    assert srv.connect() is None
    h3.disconnect()
    assert not h3.alive
    h5 = srv.connect()
    assert h5 is not None and h5.slot == h3.slot
    assert srv.occupancy == 4


def test_events_routed_per_session_and_isolated_across_reuse():
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=8)

    def fire():
        n["sfx"].play()

    def quiet():
        n["sfx"].pause()

    h1 = srv.connect(fire)
    h2 = srv.connect(quiet)
    srv.render()  # 8 blocks = 1024 frames ≫ the 256-frame clip
    ev = srv.poll_events()
    assert h1 in ev and all(e.name == "finished" for e in ev[h1])
    assert h2 not in ev

    # slot reuse: disconnect h1 (its counters hold total=1), reconnect a
    # NEW session that also fires — it must see exactly ITS OWN event
    h1.disconnect()
    h3 = srv.connect(fire)
    assert h3.slot == h1.slot
    srv.render()
    ev = srv.poll_events()
    assert h3 in ev
    (e,) = [e for e in ev[h3] if e.name == "finished"]
    assert e.count == 1 and e.total == 1  # fresh counters, fresh baseline
    # the dead handle routes nothing
    assert h1 not in ev


def test_pcm16_output_format():
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=4,
                        output_format="pcm16")
    h = srv.connect(lambda: n["vol"].set_percent_volume(100.0))
    out = None
    for _ in range(3):
        out = np.asarray(srv.render())
    assert out.dtype == np.int16
    assert np.abs(out[h.slot].astype(np.int32)).max() > 1000


def test_session_server_on_mesh():
    """SessionServer over a dp mesh: per-session splices + events work
    against sharded state (the virtual 8-device mesh)."""
    import jax
    from firewheel_tpu.parallel import make_mesh

    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh({"dp": ndev})
    prog, n = make_template()
    srv = SessionServer(prog, capacity=ndev, chunk_blocks=4,
                        mesh=mesh, axis="dp")
    h = srv.connect(lambda: (n["vol"].set_percent_volume(100.0),
                             n["sfx"].play()))
    out = None
    for _ in range(3):
        out = np.asarray(srv.render())
    assert rms(out[h.slot]) > 0.1
    assert all(rms(out[b]) < 1e-6 for b in range(ndev) if b != h.slot)
    ev = srv.poll_events()
    assert h in ev and any(e.name == "finished" for e in ev[h])


def test_sessions_and_events_on_hybrid_lowering():
    """The serving control plane + event routing work unchanged on the
    Pallas-island hybrid lowering (interpret mode on CPU)."""
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=4,
                        lowering="hybrid", hybrid_interpret=True, tile=1)
    h = srv.connect(lambda: (n["vol"].set_percent_volume(100.0),
                             n["sfx"].play()))
    out = None
    for _ in range(2):
        out = np.asarray(srv.render())
    assert rms(out[h.slot]) > 0.05
    ev = srv.poll_events()
    assert h in ev and any(e.name == "finished" for e in ev[h])


def test_connect_rejects_scheduled_commands_and_keeps_slot():
    """at_sample= scheduling needs per-dispatch timeline consumption the
    snapshot-based serving path doesn't perform — fail fast, don't
    silently drop the command; and a raising configure() must not leak
    its slot."""
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=4)
    with pytest.raises(ValueError, match="at_sample"):
        srv.connect(lambda: n["sfx"].play(at_sample=480))
    assert srv.occupancy == 0
    assert n["sfx"]._scheduled == []  # cleared, not left to pile up

    def boom():
        raise RuntimeError("game-side bug")

    with pytest.raises(RuntimeError):
        srv.connect(boom)
    assert srv.occupancy == 0
    # both slots still usable
    assert srv.connect() is not None and srv.connect() is not None
    assert srv.connect() is None


@pytest.mark.parametrize("seed", [0, 1])
def test_random_session_lifecycle_fuzz(seed):
    """Random connect/update/disconnect/reset/render/poll interleavings:
    no exceptions, slot accounting exact, vacant slots silent, output
    finite."""
    rng = np.random.default_rng(seed)
    prog, n = make_template()
    srv = SessionServer(prog, capacity=4, chunk_blocks=4)
    live = []

    def op_connect():
        h = srv.connect(lambda: (
            n["vol"].set_percent_volume(float(rng.choice([0.0, 50.0, 100.0]))),
            n["sfx"].play() if rng.integers(2) else n["sfx"].pause(),
        ))
        if h is not None:
            live.append(h)

    def op_disconnect():
        if live:
            live.pop(int(rng.integers(len(live)))).disconnect()

    def op_update():
        if live:
            h = live[int(rng.integers(len(live)))]
            h.update(lambda: n["vol"].set_percent_volume(
                float(rng.choice([0.0, 100.0]))))

    def op_reset():
        if live:
            live[int(rng.integers(len(live)))].reset()

    ops = [op_connect, op_connect, op_disconnect, op_update, op_reset]
    out = None
    for _ in range(30):
        ops[int(rng.integers(len(ops)))]()
        out = np.asarray(srv.render())
        ev = srv.poll_events()
        assert all(h.alive for h in ev)  # events only for live sessions
        assert srv.occupancy == len(live)
        assert np.isfinite(out).all()
    # all handles still consistent
    for h in live:
        assert h.alive
    dead = set(range(srv.capacity)) - {h.slot for h in live}
    # vacant slots render the idle (muted) template
    for b in dead:
        assert np.abs(out[b]).max() < 1e-6


def test_partial_configure_starts_from_idle_not_previous_tenant():
    """Round-3 verdict: a connect() configure that sets only SOME params
    must start from the server's IDLE snapshot, not from whatever the
    previous session's configure left on the shared template nodes."""
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=8)
    ha = srv.connect(lambda: n["vol"].set_percent_volume(100.0))
    # B's configure touches only the SFX sampler — it must NOT inherit
    # A's volume (idle template volume is 0 = muted)
    hb = srv.connect(lambda: n["sfx"].pause())
    out = None
    for _ in range(8):
        out = np.asarray(srv.render())
    assert rms(out[ha.slot]) > 0.1
    assert rms(out[hb.slot]) < 1e-6


def test_partial_update_composes_with_own_session_state():
    """update() configures run against the SESSION's previous control
    state: a partial update must keep what the session set earlier."""
    prog, n = make_template()
    srv = SessionServer(prog, capacity=1, chunk_blocks=8)
    h = srv.connect(lambda: n["vol"].set_percent_volume(100.0))
    h.update(lambda: n["sfx"].play())  # touches only the sampler
    out = None
    for _ in range(8):
        out = np.asarray(srv.render())
    assert rms(out[h.slot]) > 0.1  # the tone is still audible


def test_template_rests_idle_between_server_calls():
    """Between connect/update calls the template graph sits in its idle
    state — direct reads of node handles see idle, not the last tenant."""
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=8)
    srv.connect(lambda: n["vol"].set_percent_volume(100.0))
    assert n["vol"].percent_volume() == 0.0  # idle template value


def test_raising_configure_leaves_template_idle():
    prog, n = make_template()
    srv = SessionServer(prog, capacity=2, chunk_blocks=8)

    def bad():
        n["vol"].set_percent_volume(100.0)
        raise RuntimeError("client error")

    with pytest.raises(RuntimeError, match="client error"):
        srv.connect(bad)
    assert srv.occupancy == 0
    assert n["vol"].percent_volume() == 0.0
    # the next partial configure is unaffected by the failed one
    h = srv.connect(lambda: n["sfx"].pause())
    out = None
    for _ in range(4):
        out = np.asarray(srv.render())
    assert rms(out[h.slot]) < 1e-6


def test_render_stream_matches_sequential_chunks():
    """BatchRenderer.render_stream (the overlapped render→fetch serving
    loop) must deliver exactly the chunks a sequential render_chunk loop
    produces — pipelining is a latency trick, not a semantics change."""
    from firewheel_tpu.parallel import BatchRenderer

    prog, n = make_template()
    n["vol"].set_percent_volume(100.0)

    def renders(fn):
        br = BatchRenderer(prog, batch=3, output_format="pcm16")
        return fn(br, br.stack_params(), br.init_state())

    def sequential(br, params, state):
        outs, s = [], 0
        for _ in range(4):
            out, _om, state = br.render_chunk(
                params, state, start_sample=s, num_blocks=4)
            outs.append(np.asarray(out))
            s += 4 * F
        return outs

    def streamed(br, params, state):
        outs, state, s = br.render_stream(
            params, state, num_chunks=4, num_blocks=4)
        assert s == 4 * 4 * F
        return outs

    a, b = renders(sequential), renders(streamed)
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        assert x.dtype == np.int16 and x.shape == y.shape
        np.testing.assert_array_equal(x, y)
    # the callback variant delivers the same chunks and collects nothing
    got = []
    br = BatchRenderer(prog, batch=3, output_format="pcm16")
    ret, _, _ = br.render_stream(
        br.stack_params(), br.init_state(), num_chunks=4, num_blocks=4,
        on_chunk=got.append)
    assert ret is None and len(got) == 4
    for x, y in zip(a, got):
        np.testing.assert_array_equal(x, y)


def test_render_fetched_is_one_chunk_delayed_render():
    """SessionServer.render_fetched ships chunk t-1 while chunk t
    renders; flush() drains the last in-flight chunk."""
    def build():
        prog, n = make_template()
        srv = SessionServer(prog, capacity=2, chunk_blocks=4)
        srv.connect(lambda: n["vol"].set_percent_volume(100.0))
        return srv

    ref = build()
    want = [np.asarray(ref.render()) for _ in range(3)]

    srv = build()
    assert srv.render_fetched() is None  # pipeline priming
    got = [srv.render_fetched() for _ in range(2)]
    got.append(srv.flush())
    assert srv.flush() is None  # drained
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_fleet_checkpoint_restores_sessions_bit_exact(tmp_path):
    """SessionServer.save_checkpoint mid-stream → a FRESH server restores
    params+state+slots and renders bit-exactly; event counters are
    re-baselined (no pre-kill event replay)."""
    prog, n = make_template()
    srv = SessionServer(prog, capacity=4, chunk_blocks=4)
    ha = srv.connect(lambda: (n["vol"].set_percent_volume(100.0),
                              n["sfx"].play()))
    hb = srv.connect(lambda: n["vol"].set_percent_volume(37.0))
    srv.render(); srv.render()
    ev = srv.poll_events()
    assert ha in ev  # the 256-frame clip finished pre-checkpoint
    ck = str(tmp_path / "fleet")
    srv.save_checkpoint(ck, extra_meta={"app": {"tick": 42}})
    truth = [np.asarray(srv.render()) for _ in range(2)]

    prog2, n2 = make_template()
    srv2 = SessionServer(prog2, capacity=4, chunk_blocks=4)
    handles = srv2.restore_checkpoint(ck)
    assert set(handles) == {ha.slot, hb.slot}
    assert srv2.occupancy == 2 and srv2.sample == srv.sample - 8 * F
    # no resurrected events from before the checkpoint
    srv2.poll_events()  # establishes nothing new; baselines already set
    got = [np.asarray(srv2.render()) for _ in range(2)]
    for t, g in zip(truth, got):
        np.testing.assert_array_equal(t, g)
    assert srv2.poll_events() == {}
    # events still flow post-restore, attributed to the restored handle
    handles[ha.slot].update(lambda: n2["sfx"].play())
    srv2.render()
    ev2 = srv2.poll_events()
    assert handles[ha.slot] in ev2


def test_restore_rejects_capacity_mismatch(tmp_path):
    prog, n = make_template()
    srv = SessionServer(prog, capacity=4, chunk_blocks=4)
    srv.render()
    ck = str(tmp_path / "fleet")
    srv.save_checkpoint(ck)
    srv8 = SessionServer(make_template()[0], capacity=8, chunk_blocks=4)
    with pytest.raises(ValueError, match="batch mismatch|capacity"):
        srv8.restore_checkpoint(ck)


def test_session_server_adpcm4_wire_stream_decodes_per_session():
    """The serving wire format end-to-end at the SESSION level:
    ``SessionServer(..., output_format="adpcm4")`` ships uint8 IMA rows
    (one independently-decodable block per slot per chunk) through the
    render_fetched/flush pipeline, and each session's decoded stream
    carries ITS OWN control state (audible vs muted)."""
    from firewheel_tpu.ops.adpcm_device import (
        chunk_block_align,
        decode_ima_chunk,
    )

    prog, n = make_template()
    K = 8  # chunk frames = K*F = 1024, divisible by 8 as adpcm4 requires
    srv = SessionServer(prog, capacity=2, chunk_blocks=K,
                        output_format="adpcm4")
    h1 = srv.connect(lambda: n["vol"].set_percent_volume(100.0))
    h2 = srv.connect(lambda: n["vol"].set_percent_volume(0.0))

    rows = []
    assert srv.render_fetched() is None  # pipeline priming
    for _ in range(3):
        rows.append(srv.render_fetched())
    rows.append(srv.flush())

    S = K * F
    ba = chunk_block_align(prog.num_graph_outputs, S)
    audio = {h1.slot: [], h2.slot: []}
    for r in rows:
        assert r.dtype == np.uint8 and r.shape == (2, ba)
        pcm = decode_ima_chunk(r, prog.num_graph_outputs, S)
        for slot in audio:
            audio[slot].append(pcm[slot].astype(np.float32) / 32767.0)
    x1 = np.concatenate(audio[h1.slot], axis=1)  # [ch, 4*S]
    x2 = np.concatenate(audio[h2.slot], axis=1)

    # session 1: the 440 Hz template tone, at full volume once the
    # smoother settles (skip the first chunk)
    tail = x1[0, S:]
    spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
    f_peak = np.argmax(spec) * SR / tail.size
    assert abs(f_peak - 440.0) < 2.0 * SR / tail.size
    assert rms(tail) > 0.1
    # session 2 muted: silence quantizes to exact zero nibbles after the
    # initial smoother ramp
    assert rms(x2[:, S:]) < 1e-3
