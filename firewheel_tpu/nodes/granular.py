"""Granular sampler: independent time-stretch and pitch-shift playback.

Reference scope: the design doc plans "pitch shifting (doppler
stretching) nodes" (``/root/reference/DESIGN_DOC.md:24``) but the
reference never decouples the two — its sampler TODO
(``crates/firewheel-graph/src/basic_nodes/sampler.rs:359-522``) covers
only coupled resampling, where speed and pitch move together.  This
node completes the family: **tempo without pitch** (stretch a music bed
to fit a scene, keep the key) and **pitch without tempo** (granular
transpose; complements the FFT :class:`~firewheel_tpu.nodes.pitch_shift.
PitchShiftNode`, which works on live streams — this one owns its clip
and therefore has zero latency and exact identity at neutral settings).

TPU-native design
-----------------
Classic granular/OLA time-stretch is a per-grain pointer chase.  Here it
is three fixed-shape tensor ops per block:

* **Grain schedule is arithmetic, not state.**  Grains start every
  ``P = L/overlap`` output frames.  A block of ``F`` frames therefore
  overlaps a *static* set of ``G = overlap + F//P + 1`` grains: the
  ``overlap`` still-ringing ones (a tiny anchor ring in node state) and
  the ≤ ``F//P + 1`` spawned inside the block — so ages form a
  ``[G, F]`` iota, not a loop.
* **Playback is one gather + one reduction.**  Source positions
  ``anchor_g + age·pitch`` gather ``[ch, G, F]`` taps, a periodic-Hann
  window over age weights them, and a sum over ``G`` is the block.
  All MXU/VPU-friendly; no data-dependent control flow.
* **Exactness at neutral.**  Periodic Hann at hop ``L/overlap``
  satisfies COLA with constant ``overlap/2``; at ``tempo=1,
  pitch=0 st`` every grain reads ``sample[k]`` and the weights sum to
  exactly ``overlap/2`` — the node is an *identity* (to f32) after the
  first grain-length warmup, which the golden tests pin.
* **SOLA grain alignment, still fixed-shape.**  Naive granular detunes
  pure tones: when ``pitch ≠ tempo`` consecutive grains meet at
  mismatched phases and the windowed sum pulls the apparent frequency.
  The classic fix (synchronized overlap-add) picks each new grain's
  anchor by maximizing *normalized* cross-correlation against the
  phase-continuation point of the previous grain
  (``prev_anchor + hop·pitch``) over a bounded lag search — here one
  ``[lags, C]`` gather + one matvec + an argmax per spawn (ties break
  toward lag 0 by candidate order), traced like everything else.
  Normalization matters: the raw dot product favors louder candidate
  segments over the exact phase match, which would break the
  neutral-settings identity below.  ``align=False`` disables it (the golden tests
  pin the unaligned math against an independent grain-loop reference;
  the aligned path is pinned spectrally: a stretched/transposed tone
  must land on the right frequency).

Control mirrors :class:`~firewheel_tpu.nodes.sampler.SamplerNode`'s
sequence-numbered message scheme (play/stop/seek apply exactly once,
zero retraces); pause/stop freeze hard like the reference sampler.
One-shot only (loops belong to :class:`MusicPlayer` / the plain
sampler); the clip plays to its end, the grain tail rings out, then a
``finished`` device event fires once (``core/events.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeProcessor,
    MAX_PORTS,
)
from ..core.sample_resource import SampleResource
from ..core.smoother import (
    SmootherConfig,
    smoother_coeffs,
    smoother_init,
    smoother_set_and_process,
)
from ..core.units import percent_volume_to_raw_gain

__all__ = ["GranularSamplerNode", "GranularSamplerProcessor"]

_EMPTY_SAMPLE = np.zeros((1, 1), np.float32)


def _u32(x) -> int:
    return min(max(int(x), 0), 0xFFFFFFFF)


class GranularSamplerNode(AudioNode):
    debug_name = "granular_sampler"

    def __init__(
        self,
        percent_volume: float = 100.0,
        grain_frames: int = 2048,
        overlap: int = 4,
        align: bool = True,
    ):
        """``grain_frames``: grain length L in output frames (structural —
        changing it retraces).  ~43 ms at 48 kHz suits music/pads; shorter
        grains smear transients less but phase-roughen tones.
        ``overlap``: simultaneous grains (hop = L/overlap); 4 (75 %
        overlap) is the COLA sweet spot for Hann.  L must divide by
        overlap, and the stream's ``max_block_frames`` must be ≤
        ``(overlap-1)·hop`` (checked at activate) so at most one grain
        spawn lands per ring slot per block.  ``align``: SOLA grain
        alignment (see module docstring) — on by default; all three are
        structural (changing them retraces)."""
        if overlap < 2:
            raise ValueError(f"overlap must be >= 2, got {overlap}")
        if grain_frames % overlap != 0:
            raise ValueError(
                f"grain_frames ({grain_frames}) must be a multiple of "
                f"overlap ({overlap})")
        self.grain_frames = int(grain_frames)
        self.overlap = int(overlap)
        self.align = bool(align)
        self._percent_volume = max(float(percent_volume), 0.0)
        self._raw_gain = float(
            percent_volume_to_raw_gain(np.float32(percent_volume))
        )
        self._playing = False
        self._tempo = 1.0
        self._pitch_rate = 1.0
        self._sample: Optional[SampleResource] = None
        self._seek_seq = 0
        self._seek_secs = 0.0
        self._play_seq = 0
        self._sample_rate = 48000

    # -- control API ---------------------------------------------------------
    def set_sample(self, sample: SampleResource, stop_playback: bool = True):
        self._sample = sample
        if stop_playback:
            self._seek_seq += 1
            self._seek_secs = 0.0
            self._playing = False

    def play(self):
        """Start playback (a message: re-playing a finished voice
        re-triggers from the current seek position)."""
        self._playing = True
        self._play_seq += 1

    def pause(self):
        self._playing = False

    def stop(self):
        """Stop and rewind.  No-op while not playing (pause() then
        stop() keeps the paused playhead, like the sampler)."""
        if not self._playing:
            return
        self._playing = False
        self._seek_seq += 1
        self._seek_secs = 0.0

    def set_playhead(self, playhead_secs: float):
        """Seek in CLIP seconds (grain machinery restarts there)."""
        self._seek_seq += 1
        self._seek_secs = float(playhead_secs)

    def set_tempo(self, tempo: float):
        """Playback speed WITHOUT pitch change: 1.0 native, 0.5 half
        speed (twice as long), 2.0 double.  Live-safe (no retrace)."""
        self._tempo = max(float(tempo), 0.0)

    def set_pitch_semitones(self, semitones: float):
        """Transpose WITHOUT tempo change (±24 st useful range; larger
        shifts granulate audibly).  Live-safe (no retrace)."""
        self._pitch_rate = float(2.0 ** (float(semitones) / 12.0))

    def is_playing(self) -> bool:
        return self._playing

    def percent_volume(self) -> float:
        return self._percent_volume

    def set_percent_volume(self, percent_volume: float):
        self._raw_gain = float(
            percent_volume_to_raw_gain(np.float32(percent_volume))
        )
        self._percent_volume = max(float(percent_volume), 0.0)

    def raw_gain(self) -> float:
        return self._raw_gain

    # -- node plumbing ---------------------------------------------------------
    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        self._sample_rate = int(sample_rate)
        hop = self.grain_frames // self.overlap
        if int(max_block_frames) > (self.overlap - 1) * hop:
            raise ValueError(
                f"GranularSamplerNode(grain_frames={self.grain_frames}, "
                f"overlap={self.overlap}) needs max_block_frames <= "
                f"{(self.overlap - 1) * hop}, got {max_block_frames} — "
                "use a longer grain or a smaller block size")
        return GranularSamplerProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class GranularSamplerProcessor(NodeProcessor):
    supports_megakernel = False  # data-dependent playback gathers

    def __init__(self, node, sample_rate, max_block_frames,
                 num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames,
                         num_inputs, num_outputs)
        self._node = node
        self._coeffs = smoother_coeffs(sample_rate, SmootherConfig())
        self._eps = SmootherConfig().settle_epsilon
        self._sample_cache = None
        self._sample_cache_src = None

    def init_state(self):
        A = self._node.overlap
        L = self._node.grain_frames
        return {
            "gain": smoother_init(np.float32(self._node.raw_gain())),
            # source cursor (fixed point, like the sampler's playhead)
            "src_int": jnp.zeros((), jnp.uint32),
            "src_frac": jnp.zeros((), jnp.float32),
            # grain ring: age (output frames; >= L means dead) and source
            # anchor per slot
            "ages": jnp.full((A,), L, jnp.int32),
            "ring_int": jnp.zeros((A,), jnp.uint32),
            "ring_frac": jnp.zeros((A,), jnp.float32),
            "slot": jnp.zeros((), jnp.uint32),  # next spawn's ring slot
            "phase": jnp.zeros((), jnp.uint32),  # frames since last spawn
            "ended": jnp.zeros((), bool),
            "seek_seq": jnp.zeros((), jnp.uint32),
            "play_seq": jnp.zeros((), jnp.uint32),
            "finish_count": jnp.zeros((), jnp.uint32),
        }

    def event_counters(self):
        """``finished``: the one-shot's grain tail fully rang out."""
        return {"finished": "finish_count"}

    def signature_key(self):
        node = self._node
        shape = (
            tuple(np.asarray(node._sample.data).shape)
            if node._sample is not None
            else (1, 1)
        )
        return (shape, node.grain_frames, node.overlap, node.align)

    def collect_params(self, blocks=1, start_sample=None, frames=None,
                       consume=True):
        node = self._node
        if node._sample is not None:
            if self._sample_cache_src is not node._sample:
                self._sample_cache = jnp.asarray(node._sample.data)
                self._sample_cache_src = node._sample
            data = self._sample_cache
            has_sample = True
        else:
            data = jnp.asarray(_EMPTY_SAMPLE)
            has_sample = False
        sr = self.sample_rate
        clip_sr = (
            node._sample.sample_rate
            if has_sample and node._sample.sample_rate
            else sr
        )
        # clip-rate conversion rides BOTH cursors: a 44.1 kHz clip at
        # tempo 1 / pitch 0 plays at native speed and native pitch in a
        # 48 kHz stream (the plain sampler's clip-native rate rule)
        scale = clip_sr / sr
        return {
            "raw_gain": np.float32(node.raw_gain()),
            "playing": np.asarray(node._playing and has_sample, bool),
            "tempo": np.float32(node._tempo * scale),
            "pitch": np.float32(node._pitch_rate * scale),
            "seek_seq": np.uint32(node._seek_seq),
            "seek_pos": np.uint32(_u32(round(node._seek_secs * clip_sr))),
            "play_seq": np.uint32(node._play_seq & 0xFFFFFFFF),
            "sample": data,
        }

    def kernel(self, params, state, inputs, in_mask, info):
        F = self.max_block_frames if inputs.ndim < 2 else inputs.shape[-1]
        node = self._node
        L = node.grain_frames
        A = node.overlap
        P = L // A
        n_out = self.num_outputs
        sample = params["sample"]
        sample_channels, sample_len = sample.shape

        src_int = state["src_int"]
        src_frac = state["src_frac"]
        ages = state["ages"]
        ring_int = state["ring_int"]
        ring_frac = state["ring_frac"]
        slot = state["slot"]
        phase = state["phase"]
        ended = state["ended"]

        # ---- queued control state (sequence-numbered messages)
        seek_new = params["seek_seq"] != state["seek_seq"]
        trigger = params["play_seq"] != state["play_seq"]
        reset = seek_new | trigger
        src_int = jnp.where(seek_new, params["seek_pos"], src_int)
        src_frac = jnp.where(seek_new, jnp.float32(0.0), src_frac)
        # a seek or re-trigger restarts the grain machinery: kill the
        # ring, spawn fresh at the block start (phase 0 ≡ spawn due now)
        ages = jnp.where(reset, jnp.int32(L), ages)
        phase = jnp.where(reset, jnp.uint32(0), phase)
        ended = jnp.where(reset, False, ended)

        playing = params["playing"] & ~ended

        # ---- gain smoother + mute short-circuit (sampler pattern: a
        # muted voice freezes instead of consuming its clip inaudibly)
        gain_prev = jax.tree.map(
            lambda snap, cur: jnp.where(seek_new, snap, cur),
            smoother_init(params["raw_gain"]),
            state["gain"],
        )
        ramp, gain_processed, smoothing = smoother_set_and_process(
            gain_prev, params["raw_gain"], F, self._coeffs, self._eps
        )
        muted = ~smoothing & (ramp[0] < jnp.float32(0.00001))
        tail_live = jnp.any(ages < L)
        advancing = (playing | tail_live) & ~muted & ~ended
        gain_state = jax.tree.map(
            lambda new, old: jnp.where(advancing, new, old),
            gain_processed,
            gain_prev,
        )

        tempo = params["tempo"]
        pitch = params["pitch"]
        k = jnp.arange(F, dtype=jnp.int32)

        # Positions are carried as (int32 base, small f32 offset) pairs —
        # NEVER as absolute float32: for clips past 2^24 frames (~5.8 min
        # at 48 kHz) absolute f32 positions quantize to ≥2-sample steps,
        # detuning late playback (round-4 advisor).  The source cursor's
        # base is exact; offsets stay ≤ ~(L+F)·pitch, well inside f32's
        # exact-integer range.
        sb = src_int.astype(jnp.int32)  # source cursor base (exact)

        # ---- spawn schedule: new grains at local frames where
        # (phase + k) ≡ 0 (mod P); static bound S spawns per block
        S = F // P + 1 if F % P else F // P
        S = max(S, 1)
        ph = phase.astype(jnp.int32)
        t0 = jnp.where(ph == 0, 0, P - ph)
        t_j = t0 + P * jnp.arange(S, dtype=jnp.int32)  # [S]
        # spawn anchors RELATIVE to sb (small: ≤ src_frac + F·tempo)
        rel_at_t = src_frac + t_j.astype(jnp.float32) * tempo  # [S]
        # gate: sb + rel < sample_len.  (sample_len - sb) as f32 rounds
        # only when huge (>2^24), where the gate is trivially true.
        room = (jnp.int32(sample_len) - sb).astype(jnp.float32)
        spawned = (
            (t_j < F)
            & playing
            & ~muted
            & (rel_at_t < room)
        )  # [S]

        # ---- SOLA alignment: nudge each spawn's anchor (bounded lag)
        # onto the phase-continuation point of the previous grain.  The
        # spawn GATE and the tempo cursor stay on the unaligned anchor,
        # so lags never accumulate into a tempo error.
        if node.align:
            D = min(P // 2, 96)  # lag search radius (source frames)
            C = min(L // 2, 256)  # correlation window
            lag_order = np.zeros(2 * D + 1, np.int32)
            lag_order[1::2] = -np.arange(1, D + 1)
            lag_order[2::2] = np.arange(1, D + 1)
            lags = jnp.asarray(lag_order)  # 0 first: ties break to 0
            mono = jnp.mean(sample, axis=0)
            ci = jnp.arange(C, dtype=jnp.int32)
            prev_slot = jax.lax.rem(slot + jnp.uint32(A - 1), jnp.uint32(A))
            # previous anchor as (base, offset) — each tracked anchor
            # carries its own exact integer base
            prev_base = ring_int[prev_slot].astype(jnp.int32)
            prev_rel = ring_frac[prev_slot]
            prev_alive = ages[prev_slot] < L
            anchors_s = []
            for j in range(S):
                naive_rel = rel_at_t[j]  # base sb
                target_rel = prev_rel + jnp.float32(P) * pitch
                ti = prev_base + jnp.floor(target_rel).astype(jnp.int32)
                ni = sb + jnp.floor(naive_rel).astype(jnp.int32)
                seg_t = mono[jnp.clip(ti + ci, 0, sample_len - 1)]
                cand = mono[jnp.clip(
                    ni + lags[:, None] + ci[None, :], 0, sample_len - 1
                )]  # [lags, C]
                # NORMALIZED cross-correlation: the raw dot product is
                # biased toward higher-energy candidates (a lag with a
                # louder segment beats the exact phase match), which
                # breaks the neutral-settings identity; dividing by
                # ||cand|| makes the perfect match the strict maximum
                score = (cand @ seg_t) * jax.lax.rsqrt(
                    jnp.sum(cand * cand, axis=1) + jnp.float32(1e-12)
                )
                best = lags[jnp.argmax(score)].astype(jnp.float32)
                use = prev_alive & spawned[j]
                # clamp the ABSOLUTE anchor at 0: −sb as f32 is exact
                # whenever the clamp can bind (best ≥ −D, so it binds
                # only while sb ≤ D ≪ 2^24)
                anchor_rel_j = jnp.maximum(
                    naive_rel + jnp.where(use, best, 0.0),
                    -sb.astype(jnp.float32),
                )
                anchors_s.append(anchor_rel_j)
                # chain the normalized decomposition (matches the ring
                # install, so same-block and next-block SOLA targets see
                # identical f32 values)
                a_off_j = jnp.floor(anchor_rel_j)
                prev_base = jnp.where(
                    spawned[j], sb + a_off_j.astype(jnp.int32), prev_base
                )
                prev_rel = jnp.where(
                    spawned[j], anchor_rel_j - a_off_j, prev_rel
                )
                prev_alive = prev_alive | spawned[j]
            spawn_rel = jnp.stack(anchors_s)  # [S], base sb
        else:
            spawn_rel = rel_at_t

        # ---- grain tensor: ring grains (ages advance with k) + spawns
        ring_age = ages[:, None] + k[None, :]  # [A, F]
        spawn_age = k[None, :] - t_j[:, None]  # [S, F]
        age = jnp.concatenate([ring_age, spawn_age], axis=0)  # [G, F]
        # per-grain (int base, f32 frac∈[0,1)): spawns normalize to the
        # SAME decomposition their ring slot will carry, so a grain's
        # f32 position arithmetic is identical in its spawn block and
        # every later block (floor/subtract are exact in f32)
        spawn_off = jnp.floor(spawn_rel)
        spawn_base = sb + spawn_off.astype(jnp.int32)
        spawn_frac = spawn_rel - spawn_off
        base = jnp.concatenate(
            [ring_int.astype(jnp.int32), spawn_base]
        )  # [G]
        rel = jnp.concatenate([ring_frac, spawn_frac])  # [G]
        live = jnp.concatenate(
            [jnp.ones((A,), bool), spawned]
        )[:, None] & (age >= 0) & (age < L)  # [G, F]

        agef = age.astype(jnp.float32)
        # periodic Hann over grain age: COLA with constant A/2 at hop P
        w = 0.5 * (1.0 - jnp.cos((2.0 * np.pi / L) * agef))
        # source positions as base + small offset: the offset stays
        # ≤ |rel| + (L+F)·pitch, exact in f32 at any clip length
        pos_rel = rel[:, None] + agef * pitch  # [G, F]
        off = jnp.floor(pos_rel)
        frac = pos_rel - off
        idx = base[:, None] + off.astype(jnp.int32)
        in_range = (idx >= 0) & (idx < sample_len)
        idx0 = jnp.clip(idx, 0, sample_len - 1)
        idx1 = jnp.clip(idx + 1, 0, sample_len - 1)
        weight = jnp.where(live & in_range, w, 0.0)  # [G, F]
        s0 = sample[:, idx0]  # [ch, G, F]
        s1 = sample[:, idx1]
        taps = s0 + (s1 - s0) * frac[None, :, :]
        mix = jnp.einsum("cgf,gf->cf", taps, weight) * jnp.float32(2.0 / A)

        # ---- end-of-block state: age the ring, install spawns in their
        # slots (at most one spawn per slot per block — activate() pins
        # max_block_frames ≤ (A-1)·P), advance cursors
        new_ages = jnp.minimum(ages + F, L)
        new_ring_int = ring_int
        new_ring_frac = ring_frac
        arange_a = jnp.arange(A, dtype=jnp.uint32)
        for j in range(S):
            s_j = jax.lax.rem(slot + jnp.uint32(j), jnp.uint32(A))
            hit = (arange_a == s_j) & spawned[j]
            new_ages = jnp.where(hit, F - t_j[j], new_ages)
            a_off = jnp.floor(spawn_rel[j])
            a_int = sb + a_off.astype(jnp.int32)  # exact absolute anchor
            new_ring_int = jnp.where(
                hit, jnp.maximum(a_int, 0).astype(jnp.uint32), new_ring_int
            )
            new_ring_frac = jnp.where(
                hit, spawn_rel[j] - a_off, new_ring_frac
            )
        n_spawned = jnp.sum(spawned.astype(jnp.uint32))
        new_slot = jax.lax.rem(slot + n_spawned, jnp.uint32(A))
        # phase counts from the LAST spawn opportunity (spawned or not),
        # so the grid stays locked to the output clock
        new_phase = jax.lax.rem(
            phase + jnp.uint32(F), jnp.uint32(P)
        )

        adv = src_frac + jnp.float32(F) * tempo
        adv_int = jnp.floor(adv)
        new_src_int = src_int + adv_int.astype(jnp.uint32)
        new_src_frac = adv - adv_int

        # one-shot finish: the cursor passed the clip AND the grain tail
        # has fully rung out (the tail carries the clip's final audio)
        # — integer compare (f32 rounding of a >2^24 cursor could flip it)
        src_past = new_src_int >= jnp.uint32(sample_len)
        finished = playing & src_past & jnp.all(new_ages >= L)
        new_ended = jnp.where(advancing & finished, True, ended)
        new_finish_count = state["finish_count"] + jnp.where(
            advancing & finished, jnp.uint32(1), jnp.uint32(0)
        )

        # frozen (paused/muted/ended) blocks keep every cursor untouched
        def frz(new, old):
            return jnp.where(advancing, new, old)

        # a paused voice rings its grain tail out (graceful declick) but
        # the SOURCE cursor freezes with the pause, so resume continues
        # from the paused position, not one grain-length ahead
        def frz_src(new, old):
            return jnp.where(advancing & playing, new, old)

        silent = ~advancing
        gained = mix * ramp[None, :]

        rows = []
        mask_rows = []
        for ch in range(n_out):
            if ch < sample_channels:
                rows.append(gained[ch])
                mask_rows.append(silent)
            elif n_out == 2 and sample_channels == 1:
                rows.append(gained[0])  # mono→stereo duplicate
                mask_rows.append(silent)
            else:
                rows.append(jnp.zeros((F,), jnp.float32))
                mask_rows.append(jnp.asarray(True))
        out = jnp.stack(rows)
        out = gate(out, silent)
        out_mask = jnp.stack(mask_rows)

        new_state = {
            "gain": gain_state,
            "src_int": frz_src(new_src_int, src_int),
            "src_frac": frz_src(new_src_frac, src_frac),
            "ages": frz(new_ages, ages),
            "ring_int": frz(new_ring_int, ring_int),
            "ring_frac": frz(new_ring_frac, ring_frac),
            "slot": frz(new_slot, slot),
            "phase": frz(new_phase, phase),
            "ended": new_ended,
            "seek_seq": jnp.asarray(params["seek_seq"], jnp.uint32),
            "play_seq": jnp.asarray(params["play_seq"], jnp.uint32),
            "finish_count": new_finish_count,
        }
        return out, new_state, out_mask
