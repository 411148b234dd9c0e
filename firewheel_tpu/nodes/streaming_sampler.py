"""Streaming sampler: play audio longer than device memory wants resident.

Reference scope: the sampler's "disk and network streaming" sub-feature
(``DESIGN_DOC.md`` sampler list; unimplemented there).

TPU-native design: the device holds only a **sliding window** of the clip
(``f32[ch, W]``, a param like the in-memory sampler's array); the host
prefetches ahead of the playhead from a *stream reader* — any object with
``num_channels / len_frames / sample_rate / read(start, n)``:

* :class:`~firewheel_tpu.utils.wav.WavStreamReader` — memory-mapped disk
  streaming;
* :class:`CallbackStreamReader` — wrap a closure (network fetch, procedural
  generation, a decoder, ...).

The host tracks a shadow playhead: the executor passes each dispatch's
block count into ``collect_params(blocks=...)``, the estimate advances by
``blocks × block × rate`` frames, and the window refills (growing once if a
chunked dispatch outspans it) when the lookahead margin shrinks.  The kernel gathers ``positions − window_start`` and masks samples
outside the window, so a starved window degrades to silence, never garbage.

Playback is sequential (play/pause/stop/seek; no loop ranges — loop a
window-sized clip with the in-memory :class:`SamplerNode` instead).
"""

from __future__ import annotations

from typing import Callable

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
from ..core.smoother import (
    SmootherConfig,
    smoother_coeffs,
    smoother_init,
    smoother_set_and_process,
)
from ..core.units import percent_volume_to_raw_gain

__all__ = ["CallbackStreamReader", "StreamingSamplerNode"]


class CallbackStreamReader:
    """Adapt a ``read(start, n) -> f32[ch, n]`` closure to the stream-reader
    protocol (the "network streaming" hook).

    The closure must tolerate windows extending past ``len_frames`` (return
    zero-padded frames there, like :class:`~firewheel_tpu.utils.wav.
    WavStreamReader` does): the prefetch window is read in fixed-size spans
    and the final span reaches past the clip end.
    """

    def __init__(self, read_fn: Callable, num_channels: int, len_frames: int,
                 sample_rate: "int | None" = None):
        """``sample_rate``: the produced audio's native rate, if known —
        a rated reader auto-converts in non-matching streams (see the
        processor).  ``None`` (default) means "produces at the stream
        rate": frames map 1:1 at playback rate 1.0 whatever the stream
        runs at (the pre-rate-conversion behavior — procedural
        generators usually want this)."""
        self._read = read_fn
        self.num_channels = num_channels
        self.len_frames = len_frames
        self.sample_rate = sample_rate

    def read(self, start_frame: int, num_frames: int) -> np.ndarray:
        out = np.asarray(
            self._read(start_frame, num_frames), np.float32
        ).reshape(self.num_channels, num_frames)
        return out


class StreamingSamplerNode(AudioNode):
    debug_name = "streaming_sampler"

    def __init__(
        self,
        reader=None,
        percent_volume: float = 100.0,
        window_secs: float = 2.0,
    ):
        from ..core.formats import as_stream_reader

        self._reader = as_stream_reader(reader)
        self._percent_volume = max(float(percent_volume), 0.0)
        self._raw_gain = float(
            percent_volume_to_raw_gain(np.float32(percent_volume))
        )
        self._window_secs = float(window_secs)
        self._playing = False
        self._rate = 1.0
        # seeks stored in SECONDS; the processor converts at the real
        # stream rate (seeks issued pre-activation stay correct on non-48k
        # streams — see SamplerNode)
        self._seek_seq = 0
        self._seek_secs = 0.0
        # play() is a MESSAGE (see SamplerNode): the seq edge clears the
        # EOF `ended` latch so a repeat play() replays
        self._play_seq = 0
        self._sample_rate = 48000
        self._max_block_frames = 128  # real value adopted at activate
        #: (at_sample, kind, payload) transport commands awaiting their
        #: exact block (play/pause/stop/seek with ``at_sample=``)
        self._scheduled: list[tuple] = []

    # -- control --------------------------------------------------------------
    def set_reader(self, reader):
        """Swap the stream source (a reader, or a path any registered
        stream format opens); playback restarts from frame 0."""
        from ..core.formats import as_stream_reader

        self._reader = as_stream_reader(reader)
        self.stop()

    def play(self, at_sample: int | None = None):
        """Start playback.  ``at_sample``: absolute stream sample whose
        block should start the deck (rides the per-block param timelines,
        like ``SamplerNode.play(at_sample=...)``) — block-accurate
        transport inside chunked dispatches, the primitive gapless music
        transitions build on (``music.MusicPlayer``)."""
        if at_sample is None:
            self._playing = True
            self._play_seq += 1
        else:
            self._scheduled.append((int(at_sample), "play", None))
            self._scheduled.sort(key=lambda e: e[0])

    def pause(self, at_sample: int | None = None):
        if at_sample is None:
            self._playing = False
        else:
            self._scheduled.append((int(at_sample), "pause", None))
            self._scheduled.sort(key=lambda e: e[0])

    def stop(self, at_sample: int | None = None):
        """Stop and rewind to 0.  An in-chunk rewind on a PLAYING deck can
        leave the rest of that chunk silent (the prefetch window covers
        the pre-rewind span; it refills at the next dispatch) — schedule
        rewinds on stopped decks, or alternate decks (MusicPlayer)."""
        if at_sample is None:
            self._playing = False
            self._seek_seq += 1
            self._seek_secs = 0.0
        else:
            self._scheduled.append((int(at_sample), "stop", None))
            self._scheduled.sort(key=lambda e: e[0])

    def set_playhead(self, secs: float, at_sample: int | None = None):
        if at_sample is None:
            self._seek_seq += 1
            self._seek_secs = max(float(secs), 0.0)
        else:
            self._scheduled.append(
                (int(at_sample), "seek", max(float(secs), 0.0))
            )
            self._scheduled.sort(key=lambda e: e[0])

    def cancel_scheduled(self) -> None:
        """Drop every pending ``at_sample=`` command not yet consumed
        by a dispatch."""
        self._scheduled.clear()

    def set_playback_rate(self, rate: float):
        self._rate = float(np.clip(rate, 0.0, 4.0))

    def set_percent_volume(self, percent_volume: float):
        self._raw_gain = float(
            percent_volume_to_raw_gain(np.float32(percent_volume))
        )
        self._percent_volume = max(float(percent_volume), 0.0)

    def raw_gain(self) -> float:
        return self._raw_gain

    def is_playing(self) -> bool:
        return self._playing

    # -- plumbing -------------------------------------------------------------
    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
            updates=True,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        self._sample_rate = int(sample_rate)
        self._max_block_frames = int(max_block_frames)
        return StreamingSamplerProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class StreamingSamplerProcessor(NodeProcessor):
    supports_megakernel = False  # data-dependent playback gathers
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._coeffs = smoother_coeffs(sample_rate, SmootherConfig())
        self._eps = SmootherConfig().settle_epsilon

        self.window_frames = max(
            4 * max_block_frames,
            int(node._window_secs * sample_rate),
        )
        self._window = np.zeros((1, self.window_frames), np.float32)
        self._window_dev = None
        self._window_start = 0
        self._window_valid = False
        # host shadow playhead (frames, float for fractional rates)
        self._est_playhead = 0.0
        self._seen_seek_seq = node._seek_seq
        self.refill_count = 0

    #: scheduled transport commands ride per-block param timelines
    #: (executor.PerBlock) — and the executor passes the dispatch's block
    #: count + start sample so the prefetch shadow clock simulates the
    #: SAME per-block transport the device will apply
    collect_timeline = True

    # -- host-side window management -----------------------------------------
    def _refill(self, start: int):
        reader = self._node._reader
        ch = reader.num_channels
        if self._window.shape[0] != ch:
            self._window = np.zeros((ch, self.window_frames), np.float32)
        self._window[:] = reader.read(start, self.window_frames)
        self._window_dev = jnp.asarray(self._window)
        self._window_start = start
        self._window_valid = True
        self.refill_count += 1

    def collect_params(
        self, blocks=1, start_sample=None, frames=None, consume=True
    ):
        node = self._node
        reader = node._reader
        has_reader = reader is not None

        # clip-native rate: rated readers auto-convert (a 44.1 kHz file
        # plays at native pitch in a 48 kHz stream) and seeks address
        # CLIP time — same contract as SampleResource.sample_rate
        clip_sr = float(
            getattr(reader, "sample_rate", 0) or self.sample_rate
        ) if has_reader else float(self.sample_rate)
        eff_rate = node._rate * clip_sr / self.sample_rate

        k = max(1, int(np.ceil(blocks)))
        f = int(frames or self.max_block_frames)

        # apply immediate seeks to the shadow playhead (seconds → clip frames)
        seek_frame = min(
            max(int(round(node._seek_secs * clip_sr)), 0), 0xFFFFFFFF
        )
        if node._seek_seq != self._seen_seek_seq:
            self._seen_seek_seq = node._seek_seq
            self._est_playhead = float(seek_frame)
            self._window_valid = False

        # -- per-block transport timelines (chunked hot path) ---------------
        # Consume scheduled play/pause/stop/seek commands landing in this
        # dispatch window and build the SAME per-block flags the device
        # will apply — then simulate them on the shadow playhead so the
        # prefetch window stays in lockstep with scheduled transport.
        playing_tl = np.full(k, bool(node._playing and has_reader))
        seq_tl = np.full(k, np.uint32(node._seek_seq), np.uint32)
        pos_tl = np.full(k, np.uint32(seek_frame), np.uint32)
        play_seq_tl = np.full(
            k, np.uint32(node._play_seq & 0xFFFFFFFF), np.uint32
        )
        # sub-block start offset, applied by the kernel at the play-seq
        # trigger block only — scheduled starts are SAMPLE-accurate
        # (music joins and loop periods are exact, not block-rounded)
        offset_tl = np.zeros(k, np.uint32)
        seek_at_block: dict[int, int] = {}
        play_off_at_block: dict[int, int] = {}
        if (
            consume
            and start_sample is not None
            and node._scheduled
        ):
            start = int(start_sample)
            end = start + k * f
            cur_playing = node._playing
            cur_seq = node._seek_seq
            cur_play_seq = node._play_seq
            remaining = []
            for at, kind, payload in node._scheduled:
                if at >= end:
                    remaining.append((at, kind, payload))
                    continue
                b = max(0, (at - start) // f)
                if kind == "play":
                    cur_playing = True
                    cur_play_seq += 1
                    play_seq_tl[b:] = np.uint32(cur_play_seq & 0xFFFFFFFF)
                    off = max(0, int(at) - (start + b * f))
                    offset_tl[b] = np.uint32(min(off, f - 1))
                    play_off_at_block[b] = min(off, f - 1)
                elif kind == "pause":
                    cur_playing = False
                elif kind == "stop":
                    cur_playing = False
                    cur_seq += 1
                    node._seek_secs = 0.0
                    pos_tl[b:] = np.uint32(0)
                    seq_tl[b:] = np.uint32(cur_seq & 0xFFFFFFFF)
                    seek_at_block[b] = 0
                elif kind == "seek":
                    cur_seq += 1
                    node._seek_secs = float(payload)
                    tgt = min(
                        max(int(round(payload * clip_sr)), 0), 0xFFFFFFFF
                    )
                    pos_tl[b:] = np.uint32(tgt)
                    seq_tl[b:] = np.uint32(cur_seq & 0xFFFFFFFF)
                    seek_at_block[b] = tgt
                playing_tl[b:] = cur_playing and has_reader
            node._playing = cur_playing
            node._seek_seq = cur_seq
            node._play_seq = cur_play_seq
            self._seen_seek_seq = cur_seq
            node._scheduled = remaining

        if has_reader:
            span = f * float(k)
            # the whole upcoming dispatch must fit the window (plus an
            # interpolation guard); grow it for large chunked dispatches
            # (a growth is a one-time retrace)
            needed = int(2 * span * max(eff_rate, 1.0)) + 3 * self.max_block_frames
            if needed > self.window_frames:
                self.window_frames = needed
                self._window = np.zeros(
                    (self._window.shape[0], self.window_frames), np.float32
                )
                self._window_valid = False
            need_start = int(self._est_playhead)
            lookahead_end = int(
                self._est_playhead + span * max(eff_rate, 1.0) * 2
            )
            if (
                not self._window_valid
                or need_start < self._window_start
                or lookahead_end > self._window_start + self.window_frames
            ):
                # window begins slightly before the playhead so interpolation
                # never reads behind it
                self._refill(max(0, need_start - self.max_block_frames))
            if consume:
                # advance the shadow clock exactly as the device will: a
                # seek resets it at its block, playing blocks advance it.
                # Clamp at EOF: the device latches `ended` there, and an
                # unbounded shadow playhead would trigger useless (or, for
                # callback readers, failing) refills past the clip forever.
                est = self._est_playhead
                if seek_at_block or play_off_at_block or not playing_tl.all():
                    for b in range(k):
                        if b in seek_at_block:
                            est = float(seek_at_block[b])
                        if playing_tl[b]:
                            est += (
                                f - play_off_at_block.get(b, 0)
                            ) * eff_rate
                elif playing_tl.any():
                    est += span * eff_rate
                self._est_playhead = min(est, float(reader.len_frames))
        if self._window_dev is None:
            self._window_dev = jnp.asarray(self._window)

        out = {
            "raw_gain": np.float32(node.raw_gain()),
            "rate": np.float32(eff_rate),
            "window": self._window_dev,
            "window_start": np.uint32(self._window_start),
            "len_frames": np.uint32(
                reader.len_frames if has_reader else 0
            ),
        }
        if start_sample is None:
            # unpacked paths (BatchRenderer, direct kernels): plain
            # scalars; scheduled commands stay queued for a
            # timeline-capable dispatch
            out["playing"] = np.asarray(
                bool(node._playing and has_reader), bool
            )
            out["seek_seq"] = np.uint32(node._seek_seq)
            out["seek_pos"] = np.uint32(seek_frame)
            out["play_seq"] = np.uint32(node._play_seq & 0xFFFFFFFF)
            out["start_offset"] = np.uint32(0)
            return out

        from ..executor import PerBlock

        out["playing"] = PerBlock(playing_tl)
        out["seek_seq"] = PerBlock(seq_tl)
        out["seek_pos"] = PerBlock(pos_tl)
        out["play_seq"] = PerBlock(play_seq_tl)
        out["start_offset"] = PerBlock(offset_tl)
        return out

    def init_state(self):
        return {
            "gain": smoother_init(np.float32(self._node.raw_gain())),
            "playhead": jnp.zeros((), jnp.uint32),
            "frac": jnp.zeros((), jnp.float32),
            "ended": jnp.zeros((), bool),
            "prev_playing": jnp.zeros((), bool),
            "seek_seq": jnp.zeros((), jnp.uint32),
            "play_seq": jnp.zeros((), jnp.uint32),
            "finish_count": jnp.zeros((), jnp.uint32),
        }

    def resync_from_state(self, state) -> None:
        node = self._node
        node._seek_seq = int(np.asarray(state["seek_seq"]).max())
        node._play_seq = int(np.asarray(state["play_seq"]).max())
        # adopt the restored device playhead into the prefetch shadow
        # clock (and swallow the seq edge) — otherwise the next collect
        # would treat the restored seq as a fresh seek, rewind the window
        # to the stale host seek target, and the deck would render
        # silence from a window that no longer covers the playhead
        self._seen_seek_seq = node._seek_seq
        self._est_playhead = float(
            np.asarray(state["playhead"]).max()
        ) + float(np.asarray(state["frac"]).max())
        self._window_valid = False

    def event_counters(self):
        """``finished``: the stream reached EOF (core/events.py)."""
        return {"finished": "finish_count"}

    def signature_key(self):
        """Compile-cache identity (never pooled — ``group_key`` stays
        ``None``: the host-side prefetch shadow clock is per-instance).
        The kernel is pure over (params, state): the window rides
        ``collect_params`` and its SHAPE is a packed-cache key, so any
        constant token is a sound identity here."""
        return "streaming-sampler"

    def kernel(self, params, state, inputs, in_mask, info):
        frames = self.max_block_frames if inputs.ndim < 2 else inputs.shape[-1]
        n_out = self.num_outputs
        window = params["window"]
        w_ch, w_len = window.shape

        playhead = state["playhead"]
        frac = state["frac"]
        ended = state["ended"]

        seek_new = params["seek_seq"] != state["seek_seq"]
        playhead = jnp.where(seek_new, params["seek_pos"], playhead)
        frac = jnp.where(seek_new, jnp.float32(0.0), frac)
        ended = jnp.where(seek_new, False, ended)

        rising = params["playing"] & ~state["prev_playing"]
        trigger = params["play_seq"] != state["play_seq"]
        ended = jnp.where(rising | trigger, False, ended)
        playing = params["playing"] & ~ended

        ramp, gain_processed, smoothing = smoother_set_and_process(
            state["gain"], params["raw_gain"], frames, self._coeffs, self._eps
        )
        gain_state = jax.tree.map(
            lambda new, old: jnp.where(playing, new, old),
            gain_processed,
            state["gain"],
        )
        muted = ~smoothing & (ramp[0] < jnp.float32(0.00001))

        rate = params["rate"]
        # sub-block start offset: a scheduled play beginning mid-block
        # outputs silence for the first `start_off` samples and advances
        # only the remainder — sample-accurate starts (music.MusicPlayer)
        start_off = jnp.where(
            trigger, params["start_offset"], jnp.uint32(0)
        ).astype(jnp.float32)
        # int iota + cast (Mosaic: tpu.iota is integer-only)
        k = jnp.arange(frames, dtype=jnp.int32).astype(jnp.float32)
        off = jnp.maximum(frac + (k - start_off) * rate, 0.0)
        off_int = jnp.floor(off).astype(jnp.uint32)
        interp_w = off - jnp.floor(off)

        pos = playhead + off_int  # absolute frames
        rel = pos.astype(jnp.int32) - params["window_start"].astype(jnp.int32)
        in_window = (rel >= 0) & (rel < w_len - 1)
        in_clip = pos < params["len_frames"]
        valid = in_window & in_clip & (k >= start_off)
        idx0 = jnp.clip(rel, 0, w_len - 1)
        idx1 = jnp.clip(rel + 1, 0, w_len - 1)

        s0 = window[:, idx0]
        s1 = window[:, idx1]
        out_rows = s0 + (s1 - s0) * interp_w[None, :]
        out_rows = jnp.where(valid[None, :], out_rows, 0.0)

        adv = frac + (jnp.float32(frames) - start_off) * rate
        adv_int = jnp.floor(adv)
        new_playhead = playhead + adv_int.astype(jnp.uint32)
        new_frac = adv - adv_int
        finished = new_playhead >= params["len_frames"]
        new_ended = jnp.where(playing & finished, True, ended)
        # event counter (event_counters()): fires at the EOF latch block
        new_finish_count = state["finish_count"] + jnp.where(
            playing & finished, jnp.uint32(1), jnp.uint32(0)
        )

        silent = ~playing | muted
        # DELIBERATE divergence from SamplerNode (which freezes playback
        # while muted, sampler.rs:436-443): a muted STREAMING voice keeps
        # consuming, because the host-side prefetch shadow clock
        # (collect_params(blocks=...)) advances in lockstep with this
        # playhead and cannot observe the device-side smoother's muted
        # state — freezing here would desync the window.  Callers who
        # want pause-on-mute semantics should pause() (which the host
        # does see).
        new_playhead = jnp.where(playing, new_playhead, playhead)
        new_frac = jnp.where(playing, new_frac, frac)

        gained = out_rows * ramp[None, :]
        rows, mask_rows = [], []
        for ch in range(n_out):
            if ch < w_ch:
                rows.append(gained[ch])
                mask_rows.append(silent)
            elif n_out == 2 and w_ch == 1:
                rows.append(gained[0])
                mask_rows.append(silent)
            else:
                rows.append(jnp.zeros((frames,), jnp.float32))
                mask_rows.append(jnp.asarray(True))
        out = jnp.stack(rows)
        out = gate(out, silent)
        out_mask = jnp.stack(mask_rows)

        new_state = {
            "gain": gain_state,
            "playhead": new_playhead,
            "frac": new_frac,
            "ended": new_ended,
            "prev_playing": params["playing"],
            "seek_seq": jnp.asarray(params["seek_seq"], jnp.uint32),
            "play_seq": jnp.asarray(params["play_seq"], jnp.uint32),
            "finish_count": new_finish_count,
        }
        return out, new_state, out_mask
