"""Generator nodes: noise sources and an audio-rate LFO.

Beyond the reference's shipped nodes but squarely in its design family
(``DESIGN_DOC.md:11-28`` effect/utility scope; BeepTest is the reference's
only generator, ``beep_test.rs``).  TPU shapes:

* **NoiseNode** draws white noise from the counter-based PRNG keyed on
  (seed, block start sample) — STATELESS randomness: re-rendering the
  stream with the same block partitioning (checkpoint/resume always does)
  reproduces it bit-exactly.  Pink noise filters the same white stream
  through the Paul Kellet 3-pole approximation carried as scan state.
* **LFONode** accumulates uint32 fixed-point phase exactly like BeepTest
  (2^32 == one cycle, wraparound is free) and shapes it into
  sine/triangle/saw/square, scaled to ``offset + depth * wave``.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    broadcast_flag,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)
from ..core.units import db_to_gain
from ..ops.dynamics import sample_scan
from .beep_test import phase_inc_fixed

__all__ = ["NoiseNode", "NoiseProcessor", "LFONode", "LFOProcessor"]

# default seeds: construction-order counter — deterministic per program run,
# but two default NoiseNodes never share a stream (identical seeds would sum
# coherently, +6 dB mono-correlated)
import itertools as _itertools

_SEED_COUNTER = _itertools.count(1)


class NoiseProcessor(NodeProcessor):
    # threefry key seeding does not batch under the megakernel's tile vmap
    # (PRNGKey receives the uint32 tile vector — probed on-chip, round 3);
    # noise rides XLA islands in the hybrid renderer instead
    supports_megakernel = False

    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node

    def group_key(self):
        # color is structural (traced); everything else rides in params
        return (self._node._color,)

    def init_state(self):
        # Kellet pink filter taps (3 one-poles), per channel
        return {"pink": jnp.zeros((self.num_outputs, 3), jnp.float32)}

    def collect_params(self):
        n = self._node
        return {
            "gain": np.float32(db_to_gain(np.float32(n._gain_db))),
            "enabled": np.asarray(bool(n._enabled), bool),
            "seed": np.uint32(n._seed),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        ch = self.num_outputs
        frames = inputs.shape[-1] if inputs.ndim else self.max_block_frames
        # stateless bits keyed on (seed, block start sample): the same
        # stream region re-renders bit-exactly under the same block
        # partitioning (checkpoint/resume preserves block boundaries).
        # NOTE (perf, resolved round 3): threefry is integer-rotate/xor
        # heavy inside the chunk scan body — the op class CLAUDE.md
        # flags as a potential TPU loop-compilation pathology.  Measured
        # on-chip: +0.8% steady-state, no compile blow-up (the round-2
        # 26x case was LOOP-CARRIED integer shifts; threefry's integer
        # work is data-parallel within the body).  See docs/PERF.md
        # "NoiseNode in the chunk scan".
        key = jax.random.fold_in(
            jax.random.PRNGKey(params["seed"]), info.stream_sample
        )
        white = jax.random.uniform(
            key, (ch, frames), jnp.float32, minval=-1.0, maxval=1.0
        )

        if self._node._color != "pink":
            noise = white * params["gain"]
            y = gate(noise, ~params["enabled"])
            out_mask = broadcast_flag(~params["enabled"], (ch,))
            return y, {"pink": state["pink"]}, out_mask

        def pink_step(z, w):
            # Paul Kellet's "economy" 3-pole pink approximation
            b0 = 0.99765 * z[:, 0] + w * 0.0990460
            b1 = 0.96300 * z[:, 1] + w * 0.2965164
            b2 = 0.57000 * z[:, 2] + w * 1.0526913
            y = (b0 + b1 + b2 + w * 0.1848) * 0.25
            return jnp.stack([b0, b1, b2], axis=-1), y

        pink_state, pink = sample_scan(pink_step, state["pink"], white)

        noise = pink * params["gain"]
        y = gate(noise, ~params["enabled"])
        out_mask = broadcast_flag(~params["enabled"], (ch,))
        return y, {"pink": pink_state}, out_mask


class NoiseNode(AudioNode):
    """White/pink noise generator with deterministic, seekable output."""

    debug_name = "noise"

    def __init__(
        self,
        color: str = "white",
        gain_db: float = -18.0,
        enabled: bool = True,
        seed: int | None = None,
    ):
        """``color`` is structural (it decides whether the pink filter is
        traced at all) — to change it, re-add the node.  ``seed`` defaults
        to a construction-order counter so independent default nodes are
        decorrelated; pass one explicitly for reproducible content."""
        assert color in ("white", "pink"), color
        self._color = color
        self._gain_db = float(gain_db)
        self._enabled = bool(enabled)
        self._seed = (
            next(_SEED_COUNTER) if seed is None else int(seed)
        ) & 0xFFFFFFFF

    def set_enabled(self, v: bool):
        self._enabled = bool(v)

    def set_gain_db(self, v: float):
        self._gain_db = float(v)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(0, 0, 1, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        return NoiseProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class LFOShape:
    SINE = "sine"
    TRIANGLE = "triangle"
    SAW = "saw"
    SQUARE = "square"


class LFOProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node

    def group_key(self):
        return ()

    def init_state(self):
        return {"phase": jnp.zeros((), jnp.uint32)}

    def collect_params(self):
        n = self._node
        return {
            "inc": np.uint32(phase_inc_fixed(n._freq_hz, self.sample_rate)),
            "depth": np.float32(n._depth),
            "offset": np.float32(n._offset),
            "shape": np.uint32(
                [LFOShape.SINE, LFOShape.TRIANGLE, LFOShape.SAW,
                 LFOShape.SQUARE].index(n._shape)
            ),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1] if inputs.ndim else self.max_block_frames
        k = jnp.arange(frames, dtype=jnp.uint32)
        phases_q = state["phase"] + k * params["inc"]
        # int32 bitcast: phase in [-0.5, 0.5) cycles (sine is 2pi-periodic;
        # the same Mosaic-safe conversion as beep_test)
        ph = (
            jax.lax.bitcast_convert_type(phases_q, jnp.int32).astype(
                jnp.float32
            )
            * jnp.float32(2.0**-32)
        )
        two_pi = jnp.float32(2.0 * np.pi)
        sine = jnp.sin(ph * two_pi)
        tri = 1.0 - 4.0 * jnp.abs(ph)  # ph in [-.5,.5): 1 at 0, -1 at +-.5
        saw = 2.0 * ph
        square = jnp.where(jnp.abs(ph) < 0.25, 1.0, -1.0)
        wave = jnp.select(
            [
                params["shape"] == 0,
                params["shape"] == 1,
                params["shape"] == 2,
            ],
            [sine, tri, saw],
            square,
        )
        out = params["offset"] + params["depth"] * wave
        y = jnp.broadcast_to(out, (self.num_outputs, frames))
        new_phase = state["phase"] + jnp.uint32(frames) * params["inc"]
        out_mask = jnp.zeros((self.num_outputs,), bool)
        return y, {"phase": new_phase}, out_mask


class LFONode(AudioNode):
    """Audio-rate low-frequency oscillator: ``offset + depth * wave``.

    Wire it into any audio input, or read it back per block for control-rate
    modulation of node params.
    """

    debug_name = "lfo"

    def __init__(
        self,
        shape: str = LFOShape.SINE,
        freq_hz: float = 1.0,
        depth: float = 1.0,
        offset: float = 0.0,
    ):
        assert shape in (
            LFOShape.SINE, LFOShape.TRIANGLE, LFOShape.SAW, LFOShape.SQUARE
        ), shape
        self._shape = shape
        self._freq_hz = float(freq_hz)
        self._depth = float(depth)
        self._offset = float(offset)

    def set_freq_hz(self, v: float):
        self._freq_hz = float(v)

    def set_depth(self, v: float):
        self._depth = float(v)

    def set_offset(self, v: float):
        self._offset = float(v)

    def set_shape(self, shape: str):
        assert shape in (
            LFOShape.SINE, LFOShape.TRIANGLE, LFOShape.SAW, LFOShape.SQUARE
        ), shape
        self._shape = shape

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(0, 0, 1, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        return LFOProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
