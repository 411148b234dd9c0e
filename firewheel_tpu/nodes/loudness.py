"""EBU R128 / ITU-R BS.1770 loudness meter node.

Game/broadcast mixes are delivered to LUFS targets (e.g. −23 LUFS EBU,
−16 LUFS mobile); this node measures them in-graph.  Kernel side it runs
the K-weighting pre-filter (two biquads via the parallel-scan IIR,
``ops/iir.py``) and integrates channel-weighted mean squares into a ring of
100 ms gating blocks.  Host side, :meth:`LoudnessMeterNode.read` turns the
ring into momentary (400 ms) / short-term (3 s) loudness, and
:class:`IntegratedLoudness` applies the R128 two-stage gate (−70 LUFS
absolute, −10 LU relative) to a stream of gating-block readings.

Passthrough like DbMeter: wire it in-line (outputs mirror inputs) or as a
pure sink (0 outputs).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.node import (
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)
from ..ops.iir import biquad_scan
from ..ops.loudness import k_weighting_coeffs, lufs_from_mean_square

__all__ = ["LoudnessMeterNode", "LoudnessMeterProcessor", "IntegratedLoudness"]

# R128 gating blocks: 400 ms windows with 75% overlap -> one block per 100 ms
_GATE_HOP_SECS = 0.1
_MOMENTARY_BLOCKS = 4   # 400 ms
_SHORT_TERM_BLOCKS = 30  # 3 s


class LoudnessMeterProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self.hop_frames = max(1, int(round(_GATE_HOP_SECS * sample_rate)))
        shelf, hp = k_weighting_coeffs(sample_rate)
        self._shelf = shelf
        self._hp = hp
        # BS.1770 channel weights: 1.0 for L/R/C, 1.41 for L_s/R_s.  With no
        # layout metadata all channels weigh 1.0 (stereo/mono correct);
        # surround buses pass explicit weights via the node (BS.1770-4 §3.4)
        if node._channel_weights is not None:
            w = np.asarray(node._channel_weights, np.float32)
            if w.shape != (num_inputs,):
                raise NodeActivationError(
                    f"channel_weights has {w.shape[0] if w.ndim else 0} "
                    f"entries but the node was activated with {num_inputs} "
                    "inputs"
                )
            self._weights = w
        else:
            self._weights = np.ones((num_inputs,), np.float32)

    def group_key(self):
        # weights are trace-time constants: only identically-weighted
        # meters may pool into one vmapped kernel
        return (tuple(float(w) for w in self._weights),)

    def init_state(self):
        ch = self.num_inputs
        return {
            "shelf_z": jnp.zeros((ch, 2), jnp.float32),
            "hp_z": jnp.zeros((ch, 2), jnp.float32),
            # ring of per-hop energy sums (weighted, channel-summed) and
            # sample counts; index advances every hop_frames samples
            "ring": jnp.zeros((_SHORT_TERM_BLOCKS + 1,), jnp.float32),
            "counts": jnp.zeros((_SHORT_TERM_BLOCKS + 1,), jnp.uint32),
            "pos": jnp.zeros((), jnp.uint32),      # sample position in hop
            "idx": jnp.zeros((), jnp.uint32),      # ring write index
        }

    def collect_params(self):
        return {}

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1]
        # K-weighting
        z1 = (state["shelf_z"][:, 0], state["shelf_z"][:, 1])
        y, z1o = biquad_scan(inputs, z1, self._shelf)
        z2 = (state["hp_z"][:, 0], state["hp_z"][:, 1])
        y, z2o = biquad_scan(y, z2, self._hp)

        # weighted channel-summed instantaneous power
        power = jnp.sum(
            jnp.asarray(self._weights)[:, None] * y * y, axis=0
        )  # [F]

        # sample-exact gating hops: each sample maps to a relative hop
        # index; slots entered for the FIRST time this block are cleared
        # (they hold data from ring_len hops ago) BEFORE power accumulates
        k = jnp.arange(frames, dtype=jnp.uint32)
        hop_of = (state["pos"] + k) // jnp.uint32(self.hop_frames)
        ring_len = state["ring"].shape[0]
        # relative hops to clear: every slot written this block beyond the
        # current one, PLUS the slot the write head lands on afterwards —
        # when a block ends exactly on a hop boundary, the next block's
        # first write enters a slot no other path would have cleared
        total = state["pos"] + jnp.uint32(frames)
        hops_advanced = total // jnp.uint32(self.hop_frames)

        d = jnp.arange(ring_len, dtype=jnp.uint32)
        fresh = (state["idx"] + jnp.uint32(1) + d) % jnp.uint32(ring_len)
        live = d < hops_advanced
        ring = state["ring"].at[fresh].set(
            jnp.where(live, 0.0, state["ring"][fresh])
        )
        counts = state["counts"].at[fresh].set(
            jnp.where(live, jnp.uint32(0), state["counts"][fresh])
        )

        slot = (state["idx"] + hop_of) % jnp.uint32(ring_len)
        ring = ring.at[slot].add(power)
        counts = counts.at[slot].add(jnp.uint32(1))

        new_pos = total % jnp.uint32(self.hop_frames)
        new_idx = (state["idx"] + hops_advanced) % jnp.uint32(ring_len)

        if self.num_outputs:
            out = inputs
            out_mask = in_mask
        else:
            out = jnp.zeros((0, frames), jnp.float32)
            out_mask = jnp.zeros((0,), bool)
        return (
            out,
            {
                "shelf_z": jnp.stack(z1o, axis=-1),
                "hp_z": jnp.stack(z2o, axis=-1),
                "ring": ring,
                "counts": counts,
                "pos": new_pos,
                "idx": new_idx,
            },
            out_mask,
        )


def _window_lufs(ring, counts, idx, blocks):
    ring = np.asarray(ring, np.float64)
    counts = np.asarray(counts, np.float64)
    n = ring.shape[0]
    take = [(int(idx) - d) % n for d in range(blocks)]
    e, c = ring[take].sum(), counts[take].sum()
    if c < 1:
        return -np.inf
    return lufs_from_mean_square(e / c)


class LoudnessMeterNode(AudioNode):
    debug_name = "loudness_meter"

    def __init__(self, channel_weights=None):
        """``channel_weights``: optional per-input BS.1770 weights (e.g.
        ``[1, 1, 1, 1, 1.41, 1.41]`` for 5.1 L/R/C/LFE-excluded layouts —
        note the standard *omits* the LFE channel entirely: wire it past
        the meter or pass weight 0.0).  ``None`` weighs every channel 1.0."""
        self._channel_weights = (
            None if channel_weights is None else list(channel_weights)
        )

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(1, MAX_PORTS, 0, MAX_PORTS)

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_outputs not in (0, num_inputs):
            raise NodeActivationError(
                "LoudnessMeterNode passes audio through: outputs must be 0 "
                f"or equal inputs ({num_inputs}); got {num_outputs}"
            )
        return LoudnessMeterProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )

    @staticmethod
    def read(meter_state) -> dict:
        """Interpret the state pytree (``ctx.node_state``/
        ``GraphProcessor.node_state``) → momentary (400 ms) and short-term
        (3 s) loudness in LUFS, plus the newest complete 100 ms gating
        block for :class:`IntegratedLoudness`."""
        idx = int(np.asarray(meter_state["idx"]))
        ring, counts = meter_state["ring"], meter_state["counts"]
        # idx slot is the in-progress hop; completed hops end at idx-1
        return {
            "momentary_lufs": _window_lufs(ring, counts, idx - 1, _MOMENTARY_BLOCKS),
            "short_term_lufs": _window_lufs(ring, counts, idx - 1, _SHORT_TERM_BLOCKS),
            "gating_block_lufs": _window_lufs(ring, counts, idx - 1, _MOMENTARY_BLOCKS),
        }


class IntegratedLoudness:
    """Host-side R128 integrated loudness with the two-stage gate.

    Feed it one ``gating_block_lufs`` reading per 100 ms (e.g. from
    ``LoudnessMeterNode.read`` polled in the game's update loop);
    :meth:`value` applies the −70 LUFS absolute and −10 LU relative gates.
    """

    def __init__(self):
        self._blocks: list[float] = []

    def push(self, gating_block_lufs: float):
        if np.isfinite(gating_block_lufs):
            self._blocks.append(float(gating_block_lufs))

    def value(self) -> float:
        if not self._blocks:
            return -np.inf
        lk = np.asarray(self._blocks)
        power = 10.0 ** ((lk + 0.691) / 10.0)
        mask = lk > -70.0
        if not mask.any():
            return -np.inf
        ungated = -0.691 + 10.0 * np.log10(power[mask].mean())
        mask &= lk > ungated - 10.0
        if not mask.any():
            return -np.inf
        return float(-0.691 + 10.0 * np.log10(power[mask].mean()))
