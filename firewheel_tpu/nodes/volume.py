"""Volume node: smoothed gain multiply with silence/mute short-circuits.

Reference: ``crates/firewheel-graph/src/basic_nodes/volume.rs:8-151``.
Semantics preserved exactly, but as branch-free selects:

* all input channels silent → reset the smoother to the target gain, output
  silence (volume.rs:94-100);
* settled and gain < 1e-5 → muted, output silence (volume.rs:104-107);
* otherwise → ``out = in * gain_ramp`` and the out mask copies the in mask
  (volume.rs:109-149).

The gain ramp is the closed-form smoother (see ``core/smoother.py``); the
reference's stereo/generic loop split is irrelevant here — the multiply is
one fused ``[channels, frames]`` VPU op either way.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)
from ..core.smoother import (
    SmootherConfig,
    smoother_coeffs,
    smoother_init,
    smoother_reset,
    smoother_set_and_process,
)
from ..core.units import percent_volume_to_raw_gain

__all__ = ["VolumeNode", "VolumeProcessor"]


class VolumeProcessor(NodeProcessor):
    #: per-block param timelines: scheduled gain changes land on their
    #: exact 128-frame block inside a K-block chunk dispatch (the
    #: reference's per-block atomic load, volume.rs:92)
    collect_timeline = True

    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._coeffs = smoother_coeffs(sample_rate, SmootherConfig())
        self._eps = SmootherConfig().settle_epsilon

    def init_state(self):
        return {"gain": smoother_init(np.float32(self._node.raw_gain()))}

    def collect_params(
        self, blocks=1, start_sample=None, frames=None, consume=True
    ):
        from ..executor import PerBlock

        node = self._node
        if start_sample is None:
            # unpacked paths (BatchRenderer, direct kernels): plain scalar
            return {"raw_gain": np.float32(node.raw_gain())}
        f = int(frames or self.max_block_frames)
        timeline = np.full(max(1, int(blocks)), node.raw_gain(), np.float32)
        if consume and node._scheduled:
            base = node._raw_gain
            base_pct = node._percent_volume
            remaining = []
            for at, g, pct in node._scheduled:
                b = (at - int(start_sample)) // f
                if b >= blocks:
                    remaining.append((at, g, pct))
                    continue
                b = max(0, int(b))
                timeline[b:] = g
                base, base_pct = g, pct
            node._raw_gain = base
            node._percent_volume = base_pct
            node._scheduled = remaining
        return {"raw_gain": PerBlock(timeline)}

    def group_key(self):
        return ()

    def kernel(self, params, state, inputs, in_mask, info):
        frames = inputs.shape[-1]
        raw_gain = params["raw_gain"]

        ramp, st_processed, smoothing = smoother_set_and_process(
            state["gain"], raw_gain, frames, self._coeffs, self._eps
        )

        all_silent = jnp.all(in_mask)
        muted = jnp.logical_and(~smoothing, ramp[0] < jnp.float32(0.00001))
        silence_out = jnp.logical_or(all_silent, muted)

        out = inputs * ramp[None, :]
        out = gate(out, silence_out)
        # OR, not select: i1-operand selects hit an unsupported Mosaic
        # truncation in the Pallas megakernel; p | x == where(p, True, x)
        out_mask = silence_out | in_mask

        # all-silent resets the filter (volume.rs:95-97); muted does not.
        st_reset = smoother_reset(st_processed, raw_gain)
        new_gain_state = jax.tree.map(
            lambda r, p: jnp.where(all_silent, r, p), st_reset, st_processed
        )
        return out, {"gain": new_gain_state}, out_mask


class VolumeNode(AudioNode):

    #: silence in => silence out, no self-generated signal: prunable
    #: by the dormancy pass (graph.prune_dormant)
    silence_transparent = True
    debug_name = "volume"

    def __init__(self, percent_volume: float):
        self._percent_volume = max(float(percent_volume), 0.0)
        self._raw_gain = float(percent_volume_to_raw_gain(np.float32(percent_volume)))
        #: (at_sample, raw_gain) pairs awaiting their block (sorted)
        self._scheduled: list[tuple[int, float]] = []

    def percent_volume(self) -> float:
        return self._percent_volume

    def cancel_scheduled(self) -> None:
        """Drop every pending ``at_sample=`` volume point not yet
        consumed by a dispatch (fade cancellation)."""
        self._scheduled.clear()

    def set_percent_volume(self, percent_volume: float, at_sample: int | None = None):
        """Live control (volume.rs:28-34).

        ``at_sample``: absolute stream sample at which the change should
        land — it applies on that sample's 128-frame block boundary even
        inside a chunked (K-blocks-per-dispatch) stream, instead of at the
        next chunk boundary.  ``None`` applies at the next dispatch and
        clears any scheduled changes."""
        g = float(percent_volume_to_raw_gain(np.float32(percent_volume)))
        pct = max(float(percent_volume), 0.0)
        if at_sample is None:
            self._percent_volume = pct
            self._raw_gain = g
            self._scheduled.clear()
        else:
            # percent_volume() must keep reporting the AUDIBLE value until
            # the scheduled change lands (the timeline consumption updates
            # both fields together)
            self._scheduled.append((int(at_sample), g, pct))
            self._scheduled.sort(key=lambda p: p[0])

    def raw_gain(self) -> float:
        return self._raw_gain

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_inputs=1,
            num_max_supported_inputs=MAX_PORTS,
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "The number of inputs on a VolumeNode node must equal the "
                f"number of outputs. Got num_inputs: {num_inputs}, "
                f"num_outputs: {num_outputs}"
            )
        return VolumeProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
