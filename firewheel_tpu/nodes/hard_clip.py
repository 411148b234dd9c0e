"""Hard clip node: clamp samples to ±threshold.

Reference: ``crates/firewheel-graph/src/basic_nodes/hard_clip.rs:3-101`` —
``out = min(max(in, -t), t)`` with ``t = db_to_gain_clamped_neg_100_db(db)``;
silent input channels stay silent and the out mask copies the in mask.
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
from ..core.units import db_to_gain_clamped_neg_100_db

__all__ = ["HardClipNode", "HardClipProcessor"]


class HardClipProcessor(NodeProcessor):
    def __init__(self, threshold_gain, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self.threshold_gain = np.float32(threshold_gain)

    def collect_params(self):
        return {"threshold": np.float32(self.threshold_gain)}

    def group_key(self):
        return ()

    def init_state(self):
        # clipped-sample counter (core/events.py): games surface "output
        # is clipping" warnings without fetching any audio.  int32, not
        # uint32: Mosaic lowers f32->i32 casts and signed adds, but has
        # no unsigned-int reduction/cast lowering — the host event diff
        # reads the bit pattern as uint32 either way (wrap-safe)
        return {"clip_count": jnp.zeros((), jnp.int32)}

    def event_counters(self):
        """``clipped``: number of samples that exceeded the threshold.

        Counts on the XLA lowering; under a Mosaic (megakernel/hybrid)
        trace the counter freezes — Mosaic cannot lower the full
        reduction-to-scalar this needs (layout assert), and the
        guaranteed-fusion paths trade clip observability for fusion.
        Host polls simply see no new clip events from Mosaic-rendered
        graphs."""
        return {"clipped": "clip_count"}

    def kernel(self, params, state, inputs, in_mask, info):
        t = params["threshold"]
        out = jnp.maximum(jnp.minimum(inputs, t), -t)
        # count strictly-over-threshold samples on audible channels only
        # (flagged-silent inputs may carry unrendered garbage).  The
        # reduction runs in f32 — Mosaic lowers neither unsigned-int
        # reductions nor i1-vector reshapes, while f32 reduce is the
        # native VPU path; a block contributes ≤ 64×frames ≪ 2^24 so the
        # f32 count and the uint32 cast are both exact
        from ..core import trace_mode

        if trace_mode.MOSAIC:
            # no Mosaic lowering for the reduction-to-scalar (layout
            # assert); the counter freezes under megakernel/hybrid
            # traces — see event_counters()
            new_state = {"clip_count": state["clip_count"]}
        else:
            over_f = jnp.where(
                jnp.abs(inputs) > t, jnp.float32(1.0), jnp.float32(0.0)
            )
            audible = jnp.where(
                in_mask, jnp.float32(0.0), jnp.float32(1.0)
            )
            # broadcast in f32, NOT bool: Mosaic's minor-dim insertion
            # only lowers for 32-bit types (i1 [C] -> [C,1] fails)
            clipped = jnp.sum(over_f * audible[:, None])
            new_state = {
                "clip_count": state["clip_count"]
                + clipped.astype(jnp.int32)
            }
        # Silent channels are zero-filled (hard_clip.rs:84-87); clip(0)=0 when
        # t >= 0, but t can be 0 exactly — -0.0 vs 0.0 is tolerable.
        return out, new_state, in_mask


class HardClipNode(AudioNode):

    #: silence in => silence out, no self-generated signal: prunable
    #: by the dormancy pass (graph.prune_dormant)
    silence_transparent = True
    debug_name = "hard_clip"

    def __init__(self, threshold_db: float):
        self.threshold_gain = float(
            db_to_gain_clamped_neg_100_db(np.float32(threshold_db))
        )

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
                "The number of inputs on a HardClip node must equal the "
                f"number of outputs. Got num_inputs: {num_inputs}, "
                f"num_outputs: {num_outputs}"
            )
        return HardClipProcessor(
            self.threshold_gain, sample_rate, max_block_frames, num_inputs, num_outputs
        )
