"""Sum node: N→M channel summation (N must be a multiple of M).

Reference: ``crates/firewheel-graph/src/basic_nodes/sum.rs:3-142``.
``out[ch] = sum_k in[k*M + ch]``, accumulated in the reference's left-to-right
order for float32 reproducibility.  Mask semantics preserved exactly:
all-silent → silence + all-silent mask; N==M → copy with mask passthrough;
summing path → out mask stays NONE_SILENT (the reference never sets it there).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.node import (
    gate,
    AudioNode,
    AudioNodeInfo,
    NodeActivationError,
    NodeProcessor,
    MAX_PORTS,
)

__all__ = ["SumNode", "SumProcessor"]


class SumProcessor(NodeProcessor):
    def __init__(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self.num_in_ports = num_inputs // num_outputs

    def group_key(self):
        return ()

    def kernel(self, params, state, inputs, in_mask, info):
        m = self.num_outputs
        n_ports = self.num_in_ports
        all_silent = jnp.all(in_mask)

        if n_ports == 1:
            out = inputs
            base_mask = in_mask
        else:
            # Left-to-right accumulation matches sum.rs:67-133 rounding order.
            out = inputs[0:m]
            for k in range(1, n_ports):
                out = out + inputs[k * m : (k + 1) * m]
            base_mask = jnp.zeros((m,), bool)

        out = gate(out, all_silent)
        # OR, not select (Mosaic-safe; see volume.py)
        out_mask = all_silent | base_mask
        return out, state, out_mask


class SumNode(AudioNode):

    #: silence in => silence out, no self-generated signal: prunable
    #: by the dormancy pass (graph.prune_dormant)
    silence_transparent = True
    debug_name = "sum"

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_inputs=1,
            num_max_supported_inputs=MAX_PORTS,
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_outputs == 0 or num_inputs % num_outputs != 0:
            raise NodeActivationError(
                "The number of inputs on a SumNode must be a multiple of the "
                f"number of outputs. Got num_inputs: {num_inputs}, "
                f"num_outputs: {num_outputs}"
            )
        return SumProcessor(sample_rate, max_block_frames, num_inputs, num_outputs)
