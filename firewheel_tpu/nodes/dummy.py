"""Dummy (no-op) node — placeholder for tests and port topologies.

Reference: ``crates/firewheel-graph/src/basic_nodes/dummy.rs:5-48``.  The
reference's processor writes nothing, leaving stale arena data in its output
buffers (unspecified behavior); here the kernel deterministically outputs
zeros.  The returned silence mask is NONE_SILENT, matching the reference's
default-initialized out mask (processor.rs:230-244).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.node import AudioNode, AudioNodeInfo, NodeProcessor, MAX_PORTS

__all__ = ["DummyAudioNode", "DummyProcessor"]


class DummyProcessor(NodeProcessor):
    def group_key(self):
        return ()

    def kernel(self, params, state, inputs, in_mask, info):
        outputs = jnp.zeros((self.num_outputs, inputs.shape[-1]), jnp.float32)
        out_mask = jnp.zeros((self.num_outputs,), bool)
        return outputs, state, out_mask


class DummyAudioNode(AudioNode):
    debug_name = "dummy"

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_max_supported_inputs=MAX_PORTS,
            num_max_supported_outputs=MAX_PORTS,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        return DummyProcessor(sample_rate, max_block_frames, num_inputs, num_outputs)
