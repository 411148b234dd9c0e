"""Delay nodes: sample-accurate delay compensation and feedback echo.

Reference scope: "echo" and "delay compensation" (``DESIGN_DOC.md:17-18``,
unimplemented there).

* :class:`DelayCompNode` — a pure N-frame delay (latency alignment).
* :class:`EchoNode` — feedback echo ``y = dry·x + wet·e``,
  ``e[n] = x[n-D] + fb·e[n-D]``, with the delay line as rolled state.
  The echo delay must be ≥ the engine block size (in-block feedback would
  be a sequential recurrence; echoes shorter than ~21 ms at the default
  block are flutter effects outside this node's scope).

Delay times are fixed at activation (they size the state buffers — static
shapes); feedback and mix are live params.
"""

from __future__ import annotations

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
from ..ops.delay import comb_init, delay_init, delay_step

__all__ = ["DelayCompNode", "DelayCompProcessor", "EchoNode", "EchoProcessor"]


class DelayCompProcessor(NodeProcessor):
    def __init__(self, delay_frames, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self.delay_frames = delay_frames

    def group_key(self):
        return (self.delay_frames,)

    def init_state(self):
        return {"buf": delay_init(self.num_inputs, self.delay_frames)}

    def kernel(self, params, state, inputs, in_mask, info):
        y, buf = delay_step(inputs, state["buf"])
        # a freshly-silent input still drains the delay line; only flag
        # silent when the line holds silence too
        line_quiet = (
            jnp.all(jnp.abs(state["buf"]) < 1e-10, axis=-1)
            if self.delay_frames > 0
            else jnp.ones_like(in_mask)
        )
        out_mask = in_mask & line_quiet
        return y, {"buf": buf}, out_mask


class DelayCompNode(AudioNode):
    debug_name = "delay_comp"

    def __init__(self, delay_frames: int = 0, delay_secs: float | None = None):
        assert delay_frames >= 0
        self._delay_frames = int(delay_frames)
        self._delay_secs = delay_secs

    def latency_frames(self, sample_rate: int) -> int:
        # a pure delay IS latency — reporting it makes
        # ``AudioGraph.compensate_latency`` account for manual alignment
        # delays (and makes auto-inserted ones idempotent)
        if self._delay_secs is not None:
            return int(round(self._delay_secs * sample_rate))
        return self._delay_frames

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
                "DelayCompNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        frames = self._delay_frames
        if self._delay_secs is not None:
            frames = int(round(self._delay_secs * sample_rate))
        return DelayCompProcessor(
            frames, sample_rate, max_block_frames, num_inputs, num_outputs
        )


class EchoProcessor(NodeProcessor):
    def __init__(self, node, delay_frames, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self.delay_frames = delay_frames

    def group_key(self):
        return (self.delay_frames,)

    def init_state(self):
        return {"line": comb_init(self.num_inputs, self.delay_frames)}

    def collect_params(self):
        return {
            "feedback": np.float32(self._node.feedback()),
            "wet": np.float32(self._node.wet()),
            "dry": np.float32(self._node.dry()),
        }

    def kernel(self, params, state, inputs, in_mask, info):
        # e[n] = x[n-D] + fb·e[n-D]: delay the input by D (read the comb's
        # history), then the comb feedback recirculates the echo.
        f = inputs.shape[-1]
        line = state["line"]
        delayed_echo = line[..., :f]
        # signal entering the line: input + feedback * delayed echo
        echo = inputs + params["feedback"] * delayed_echo
        new_line = jnp.concatenate([line[..., f:], echo], axis=-1)
        y = params["dry"] * inputs + params["wet"] * delayed_echo

        line_quiet = jnp.all(jnp.abs(line) < 1e-10, axis=-1)
        out_mask = in_mask & line_quiet
        y = gate(y, out_mask)
        return y, {"line": new_line}, out_mask


class EchoNode(AudioNode):
    debug_name = "echo"

    def __init__(
        self,
        delay_secs: float = 0.25,
        feedback: float = 0.4,
        wet: float = 0.5,
        dry: float = 1.0,
    ):
        self._delay_secs = float(delay_secs)
        self._feedback = float(np.clip(feedback, 0.0, 0.99))
        self._wet = max(float(wet), 0.0)
        self._dry = max(float(dry), 0.0)

    def feedback(self) -> float:
        return self._feedback

    def set_feedback(self, fb: float):
        self._feedback = float(np.clip(fb, 0.0, 0.99))

    def wet(self) -> float:
        return self._wet

    def set_wet(self, wet: float):
        self._wet = max(float(wet), 0.0)

    def dry(self) -> float:
        return self._dry

    def set_dry(self, dry: float):
        self._dry = max(float(dry), 0.0)

    def info(self) -> AudioNodeInfo:
        return AudioNodeInfo(
            num_min_supported_inputs=1,
            num_max_supported_inputs=MAX_PORTS,
            num_min_supported_outputs=1,
            num_max_supported_outputs=MAX_PORTS,
            updates=False,
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "EchoNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        delay_frames = int(round(self._delay_secs * sample_rate))
        if delay_frames < max_block_frames:
            raise NodeActivationError(
                f"EchoNode delay ({delay_frames} frames) must be >= the "
                f"block size ({max_block_frames} frames)"
            )
        return EchoProcessor(
            self, delay_frames, sample_rate, max_block_frames, num_inputs, num_outputs
        )
