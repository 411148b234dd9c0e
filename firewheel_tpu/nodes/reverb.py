"""Convolutional reverb node: partitioned FFT convolution with a live IR.

Reference scope: "convolutional reverb" (``DESIGN_DOC.md:20``, unimplemented
there).  The impulse response is a device-resident array param; its
partition spectra are computed once per IR (cached host-side, like the
sampler's sample cache) so swapping IRs of the same length is free and the
per-block cost is the complex multiply-reduce over the frequency-domain
delay line (``ops/fft_conv.py``).

Two engines, selected by ``method``:

* ``"fft"`` — the zero-latency partitioned split (``ops/fft_conv.py``):
  the IR's head partition convolves directly every call, later partitions
  ride a frequency-domain delay line updated at partition boundaries — so
  the wet path has NO block latency and partial blocks (stream tails,
  exact-duration renders) convolve sample-exactly.  O(P·F) per block —
  the long-IR engine.
* ``"direct"`` — time-domain convolution on the MXU
  (``ops/direct_conv.py``): the whole padded IR as one
  ``conv_general_dilated``, state is a single input tail.  O(N) per
  output sample but the MACs land on the systolic array, there is no
  complex64 anywhere, and the output is the exact f32 FIR sum — the
  short/medium-IR engine.
* ``"auto"`` (default) picks per padded-IR-length using the measured
  v5e crossover (``direct_conv.DIRECT_CONV_MAX_TAPS``; docs/PERF.md).

Both engines are zero-latency and agree to ~1e-5 (transform round-off);
switching methods retraces (structural) but preserves the graph.
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
from ..ops.direct_conv import (
    DIRECT_CONV_MAX_TAPS,
    direct_conv_step,
    direct_hist_init,
)
from ..ops.fft_conv import conv_partition_ir, conv_state_init, conv_step

__all__ = ["ConvolutionReverbNode", "ConvolutionReverbProcessor"]


class ConvolutionReverbProcessor(NodeProcessor):
    supports_megakernel = False  # FFT / conv engines have no Mosaic lowering
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._h_cache = None
        self._h_cache_src = None
        self._partitions = max(
            1, -(-node.ir_frames() // max_block_frames)
        )
        cap = self._partitions * max_block_frames
        method = node.method
        if method == "auto":
            method = "direct" if cap <= DIRECT_CONV_MAX_TAPS else "fft"
        self._method = method

    def _capacity(self) -> int:
        return self._partitions * self.max_block_frames

    def _padded_ir(self):
        """IR zero-padded to the activated capacity (so same-length swaps
        never retrace; longer IRs need re-activation)."""
        node = self._node
        ir = np.atleast_2d(np.asarray(node._ir, np.float32))
        cap = self._capacity()
        if ir.shape[-1] > cap:
            raise ValueError(
                f"new IR ({ir.shape[-1]} frames) exceeds the activated "
                f"capacity ({cap} frames); re-add the node (or activate "
                "with the longest IR first) to grow the delay line"
            )
        if ir.shape[-1] < cap:
            ir = np.pad(ir, ((0, 0), (0, cap - ir.shape[-1])))
        return ir

    def _spectra(self):
        node = self._node
        if self._h_cache_src is not node._ir:
            ir = self._padded_ir()
            if self._method == "direct":
                self._h_cache = ir  # taps verbatim (no transform)
            else:
                self._h_cache = conv_partition_ir(ir, self.max_block_frames)
            self._h_cache_src = node._ir
        return self._h_cache

    def group_key(self):
        # state/param shapes depend on the engine, the partition count,
        # and the IR channel count
        return (self._method, self._partitions, self._node._ir.shape[0])

    def init_state(self):
        if self._method == "direct":
            return {
                "hist": direct_hist_init(self.num_inputs, self._capacity())
            }
        return conv_state_init(
            self._partitions, self.num_inputs, self.max_block_frames
        )

    def collect_params(self):
        base = {
            "wet": np.float32(self._node.wet()),
            "dry": np.float32(self._node.dry()),
        }
        if self._method == "direct":
            base["taps"] = self._spectra()
        else:
            h_head, H_tail = self._spectra()
            base["h_head"] = h_head
            base["H_tail"] = H_tail
        return base

    def kernel(self, params, state, inputs, in_mask, info):
        if self._method == "direct":
            wet, hist = direct_conv_step(inputs, state["hist"], params["taps"])
            new_state = {"hist": hist}
            # the reverb tail rings while any input history remains audible
            line_quiet = jnp.all(jnp.abs(state["hist"]) < 1e-12, axis=-1)
        else:
            wet, new_state = conv_step(
                inputs, state, params["h_head"], params["H_tail"]
            )
            line_quiet = jnp.all(
                jnp.abs(state["hist"]) < 1e-12, axis=-1
            ) & jnp.all(jnp.abs(state["tailbuf"]) < 1e-12, axis=-1)
            if state["fdl"].shape[0] > 0:
                # fdl is f32[P-1, ch, bins, 2] real/imag pairs (fft_conv
                # boundary dtype — complex64 never crosses the jit boundary)
                line_quiet &= jnp.all(
                    jnp.abs(state["fdl"]) < 1e-12, axis=(0, 2, 3)
                )
        y = params["dry"] * inputs + params["wet"] * wet
        out_mask = in_mask & line_quiet
        y = gate(y, out_mask)
        return y, new_state, out_mask


class ConvolutionReverbNode(AudioNode):
    debug_name = "convolution_reverb"

    def __init__(self, ir, wet: float = 0.3, dry: float = 1.0,
                 method: str = "auto"):
        """``ir``: impulse response, ``[frames]`` (shared across channels) or
        ``[channels, frames]``.

        ``method``: ``"auto"`` (default; MXU direct convolution up to the
        measured crossover, partitioned FFT beyond), ``"direct"``, or
        ``"fft"`` — see the module docstring.  Structural: changing it
        retraces."""
        assert method in ("auto", "direct", "fft"), method
        self.method = method
        self._ir = np.atleast_2d(np.array(ir, np.float32, copy=True))
        self._wet = max(float(wet), 0.0)
        self._dry = max(float(dry), 0.0)

    def ir_frames(self) -> int:
        return self._ir.shape[-1]

    def set_ir(self, ir):
        """Swap the impulse response.  Same padded length → no retrace.

        The IR is copied: the spectra cache keys on object identity, so an
        in-place edit of the caller's array followed by ``set_ir`` must
        produce a fresh object (and callers keep ownership of theirs).
        """
        self._ir = np.atleast_2d(np.array(ir, np.float32, copy=True))

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
        )

    def activate(self, sample_rate, max_block_frames, num_inputs, num_outputs):
        if num_inputs != num_outputs:
            raise NodeActivationError(
                "ConvolutionReverbNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        ir_ch = self._ir.shape[0]
        if ir_ch not in (1, num_inputs):
            raise NodeActivationError(
                f"IR has {ir_ch} channels; expected 1 or {num_inputs}"
            )
        return ConvolutionReverbProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
