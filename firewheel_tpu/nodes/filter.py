"""Filter node: biquad lowpass/highpass/bandpass/notch/peak/shelf sections.

Reference scope: "filters (lowpass, highpass, bandpass)"
(``DESIGN_DOC.md:16``, unimplemented there).  Each channel runs one biquad
section via the parallel-scan kernel (``ops/iir.py``); cutoff/Q/gain are
live params — coefficients are recomputed per block from the staged values
(block-rate parameter updates; the audible difference from sample-rate
coefficient ramps is negligible at ≤ 21 ms blocks and is the standard
trade-off in block-based engines).
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
from ..ops.iir import (
    biquad_allpass,
    biquad_bandpass,
    biquad_high_shelf,
    biquad_highpass,
    biquad_low_shelf,
    biquad_lowpass,
    biquad_notch,
    biquad_peaking,
    biquad_scan,
)

__all__ = ["FilterType", "FilterNode", "FilterProcessor"]


class FilterType:
    LOWPASS = "lowpass"
    HIGHPASS = "highpass"
    BANDPASS = "bandpass"
    NOTCH = "notch"
    ALLPASS = "allpass"
    PEAKING = "peaking"
    LOW_SHELF = "low_shelf"
    HIGH_SHELF = "high_shelf"


_BUILDERS = {
    FilterType.LOWPASS: lambda f, q, g, sr: biquad_lowpass(f, q, sr),
    FilterType.HIGHPASS: lambda f, q, g, sr: biquad_highpass(f, q, sr),
    FilterType.BANDPASS: lambda f, q, g, sr: biquad_bandpass(f, q, sr),
    FilterType.NOTCH: lambda f, q, g, sr: biquad_notch(f, q, sr),
    FilterType.ALLPASS: lambda f, q, g, sr: biquad_allpass(f, q, sr),
    FilterType.PEAKING: biquad_peaking,
    FilterType.LOW_SHELF: biquad_low_shelf,
    FilterType.HIGH_SHELF: biquad_high_shelf,
}


class FilterProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._builder = _BUILDERS[node.filter_type]
        backend = node.backend
        if backend == "auto":
            # Measured head-to-head IN-GRAPH on v5e (same-process A/B/A,
            # 64-node mixer, B=8192 K=32): scan 2.42 / pallas 2.78 / scan
            # 2.39 ms per dispatch — inside a fused graph the scan wins
            # (~15%): the standalone kernel's HBM win (docs/PERF.md) is
            # outweighed by breaking XLA's fusion around the filter.
            # "pallas" stays the right call for filter-dominated programs
            # (many sections back-to-back) and for its exact sequential
            # f32 semantics; opt in per node.  Cross-process comparisons
            # on the tunnel are NOT valid evidence here — dispatch times
            # for the identical program vary 2.4-5.8 ms across sessions.
            backend = "scan"
        self._backend = backend

    def init_state(self):
        ch = self.num_inputs
        return {
            "z1": jnp.zeros((ch,), jnp.float32),
            "z2": jnp.zeros((ch,), jnp.float32),
        }

    def collect_params(self):
        n = self._node
        return {
            "freq": np.float32(n.frequency()),
            "q": np.float32(n.q()),
            "gain_db": np.float32(n.gain_db()),
        }

    def group_key(self):
        return (self._node.filter_type, self._backend)

    def kernel(self, params, state, inputs, in_mask, info):
        coeffs = self._builder(
            params["freq"], params["q"], params["gain_db"], self.sample_rate
        )
        # inside the Pallas megakernel's trace a nested pallas_call is
        # illegal — the mosaic trace-mode flag marks that trace, and
        # the filter falls back to the (Mosaic-lowered) scan there
        from ..core import trace_mode

        if self._backend == "pallas" and not trace_mode.MOSAIC:
            from ..ops.pallas_iir import biquad_pallas, pallas_available

            y, (z1, z2) = biquad_pallas(
                inputs,
                (state["z1"], state["z2"]),
                coeffs,
                interpret=not pallas_available(),
            )
        else:
            y, (z1, z2) = biquad_scan(
                inputs, (state["z1"], state["z2"]), coeffs
            )

        # All-silent input with settled (zero) filter state stays silent;
        # with ringing state the filter tail is real audio — only flag
        # channels whose input AND state are quiet.
        state_quiet = (jnp.abs(state["z1"]) < 1e-10) & (
            jnp.abs(state["z2"]) < 1e-10
        )
        out_mask = in_mask & state_quiet
        y = gate(y, out_mask)
        return y, {"z1": z1, "z2": z2}, out_mask


class FilterNode(AudioNode):
    debug_name = "filter"

    def __init__(
        self,
        filter_type: str = FilterType.LOWPASS,
        frequency_hz: float = 1000.0,
        q: float = 0.7071,
        gain_db: float = 0.0,
        backend: str = "auto",
    ):
        """``backend``: "auto"/"scan" (portable associative scan) or
        "pallas" (sequential-in-VMEM TPU kernel — exact sequential f32
        semantics and less HBM traffic; best under large batches)."""
        assert filter_type in _BUILDERS, f"unknown filter type {filter_type!r}"
        assert backend in ("auto", "scan", "pallas"), backend
        self.filter_type = filter_type
        self.backend = backend
        self._freq = float(np.clip(frequency_hz, 1.0, 20_000.0))
        self._q = max(float(q), 1e-3)
        self._gain_db = float(gain_db)

    def frequency(self) -> float:
        return self._freq

    def set_frequency(self, hz: float):
        self._freq = float(np.clip(hz, 1.0, 20_000.0))

    def q(self) -> float:
        return self._q

    def set_q(self, q: float):
        self._q = max(float(q), 1e-3)

    def gain_db(self) -> float:
        return self._gain_db

    def set_gain_db(self, db: float):
        self._gain_db = float(db)

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
                "FilterNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return FilterProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
