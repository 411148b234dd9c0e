"""FIR filter node: arbitrary-taps / linear-phase filtering on the MXU.

Beyond-reference DSP in the reference's declared scope ("filters",
``DESIGN_DOC.md:16``, unimplemented there).  Where ``FilterNode`` gives
IIR biquad sections (minimum-phase, cheap, phase-warping), this node runs
an arbitrary FIR through the time-domain MXU convolution engine
(``ops/direct_conv.py``) — the tool for linear-phase EQ, Hilbert/allpass
networks, matched/inverse filters, or measured speaker/room corrections.

Taps are a live param: swapping same-length taps never retraces (the tap
array is a jit input, like the sampler's sample).  Linear-phase designs
delay by ``(N-1)/2`` samples; pair with ``DelayCompNode`` on parallel
paths.  ``design_windowed_sinc`` builds the standard Hamming-windowed
lowpass/highpass/bandpass/bandstop kernels host-side.
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
from ..ops.direct_conv import direct_conv_step, direct_hist_init

__all__ = ["FirFilterNode", "FirFilterProcessor", "design_windowed_sinc"]


def design_windowed_sinc(
    kind: str,
    num_taps: int,
    sample_rate: float,
    cutoff_hz,
    window: str = "hamming",
):
    """Host-side windowed-sinc FIR design (f32 taps, zero device work).

    Args:
        kind: ``"lowpass"`` | ``"highpass"`` | ``"bandpass"`` | ``"bandstop"``.
        num_taps: filter length (odd for highpass/bandstop — a type-I
            linear-phase filter needs symmetric taps around a center tap).
        sample_rate: stream rate in Hz.
        cutoff_hz: one corner for low/highpass, ``(lo, hi)`` for band kinds.
        window: ``"hamming"`` | ``"blackman"`` | ``"rect"``.

    Returns:
        ``f32[num_taps]`` taps (unit DC/passband gain by construction).
    """
    n = int(num_taps)
    assert n >= 3, "num_taps must be >= 3"
    if kind in ("highpass", "bandstop") and n % 2 == 0:
        raise ValueError(f"{kind} needs an odd num_taps (type-I symmetry)")
    m = np.arange(n, dtype=np.float64) - (n - 1) / 2.0

    def sinc_lp(fc):
        h = 2.0 * fc / sample_rate * np.sinc(2.0 * fc / sample_rate * m)
        return h

    if kind == "lowpass":
        h = sinc_lp(float(cutoff_hz))
    elif kind == "highpass":
        h = -sinc_lp(float(cutoff_hz))
        h[(n - 1) // 2] += 1.0
    elif kind == "bandpass":
        lo, hi = cutoff_hz
        h = sinc_lp(float(hi)) - sinc_lp(float(lo))
    elif kind == "bandstop":
        lo, hi = cutoff_hz
        h = sinc_lp(float(lo)) - sinc_lp(float(hi))
        h[(n - 1) // 2] += 1.0
    else:
        raise ValueError(f"unknown design kind {kind!r}")

    if window == "hamming":
        w = np.hamming(n)
    elif window == "blackman":
        w = np.blackman(n)
    elif window == "rect":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {window!r}")
    h = h * w
    # normalize passband gain: DC for LP/BS, Nyquist for HP, center for BP
    if kind == "lowpass" or kind == "bandstop":
        h /= np.sum(h)
    elif kind == "highpass":
        h /= np.sum(h * np.cos(np.pi * m))
    else:
        lo, hi = cutoff_hz
        fc = 0.5 * (float(lo) + float(hi))
        h /= np.abs(np.sum(h * np.exp(-2j * np.pi * fc / sample_rate * m)))
    return h.astype(np.float32)


class FirFilterProcessor(NodeProcessor):
    supports_megakernel = False  # conv_general_dilated has no Mosaic lowering
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._num_taps = node.num_taps()
        self._tap_channels = node._taps.shape[0]

    def group_key(self):
        return (self._num_taps, self._node._taps.shape[0])

    def init_state(self):
        return {"hist": direct_hist_init(self.num_inputs, self._num_taps)}

    def collect_params(self):
        node = self._node
        taps = np.atleast_2d(np.asarray(node._taps, np.float32))
        if taps.shape[-1] != self._num_taps:
            raise ValueError(
                f"taps length changed ({taps.shape[-1]} != activated "
                f"{self._num_taps}); pad to the activated length or re-add "
                "the node"
            )
        if taps.shape[0] != self._tap_channels:
            # shape changes after activation would mis-stack in pooled
            # programs (group_key covers the activated shape) — fail loudly
            raise ValueError(
                f"taps channel count changed ({taps.shape[0]} != activated "
                f"{self._tap_channels}); re-add the node to change the "
                "per-channel/shared layout"
            )
        return {"taps": taps, "gain": np.float32(node._gain)}

    def kernel(self, params, state, inputs, in_mask, info):
        y, hist = direct_conv_step(inputs, state["hist"], params["taps"])
        y = y * params["gain"]
        line_quiet = jnp.all(jnp.abs(state["hist"]) < 1e-12, axis=-1)
        out_mask = in_mask & line_quiet
        y = gate(y, out_mask)
        return y, {"hist": hist}, out_mask


class FirFilterNode(AudioNode):
    debug_name = "fir_filter"

    def __init__(self, taps, gain: float = 1.0, report_latency: bool = False):
        """``taps``: ``f32[N]`` (shared across channels) or ``f32[ch, N]``
        FIR taps — e.g. from :func:`design_windowed_sinc` or a measured IR.
        ``gain``: post-filter linear gain (live param).
        ``report_latency``: declare the linear-phase group delay
        ``(N-1)//2`` to the PDC protocol (``AudioNode.latency_frames``) so
        ``AudioGraph.compensate_latency`` aligns parallel paths around this
        filter.  Only meaningful for (near-)linear-phase taps — asymmetric
        taps have frequency-dependent delay no single number captures, so
        the default is off."""
        self._taps = np.atleast_2d(np.array(taps, np.float32, copy=True))
        self._gain = float(gain)
        self._report_latency = bool(report_latency)

    def latency_frames(self, sample_rate: int) -> int:
        if self._report_latency:
            return (self._taps.shape[-1] - 1) // 2
        return 0

    def num_taps(self) -> int:
        return self._taps.shape[-1]

    def set_taps(self, taps):
        """Swap taps live.  Same length → no retrace (taps are a jit
        input); the array is copied so callers keep ownership."""
        self._taps = np.atleast_2d(np.array(taps, np.float32, copy=True))

    def set_gain(self, gain: float):
        self._gain = float(gain)

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
                "FirFilterNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        tch = self._taps.shape[0]
        if tch not in (1, num_inputs):
            raise NodeActivationError(
                f"taps have {tch} channels; expected 1 or {num_inputs}"
            )
        return FirFilterProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
