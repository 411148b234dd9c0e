"""Parametric EQ node: a cascade of RBJ biquad bands with live controls.

Beyond the reference's shipped nodes but inside its declared scope
("filters (lowpass, highpass, bandpass)", ``DESIGN_DOC.md:16`` — this is
the multi-band form every mixer ends up wanting).  Each band is one RBJ
section (``ops/iir.py``); the band *types* and count are structural (they
select the traced coefficient math), while every frequency / Q / gain —
and a per-band ``enabled`` bypass — are live params: sweeping an EQ never
recompiles.

TPU shape: the cascade evaluates as ``n_bands`` chained log-depth affine
scans (``biquad_scan``), one fused program; a disabled band's coefficients
are replaced in-trace by the identity section ``(1, 0, 0, 0, 0)`` via
``jnp.where`` — bypass is a param flip, not a topology edit (the same
no-recompile discipline as every engine param).

State: TDF-II pairs ``z1, z2`` per band per channel.  A bypassed band
keeps its state flowing through the identity section (its z decays to the
input history), so re-enabling a band never replays a stale tail.
"""

from __future__ import annotations

import dataclasses

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
from ..ops.iir import BiquadCoeffs, biquad_scan
from .filter import FilterType, _BUILDERS

__all__ = ["EQBand", "ParametricEQNode", "ParametricEQProcessor"]


@dataclasses.dataclass
class EQBand:
    """One EQ band. ``band_type`` is structural; the rest are live."""

    band_type: str = FilterType.PEAKING
    frequency_hz: float = 1000.0
    q: float = 0.7071
    gain_db: float = 0.0
    enabled: bool = True

    def __post_init__(self):
        assert self.band_type in _BUILDERS, (
            f"unknown band type {self.band_type!r}"
        )
        self.frequency_hz = float(np.clip(self.frequency_hz, 1.0, 20_000.0))
        self.q = max(float(self.q), 1e-3)
        self.gain_db = float(self.gain_db)
        self.enabled = bool(self.enabled)


class ParametricEQProcessor(NodeProcessor):
    def __init__(self, node, sample_rate, max_block_frames, num_inputs, num_outputs):
        super().__init__(sample_rate, max_block_frames, num_inputs, num_outputs)
        self._node = node
        self._types = tuple(b.band_type for b in node._bands)

    def group_key(self):
        return (self._types,)

    def init_state(self):
        # per-band flat keys rather than stacked [n_bands, ch] arrays:
        # scalar-indexing a stacked state operand crashes the Mosaic
        # compiler inside the Pallas megakernel (SIGABRT), and flat [ch]
        # vectors tile cleanly there
        ch = self.num_inputs
        st = {}
        for i in range(len(self._types)):
            st[f"z1_{i}"] = jnp.zeros((ch,), jnp.float32)
            st[f"z2_{i}"] = jnp.zeros((ch,), jnp.float32)
        return st

    def collect_params(self):
        # Coefficients are staged HOST-side (numpy via the trig-free jnp
        # builders on concrete floats) as per-band scalar tuples: the
        # kernel is then pure chained scans — no in-kernel trig/power and
        # no scalar indexing into param vectors, both of which Mosaic
        # rejects or miscompiles inside the Pallas megakernel.  Live
        # semantics are identical: set_band edits land at the next
        # collect_params staging, never recompiling.
        out = []
        for b, band_type in zip(self._node._bands, self._types):
            if b.enabled:
                c = _BUILDERS[band_type](
                    b.frequency_hz, b.q, b.gain_db, self.sample_rate
                )
                cs = tuple(np.float32(v) for v in c)
            else:
                # bypass: identity section (1, 0, 0, 0, 0) — state keeps
                # flowing so re-enabling never replays a stale tail
                cs = (
                    np.float32(1.0), np.float32(0.0), np.float32(0.0),
                    np.float32(0.0), np.float32(0.0),
                )
            out.append(dict(zip(("b0", "b1", "b2", "a1", "a2"), cs)))
        return {"bands": tuple(out)}

    def kernel(self, params, state, inputs, in_mask, info):
        y = inputs
        new_state = {}
        # per-channel quietness (like FilterProcessor) so one ringing
        # channel doesn't mark its silent sibling audible
        quiet = jnp.ones((inputs.shape[0],), bool)
        for i, band in enumerate(params["bands"]):
            c = BiquadCoeffs(
                band["b0"], band["b1"], band["b2"], band["a1"], band["a2"]
            )
            quiet = quiet & (
                jnp.abs(state[f"z1_{i}"]) < 1e-10
            ) & (jnp.abs(state[f"z2_{i}"]) < 1e-10)
            y, (z1, z2) = biquad_scan(
                y, (state[f"z1_{i}"], state[f"z2_{i}"]), c
            )
            new_state[f"z1_{i}"] = z1
            new_state[f"z2_{i}"] = z2

        out_mask = in_mask & quiet
        y = gate(y, out_mask)
        return y, new_state, out_mask


class ParametricEQNode(AudioNode):
    """Multi-band parametric EQ (see module docstring).

    ``bands`` fixes the band types/count at construction (structural); use
    :meth:`set_band` / :meth:`set_enabled` for live control.  The default
    is the classic 4-band channel strip: low shelf, two peaks, high shelf.
    """

    debug_name = "parametric_eq"

    def __init__(self, bands: list[EQBand] | None = None):
        if bands is None:
            bands = [
                EQBand(FilterType.LOW_SHELF, 120.0),
                EQBand(FilterType.PEAKING, 400.0),
                EQBand(FilterType.PEAKING, 2500.0),
                EQBand(FilterType.HIGH_SHELF, 8000.0),
            ]
        assert len(bands) >= 1, "ParametricEQNode needs at least one band"
        self._bands = [
            b if isinstance(b, EQBand) else EQBand(**b) for b in bands
        ]

    def num_bands(self) -> int:
        return len(self._bands)

    def band(self, i: int) -> EQBand:
        return self._bands[i]

    def set_band(
        self,
        i: int,
        frequency_hz: float | None = None,
        q: float | None = None,
        gain_db: float | None = None,
    ):
        b = self._bands[i]
        if frequency_hz is not None:
            b.frequency_hz = float(np.clip(frequency_hz, 1.0, 20_000.0))
        if q is not None:
            b.q = max(float(q), 1e-3)
        if gain_db is not None:
            b.gain_db = float(gain_db)

    def set_enabled(self, i: int, enabled: bool):
        self._bands[i].enabled = bool(enabled)

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
                "ParametricEQNode requires num_inputs == num_outputs; "
                f"got {num_inputs} in, {num_outputs} out"
            )
        return ParametricEQProcessor(
            self, sample_rate, max_block_frames, num_inputs, num_outputs
        )
