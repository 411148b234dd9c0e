"""firewheel_tpu.ops — DSP primitives shared by the node library.

All pure JAX functions over ``[..., frames]`` arrays with explicit carries,
designed around VPU-friendly parallel scans and FFT convolution.
"""

from .iir import (
    BiquadCoeffs,
    biquad_allpass,
    biquad_bandpass,
    biquad_high_shelf,
    biquad_highpass,
    biquad_low_shelf,
    biquad_lowpass,
    biquad_notch,
    biquad_peaking,
    biquad_scan,
    one_pole_coeffs,
    one_pole_scan,
)
from .fft_conv import fdl_init, fdl_step, partition_ir
from .delay import comb_init, comb_step, delay_init, delay_step
from .pan import (
    equal_power_gains,
    mid_side_merge,
    mid_side_split,
    spatial_params,
)

__all__ = [
    "BiquadCoeffs",
    "biquad_allpass",
    "biquad_bandpass",
    "biquad_high_shelf",
    "biquad_highpass",
    "biquad_low_shelf",
    "biquad_lowpass",
    "biquad_notch",
    "biquad_peaking",
    "biquad_scan",
    "one_pole_coeffs",
    "one_pole_scan",
    "fdl_init",
    "fdl_step",
    "partition_ir",
    "comb_init",
    "comb_step",
    "delay_init",
    "delay_step",
    "equal_power_gains",
    "mid_side_merge",
    "mid_side_split",
    "spatial_params",
]
