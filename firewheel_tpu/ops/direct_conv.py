"""Direct (time-domain) streaming convolution on the MXU.

The FFT engine (``ops/fft_conv.py``) is the classic O(n log n) answer to
long FIR filters — but on TPU the trade-offs invert for short-to-medium
IRs: FFTs and the complex multiply-reduce are VPU work, while a plain
time-domain convolution lowers to ``lax.conv_general_dilated`` and rides
the MXU (the systolic array), where the chip's FLOPs actually live.  A
128-frame block against a 512-tap IR is ~65K MACs/channel — microseconds
of MXU time — with three structural bonuses:

* **no complex64 anywhere** (the axon tunnel faults on device-resident
  complex64 executable inputs — docs/KNOWN_ISSUES.md; this engine is
  immune by construction);
* **state is one small time-domain tail** ``f32[ch, N-1]`` instead of a
  frequency-domain delay line + FIFO bookkeeping — any hop, any partial
  block, no partition-boundary logic;
* **exact f32 semantics**: the output is the literal FIR sum (golden
  tests hold at 1e-6 where the FFT path's transform round-trip drifts
  ~1e-5 on long IRs).

Cost scales O(N) per output sample, so past a crossover the FFT engine
wins; ``ConvolutionReverbNode(method="auto")`` picks per-IR-length using
``DIRECT_CONV_MAX_TAPS`` (measured on v5e — see docs/PERF.md).

Reference scope: convolutional reverb / FIR filtering
(``DESIGN_DOC.md:20``, unimplemented in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DIRECT_CONV_MAX_TAPS",
    "direct_hist_init",
    "direct_conv_step",
]

# IR lengths up to this ride the MXU path under method="auto"; above it the
# partitioned-FFT engine wins.  Set from the on-chip crossover sweep at
# f32 (Precision.HIGHEST) — docs/PERF.md, v5e round 2: direct wins through
# 512 taps (its FIR-EQ niche), FFT from 1024.  (An earlier sweep at the
# TPU's default bf16 conv precision showed direct winning to 4096, but
# bf16 MACs violate the 1e-6 numerics contract — see the precision note
# in direct_conv_step.)  Overridable per node via method="direct"/"fft".
DIRECT_CONV_MAX_TAPS = 512


def direct_hist_init(channels: int, num_taps: int):
    """Fresh input-tail state ``f32[ch, N-1]`` (host-side NumPy — static
    zeros transfer at the first jit call, never an eager device op)."""
    return np.zeros((channels, max(num_taps - 1, 0)), np.float32)


def direct_conv_step(x, hist, taps):
    """Convolve one hop of any static length against an N-tap FIR.

    Args:
        x: ``f32[ch, n]`` input hop (any static ``n >= 1``).
        hist: ``f32[ch, N-1]`` input tail from :func:`direct_hist_init`.
        taps: ``f32[irch, N]`` filter taps, ``irch`` 1 (shared) or ``ch``.

    Returns:
        ``(y f32[ch, n], hist' f32[ch, N-1])`` with
        ``y[c, t] = sum_k taps[c, k] * concat(hist, x)[c, N-1+t-k]`` —
        the exact streaming FIR sum.
    """
    ch, n = x.shape
    irch, num_taps = taps.shape
    buf = jnp.concatenate([hist, x], axis=-1)  # [ch, N-1+n]
    if num_taps == 1:
        # degenerate single-tap: plain scale (keeps conv shapes legal)
        return x * taps[:, 0][:, None], hist

    # conv_general_dilated computes cross-correlation (no kernel flip), so
    # convolution = correlation against the reversed taps.  Grouped form:
    # one group per channel when the IR is per-channel, else one shared
    # kernel applied to every channel via the batch dim.
    # precision=HIGHEST: TPU convs default to bf16 MXU passes (~8-bit
    # mantissa) — that would silently break this module's exact-f32-sum
    # contract and the repo's 1e-6 golden tolerance on hardware while the
    # CPU-forced test suite stays green.  HIGHEST runs the f32-accurate
    # multi-pass MXU mode.
    rev = taps[:, ::-1]
    if irch == 1:
        lhs = buf[:, None, :]  # [ch(batch), 1, W]
        rhs = rev[None, :, :]  # [1out, 1in, N]
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,
        )  # [ch, 1, n]
        y = out[:, 0, :]
    else:
        lhs = buf[None, :, :]  # [1, ch, W]
        rhs = rev[:, None, :]  # [ch(out), 1in/group, N]
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=ch,
            precision=jax.lax.Precision.HIGHEST,
        )  # [1, ch, n]
        y = out[0]
    return y.astype(jnp.float32), buf[:, n:]
