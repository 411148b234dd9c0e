"""Partitioned FFT convolution: long FIR filters (reverb IRs) in real time.

The reference lists convolutional reverb as a built-in node
(``DESIGN_DOC.md:20``) but never implemented it.  TPU-native approach:
**uniformly partitioned overlap-save convolution** with a frequency-domain
delay line (FDL) — the standard zero-latency-per-block structure:

* the impulse response is split into ``P`` partitions of one block each,
  transformed once: ``H[p] = rfft(ir_p, 2F)``;
* each block, the new input joins the previous block (overlap-save),
  ``X = rfft([x_prev, x])`` is pushed into the FDL;
* the output spectrum is ``Y = Σ_p H[p]·FDL[p]`` — a single complex
  multiply-reduce that XLA vectorizes across partitions and channels —
  and ``y = irfft(Y)[F:]``.

Per-block cost is ``O(P·F)`` multiplies + 2 FFTs, independent of IR length
beyond the FDL size; an 8-second 48 kHz IR at F=1024 is P=375 partitions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["partition_ir", "fdl_init", "fdl_step"]


def partition_ir(ir, block_frames: int):
    """Transform an impulse response for partitioned convolution.

    Args:
        ir: ``f32[ch, L]`` (or ``f32[L]``) impulse response.
        block_frames: engine block size ``F``.

    Returns:
        ``H: complex64[P, ch, F+1]`` partition spectra.
    """
    ir = jnp.atleast_2d(jnp.asarray(ir, jnp.float32))
    ch, length = ir.shape
    f = block_frames
    p = max(1, -(-length // f))
    padded = jnp.zeros((ch, p * f), jnp.float32).at[:, :length].set(ir)
    parts = padded.reshape(ch, p, f).transpose(1, 0, 2)  # [P, ch, F]
    # zero-pad each partition to 2F for linear (not circular) convolution
    return jnp.fft.rfft(parts, n=2 * f, axis=-1).astype(jnp.complex64)


def fdl_init(num_partitions: int, channels: int, block_frames: int):
    """Fresh frequency-domain delay line state ``complex64[P, ch, F+1]``
    plus the overlap-save input tail ``f32[ch, F]``."""
    return (
        jnp.zeros(
            (num_partitions, channels, block_frames + 1), jnp.complex64
        ),
        jnp.zeros((channels, block_frames), jnp.float32),
    )


def fdl_step(x, state, H):
    """Convolve one block.

    Args:
        x: ``f32[ch, F]`` new input block.
        state: ``(fdl complex64[P, ch, F+1], x_prev f32[ch, F])``.
        H: partition spectra from :func:`partition_ir` — ``[P, irch, F+1]``
           where ``irch`` is 1 (shared IR) or ``ch``.

    Returns:
        ``(y f32[ch, F], new_state)``
    """
    fdl, x_prev = state
    f = x.shape[-1]

    buf = jnp.concatenate([x_prev, x], axis=-1)  # [ch, 2F]
    X = jnp.fft.rfft(buf, axis=-1).astype(jnp.complex64)  # [ch, F+1]

    # push newest spectrum at index 0 (aligned with H[0] = first partition)
    fdl = jnp.concatenate([X[None], fdl[:-1]], axis=0)

    Y = jnp.sum(H * fdl, axis=0)  # [ch, F+1]
    y = jnp.fft.irfft(Y, n=2 * f, axis=-1)[..., f:].astype(jnp.float32)
    return y, (fdl, x)
