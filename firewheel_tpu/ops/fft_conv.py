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

__all__ = [
    "partition_ir",
    "fdl_init",
    "fdl_step",
    "conv_partition_ir",
    "conv_state_init",
    "conv_step",
]


def partition_ir(ir, block_frames: int):
    """Transform an impulse response for partitioned convolution.

    Args:
        ir: ``f32[ch, L]`` (or ``f32[L]``) impulse response.
        block_frames: engine block size ``F``.

    Returns:
        ``H: f32[P, ch, F+1, 2]`` partition spectra as real/imag pairs
        (host-side NumPy — static data, transferred at the first jit call,
        never an eager device op; see :func:`conv_partition_ir`).

    Boundary dtype: spectra (and the delay-line state) cross the jit
    boundary as f32 real/imag pairs, NEVER as complex64 — the axon TPU
    tunnel fails any executable invoked with *device-resident* complex64
    inputs (minimal repro in docs/KNOWN_ISSUES.md), and a state feedback
    loop hits that on the second dispatch.  Complex math stays complex
    *inside* the trace (XLA represents complex as coupled reals anyway, so
    this costs nothing on any backend).
    """
    ir = np.atleast_2d(np.asarray(ir, np.float32))
    ch, length = ir.shape
    f = block_frames
    p = max(1, -(-length // f))
    padded = np.zeros((ch, p * f), np.float32)
    padded[:, :length] = ir
    parts = padded.reshape(ch, p, f).transpose(1, 0, 2)  # [P, ch, F]
    # zero-pad each partition to 2F for linear (not circular) convolution
    H = np.fft.rfft(parts, n=2 * f, axis=-1).astype(np.complex64)
    return np.stack([H.real, H.imag], axis=-1).astype(np.float32)


def as_complex(ri):
    """``f32[..., 2]`` real/imag pair -> ``complex64[...]`` (in-trace)."""
    return jax.lax.complex(ri[..., 0], ri[..., 1])


def as_ri_pair(z):
    """``complex64[...]`` -> ``f32[..., 2]`` real/imag pair (in-trace)."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def fdl_init(num_partitions: int, channels: int, block_frames: int):
    """Fresh frequency-domain delay line state ``f32[P, ch, F+1, 2]``
    (real/imag pairs, see :func:`partition_ir`) plus the overlap-save
    input tail ``f32[ch, F]`` (host-side NumPy)."""
    return (
        np.zeros((num_partitions, channels, block_frames + 1, 2), np.float32),
        np.zeros((channels, block_frames), np.float32),
    )


def fdl_step(x, state, H):
    """Convolve one block (fixed hop == partition size ``F``; use
    :func:`conv_step` for arbitrary hops and partition sizes).

    Args:
        x: ``f32[ch, F]`` new input block.
        state: ``(fdl f32[P, ch, F+1, 2], x_prev f32[ch, F])`` — the delay
            line as real/imag pairs (boundary dtype, see
            :func:`partition_ir`).
        H: partition spectra from :func:`partition_ir` —
           ``f32[P, irch, F+1, 2]`` where ``irch`` is 1 (shared IR) or
           ``ch``.

    Returns:
        ``(y f32[ch, F], new_state)``
    """
    fdl_ri, x_prev = state
    fdl = as_complex(fdl_ri)
    f = x.shape[-1]

    buf = jnp.concatenate([x_prev, x], axis=-1)  # [ch, 2F]
    X = jnp.fft.rfft(buf, axis=-1).astype(jnp.complex64)  # [ch, F+1]

    # push newest spectrum at index 0 (aligned with H[0] = first partition)
    fdl = jnp.concatenate([X[None], fdl[:-1]], axis=0)

    Y = jnp.sum(as_complex(H) * fdl, axis=0)  # [ch, F+1]
    y = jnp.fft.irfft(Y, n=2 * f, axis=-1)[..., f:].astype(jnp.float32)
    return y, (as_ri_pair(fdl), x)


# -- zero-latency, any-hop partitioned convolution -----------------------------
#
# ``fdl_step`` above requires the hop to equal the partition size F — fine
# for steady full blocks, wrong (and shape-crashing) for the partial blocks
# the stream dispatches on exact-duration tails.  The general engine below
# accepts ANY static hop n <= F with zero latency:
#
# * the IR's head partition ``h[:F]`` is convolved directly every call
#   (overlap-save with hop n: one (F+n)-point FFT pair) — this is what makes
#   the output available with no block delay, the classic zero-latency
#   partitioned-convolution split;
# * partitions >= 1 ride a frequency-domain delay line that is updated
#   exactly at partition boundaries.  A boundary can fall mid-call; the
#   completed partition is cut from a rolling 2F input history with a
#   dynamic slice, and the resulting F-sample tail contribution is appended
#   to a small FIFO from which each call emits its n samples.
#
# Invariants (n <= F, one boundary max per call): the FIFO holds between
# 1 and 2F valid samples and always has >= n at emit time.

import jax


def _next_pow2(v: int) -> int:
    p = 1
    while p < v:
        p <<= 1
    return p


def conv_partition_ir(ir, block_frames: int):
    """Split an IR for the zero-latency engine.

    Host-side precompute (NumPy, not jnp): the IR spectra are static data,
    so they are built on the host and transferred once at the first jit
    call — never as eager device ops.  (Eager complex/FFT ops through the
    axon tunnel can also hit spurious post-wedge ``UNIMPLEMENTED`` faults,
    see docs/KNOWN_ISSUES.md; init paths avoid the device entirely.)

    Args:
        ir: ``f32[ch, L]`` (or ``[L]``) impulse response.
        block_frames: partition size ``F`` (the engine block size).

    Returns:
        ``(h_head f32[ch, F], H_tail f32[P-1, ch, LP//2+1, 2])`` where
        ``LP = next_pow2(2F)`` — the head partition in the time domain,
        later partitions as LP-point spectra stored as real/imag pairs
        (boundary dtype, see :func:`partition_ir`; LP == 2F for pow2 F).
    """
    ir = np.atleast_2d(np.asarray(ir, np.float32))
    ch, length = ir.shape
    f = block_frames
    # Power-of-two FFT lengths (fastest on every backend; overlap-save is
    # valid for any size >= 2F-1, so rounding up only costs padding)
    lp = _next_pow2(2 * f)
    p = max(1, -(-length // f))
    padded = np.zeros((ch, p * f), np.float32)
    padded[:, :length] = ir
    h_head = padded[:, :f]
    tail = padded[:, f:].reshape(ch, p - 1, f).transpose(1, 0, 2)
    H_tail = np.fft.rfft(tail, n=lp, axis=-1).astype(np.complex64)
    return h_head, np.stack([H_tail.real, H_tail.imag], axis=-1).astype(
        np.float32
    )


def conv_state_init(num_partitions: int, channels: int, block_frames: int):
    """Fresh state for :func:`conv_step` (host-side NumPy, see above)."""
    f = block_frames
    lp = _next_pow2(2 * f)
    return {
        "hist": np.zeros((channels, lp), np.float32),
        "fill": np.zeros((), np.int32),
        "fdl": np.zeros(
            (max(num_partitions - 1, 0), channels, lp // 2 + 1, 2),
            np.float32,
        ),
        "tailbuf": np.zeros((channels, 2 * f), np.float32),
        "tfill": np.full((), f, np.int32),
    }


def conv_step(x, state, h_head, H_tail):
    """Convolve ``n`` samples (any static ``n <= F``), zero latency.

    Args:
        x: ``f32[ch, n]`` input hop.
        state: dict from :func:`conv_state_init`.
        h_head: ``f32[irch, F]`` head partition (irch 1 or ch).
        H_tail: ``f32[P-1, irch, LP//2+1, 2]`` tail partition spectra as
            real/imag pairs, ``LP = next_pow2(2F)`` (from
            :func:`conv_partition_ir`).

    Returns:
        ``(y f32[ch, n], new_state)``
    """
    ch, n = x.shape
    f = h_head.shape[-1]
    lp = state["hist"].shape[-1]  # partition FFT size, >= 2F, power of two
    assert n <= f, f"hop {n} exceeds partition size {f}"

    concat = jnp.concatenate([state["hist"], x], axis=-1)  # [ch, LP+n]

    # head partition: direct overlap-save conv, hop n, filter length F
    # (FFT length rounded up to a power of two)
    L = _next_pow2(f + n)
    win = concat[:, -L:]
    Y_dir = jnp.fft.rfft(win, axis=-1) * jnp.fft.rfft(h_head, n=L, axis=-1)
    y = jnp.fft.irfft(Y_dir, n=L, axis=-1)[..., -n:].astype(jnp.float32)

    fill = state["fill"]
    fdl = as_complex(state["fdl"])
    tailbuf, tfill = state["tailbuf"], state["tfill"]
    num_tail = fdl.shape[0]

    if num_tail > 0:
        def on_boundary(ops):
            fdl, tailbuf, tfill, rem = ops
            # the completed partition ends `rem` samples before the end of
            # x; take the LP-sample overlap-save window ending there (only
            # its last 2F-1 samples influence the kept outputs)
            window = jax.lax.dynamic_slice(concat, (0, n - rem), (ch, lp))
            X = jnp.fft.rfft(window, axis=-1).astype(jnp.complex64)
            fdl = jnp.concatenate([X[None], fdl[:-1]], axis=0)
            contrib = jnp.fft.irfft(
                jnp.sum(as_complex(H_tail) * fdl, axis=0), n=lp, axis=-1
            )[..., -f:].astype(jnp.float32)
            tailbuf = jax.lax.dynamic_update_slice(tailbuf, contrib, (0, tfill))
            return fdl, tailbuf, tfill + f

        completed = fill + n >= f
        rem = jnp.where(completed, fill + n - f, 0)
        if n == f:
            # a full hop always completes a partition — no cond needed
            fdl, tailbuf, tfill = on_boundary((fdl, tailbuf, tfill, fill))
        else:
            fdl, tailbuf, tfill = jax.lax.cond(
                completed,
                on_boundary,
                lambda ops: ops[:3],
                (fdl, tailbuf, tfill, rem),
            )

    y = y + tailbuf[:, :n]
    tailbuf = jnp.concatenate(
        [tailbuf[:, n:], jnp.zeros((ch, n), jnp.float32)], axis=-1
    )
    new_state = {
        "hist": concat[:, n:],
        "fill": jnp.where(fill + n >= f, fill + n - f, fill + n).astype(
            jnp.int32
        ),
        "fdl": as_ri_pair(fdl),
        "tailbuf": tailbuf,
        "tfill": (tfill - n).astype(jnp.int32),
    }
    return y, new_state
