"""On-device IMA ADPCM (4-bit) encoding for serving egress.

The serving loop is egress-bound on a remote attach (docs/PERF.md
"Serving loop with egress": raw device→host ~0.025 GB/s, shipped audio
88.8× realtime at pcm16).  IMA ADPCM at 4 bits/sample cuts the shipped
bytes 4× over pcm16 — directly ~4× shipped throughput on any
egress-bound link — and every game engine/decoder understands it (it is
the WAV ``wFormatTag 0x0011`` payload).  This module is the DEVICE-side
encoder: :func:`encode_ima_chunk` runs under jit (a ``lax.scan`` over
the per-chunk sample index, vectorized over batch × channels) and is
bit-exact against the host reference codec
(:func:`firewheel_tpu.utils.adpcm.encode_ima`, validated in
``tests/test_adpcm_device.py``).

Reference parity hook: the reference converts PCM at the resource
boundary (``/root/reference/crates/firewheel-core/src/sample_resource.rs:338-345``);
this is the same convert-at-the-boundary pattern applied to the OUTPUT
side, which the reference never needed (its audio never leaves the
process).

Wire format (one independently-decodable IMA block per instance per
chunk): for ``No`` channels and ``S = K·F`` frames, each instance's row
is ``block_align = (4 + S/2) · No`` bytes — a standard multi-channel
IMA block (4-byte per-channel header, then 4-byte per-channel groups of
8 nibbles, low nibble first, channels round-robin per group) holding
``S + 1`` frames, the last a pad (repeat of the final frame, exactly
how the host encoder pads).  Decode with
:func:`decode_ima_chunk` (or any WAV IMA decoder given the
block_align) and drop the final pad frame.

TPU note: the encoder is inherently sequential over samples (the
predictor/step-index carry), so it is a ``lax.scan`` of length S with a
handful of int32 vector ops and ONE tiny table gather per step (a
``[89, 4]`` row of precomputed step thresholds; the dequant magnitude
and next step index are arithmetic in the quantizer bits) —
deliberately free of integer SHIFT/AND ops, which flip XLA's TPU loop
compilation into a pathological mode when they appear inside scan
bodies (CLAUDE.md hazard; measured 26× slower code on the mixer graph).
All shifts are precomputed into the ``[89, 4]`` table below;
sign/magnitude handling is arithmetic (``where``/mul/add), and nibble
packing happens OUTSIDE the scan as one vectorized mul-add.  The scan
runs ``unroll=8`` — per-iteration loop overhead dominates a 2048-step
sequential scan at serving batch sizes (measured: the 5-gather
unroll=1 version bounded the adpcm4 serving loop at ~206× realtime,
under the pcm16 egress ceiling it was meant to beat).
"""

from __future__ import annotations

import numpy as np

from ..utils.adpcm import IMA_INDEX_TABLE, IMA_STEP_TABLE

__all__ = [
    "encode_ima_chunk",
    "decode_ima_chunk",
    "chunk_block_align",
]

# -- precomputed shift-free tables (host, once) --------------------------------
# ONE [89, 4] table: (step, step>>1, step>>2, step>>3) per index — the
# encoder's three greedy magnitude thresholds plus the reconstruction
# base.  A single 4-column gather per scan step replaces the original
# five separate gathers (step/half/quarter + two 712-entry (idx, mag)
# tables): the dequant magnitude and the next step index are pure
# arithmetic in (b4, b2, b1) given these four values, and gathers are
# the dominant per-step cost of the scan on TPU.
_STEP = IMA_STEP_TABLE.astype(np.int32)  # [89]
_STEPS4 = np.stack(
    [_STEP, _STEP >> 1, _STEP >> 2, _STEP >> 3], axis=1
)  # [89, 4]


def chunk_block_align(num_channels: int, frames: int) -> int:
    """Bytes per instance for a ``frames``-frame chunk (``frames`` must
    divide by 8): one IMA block of ``frames + 1`` samples/channel."""
    if frames % 8:
        raise ValueError(f"chunk frames must divide by 8, got {frames}")
    return (4 + frames // 2) * num_channels


def encode_ima_chunk(pcm_i16):
    """Encode int16 ``[B, S, No]`` (interleaved frames, S divisible by
    8) → uint8 ``[B, block_align]`` IMA blocks, under jit.

    Bit-exact vs ``utils.adpcm.encode_ima(x[b].T, block_align)`` for
    every instance ``b`` (the host encoder sees S frames, pads one to
    reach the block's S+1 samples — mirrored here by repeating the last
    frame).
    """
    import jax
    import jax.numpy as jnp

    pcm_i16 = jnp.asarray(pcm_i16)
    B, S, No = pcm_i16.shape
    if S % 8:
        raise ValueError(f"chunk frames must divide by 8, got {S}")
    x = pcm_i16.astype(jnp.int32)  # [B, S, No]

    steps4_t = jnp.asarray(_STEPS4)  # [89, 4]

    x0 = x[:, 0, :]  # [B, No] — the header predictor IS sample 0
    # samples 1..S (S of them): x[1:], then the pad frame (= last frame)
    xs = jnp.concatenate([x[:, 1:, :], x[:, -1:, :]], axis=1)  # [B, S, No]
    xs = jnp.moveaxis(xs, 1, 0)  # [S, B, No] — scan over samples

    def body(carry, target):
        pred, idx = carry  # int32 [B, No] each
        s4 = steps4_t[idx]  # [B, No, 4] — the ONLY gather this step
        step = s4[..., 0]
        half = s4[..., 1]
        quarter = s4[..., 2]
        eighth = s4[..., 3]
        diff = target - pred
        neg = diff < 0
        ad = jnp.abs(diff)
        b4 = (ad >= step).astype(jnp.int32)
        ad = ad - b4 * step
        b2 = (ad >= half).astype(jnp.int32)
        ad = ad - b2 * half
        b1 = (ad >= quarter).astype(jnp.int32)
        mag = b4 * 4 + b2 * 2 + b1
        # decoder-mirrored reconstruction, arithmetic in the thresholds:
        # dq = step>>3 + b1*(step>>2) + b2*(step>>1) + b4*step
        dq = eighth + b1 * quarter + b2 * half + b4 * step
        pred = jnp.clip(
            jnp.where(neg, pred - dq, pred + dq), -32768, 32767
        )
        # IMA index table [-1,-1,-1,-1, 2, 4, 6, 8] == mag>=4 ? 2*mag-6 : -1
        idx = jnp.clip(
            idx + jnp.where(mag >= 4, 2 * mag - 6, jnp.int32(-1)), 0, 88
        )
        nib = mag + jnp.where(neg, jnp.int32(8), jnp.int32(0))
        return (pred, idx), nib.astype(jnp.uint8)

    init = (x0, jnp.zeros((B, No), jnp.int32))
    # unroll: fewer loop-carried iterations (the per-iteration overhead of
    # a 2048-step scan is significant on TPU); 8 keeps the body small
    # enough that compile time stays sane through the tunnel.
    _, nibs = jax.lax.scan(body, init, xs, unroll=8)  # nibs: [S, B, No]

    # -- pack OUTSIDE the scan (vectorized; mul-add, no bit-ops) --------------
    # host layout: per channel, 4-byte groups of 8 nibbles LOW first,
    # groups round-robin across channels
    nib = jnp.moveaxis(nibs, 0, 2)  # [B, No, S]
    groups = S // 8
    nib = nib.reshape(B, No, groups, 8).astype(jnp.int32)
    lo = nib[..., 0::2]
    hi = nib[..., 1::2]
    payload = (lo + hi * 16).astype(jnp.uint8)  # [B, No, groups, 4]
    payload = jnp.moveaxis(payload, 1, 2).reshape(B, groups * No * 4)

    # header per channel: int16 LE predictor (sample 0), step index 0, 0
    x0u = jnp.where(x0 < 0, x0 + 65536, x0)  # two's complement as u16
    head = jnp.stack(
        [
            (x0u % 256).astype(jnp.uint8),
            (x0u // 256).astype(jnp.uint8),
            jnp.zeros((B, No), jnp.uint8),
            jnp.zeros((B, No), jnp.uint8),
        ],
        axis=-1,
    ).reshape(B, 4 * No)
    return jnp.concatenate([head, payload], axis=1)  # [B, block_align]


def decode_ima_chunk(rows: np.ndarray, num_channels: int,
                     frames: int) -> np.ndarray:
    """Host-side decode of :func:`encode_ima_chunk` output: uint8
    ``[B, block_align]`` → int16 ``[B, num_channels, frames]`` (the pad
    frame dropped).  Thin wrapper over the host reference decoder."""
    from ..utils.adpcm import decode_ima_blocks

    rows = np.asarray(rows, np.uint8)
    ba = chunk_block_align(num_channels, frames)
    if rows.ndim == 1:
        rows = rows[None]
    assert rows.shape[1] == ba, (rows.shape, ba)
    out = np.empty((rows.shape[0], num_channels, frames), np.int16)
    for b in range(rows.shape[0]):
        dec = decode_ima_blocks(rows[b].tobytes(), num_channels, ba)
        out[b] = dec[:, :frames]
    return out
