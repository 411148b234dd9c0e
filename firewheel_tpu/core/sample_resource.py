"""PCM sample resources: device-resident audio clips for playback.

Reference: the ``SampleResource`` trait and its twelve container impls
(``crates/firewheel-core/src/sample_resource.rs:4-456``).  The reference
stores host PCM in many layouts (interleaved/deinterleaved × i16/u16/f32 ×
owned/Arc) and converts lazily in ``fill_buffers``.  TPU-native design:
**convert once at load time** to a channel-major float32 device array
``[channels, frames]`` — playback then becomes a pure gather
(``dynamic_slice``) inside the compiled graph, and the same array is shared
by any number of sampler voices (the ``Arc`` impls collapse into JAX's
immutable buffer sharing).

Conversion formulas match sample_resource.rs:338-345:
``i16 → f32``: ``s / 32767``;  ``u16 → f32``: ``s * (2/65535) - 1``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SampleResource",
    "pcm_i16_to_f32",
    "pcm_u16_to_f32",
    "pcm_f32_to_i16",
]


def pcm_i16_to_f32(data: np.ndarray) -> np.ndarray:
    """``f32(s) * (1/32767)`` (sample_resource.rs:338-340)."""
    return (
        np.asarray(data, np.int16).astype(np.float32) * np.float32(1.0 / 32767.0)
    ).astype(np.float32)


def pcm_f32_to_i16(x):
    """f32 → int16 PCM, traceable: ``round(clip(x, ±1) * 32767)``.

    The inverse of :func:`pcm_i16_to_f32` (sample_resource.rs:338-340):
    every value that converter can produce round-trips exactly (golden-
    tested over the full int16 range).  −32768 is unreachable by design —
    the reference's ÷32767 scale never emits it either, and symmetric
    clipping keeps 0.0 ↔ 0 exact.  Works on numpy arrays and under jit
    (this is the device-side serving output path,
    ``BatchRenderer(output_format="pcm16")``).
    """
    import jax.numpy as jnp

    x = jnp.clip(jnp.asarray(x, jnp.float32), -1.0, 1.0)
    return jnp.round(x * np.float32(32767.0)).astype(jnp.int16)


def pcm_u16_to_f32(data: np.ndarray) -> np.ndarray:
    """``f32(s) * (2/65535) - 1`` (sample_resource.rs:343-345)."""
    return (
        np.asarray(data, np.uint16).astype(np.float32) * np.float32(2.0 / 65535.0)
        - np.float32(1.0)
    ).astype(np.float32)


class SampleResource:
    """A float32, channel-major audio clip, optionally device-resident.

    Constructors cover every layout the reference supports
    (sample_resource.rs:28-335); all normalize into one canonical form.
    """

    def __init__(
        self,
        channels: np.ndarray,
        *,
        sample_rate: "float | None" = None,
        device: bool = True,
    ):
        """``sample_rate``: the clip's native rate in Hz, if known.  A
        sampler playing a rated clip into a stream of a different rate
        auto-scales its playback rate (44.1 kHz clip in a 48 kHz stream
        plays at native pitch), and seconds-based seeks/loops address
        CLIP time.  ``None`` (the reference's behavior — PCM carries no
        rate, sample_resource.rs:4-26) means "assume the stream rate"."""
        channels = np.atleast_2d(np.asarray(channels, np.float32))
        assert channels.ndim == 2, "expected [channels, frames]"
        self.sample_rate = float(sample_rate) if sample_rate else None
        self._host = channels
        self._device = None
        if device:
            import jax.numpy as jnp

            self._device = jnp.asarray(channels)

    # -- constructors mirroring the reference's impl matrix ------------------
    @classmethod
    def from_interleaved_i16(cls, data, num_channels: int, **kw) -> "SampleResource":
        d = np.asarray(data, np.int16).reshape(-1, num_channels)
        return cls(pcm_i16_to_f32(d).T, **kw)

    @classmethod
    def from_interleaved_u16(cls, data, num_channels: int, **kw) -> "SampleResource":
        d = np.asarray(data, np.uint16).reshape(-1, num_channels)
        return cls(pcm_u16_to_f32(d).T, **kw)

    @classmethod
    def from_interleaved_f32(cls, data, num_channels: int, **kw) -> "SampleResource":
        d = np.asarray(data, np.float32).reshape(-1, num_channels)
        return cls(d.T, **kw)

    @classmethod
    def from_channels_i16(cls, channels, **kw) -> "SampleResource":
        return cls(np.stack([pcm_i16_to_f32(c) for c in channels]), **kw)

    @classmethod
    def from_channels_u16(cls, channels, **kw) -> "SampleResource":
        return cls(np.stack([pcm_u16_to_f32(c) for c in channels]), **kw)

    @classmethod
    def from_channels_f32(cls, channels, **kw) -> "SampleResource":
        return cls(np.stack([np.asarray(c, np.float32) for c in channels]), **kw)

    # -- queries (sample_resource.rs:5-11) ------------------------------------
    @property
    def num_channels(self) -> int:
        return self._host.shape[0]

    @property
    def len_frames(self) -> int:
        return self._host.shape[1]

    @property
    def data(self):
        """The device array ``f32[channels, frames]`` (host array if the
        resource was created with ``device=False``)."""
        return self._device if self._device is not None else self._host

    @property
    def host_data(self) -> np.ndarray:
        return self._host

    # -- host-side fill (the reference's fill_buffers, rs:13-26) -------------
    def fill_buffers(
        self, buffers: np.ndarray, buffer_range: range, start_frame: int
    ) -> None:
        """Copy ``len(buffer_range)`` frames starting at ``start_frame`` into
        ``buffers[ch, buffer_range]``; extra buffers are ignored; reads past
        the clip end are zero-filled (reference leaves them untouched only
        because callers pre-trim — we zero-fill, which is what every caller
        needs)."""
        lo, hi = buffer_range.start, buffer_range.stop
        n = hi - lo
        ch = min(buffers.shape[0], self.num_channels)
        avail = max(0, min(n, self.len_frames - start_frame))
        if avail > 0:
            buffers[:ch, lo : lo + avail] = self._host[
                :ch, start_frame : start_frame + avail
            ]
        if avail < n:
            buffers[:ch, lo + avail : hi] = 0.0
