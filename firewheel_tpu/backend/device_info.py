"""Backend device descriptors.

Mirrors ``crates/firewheel-graph/src/backend.rs:1-6`` (``DeviceInfo``) and the
cpal enumeration (``firewheel-cpal/src/lib.rs:44-97``) — here the "output
devices" are the attached XLA accelerators.
"""

from __future__ import annotations

import dataclasses

__all__ = ["DeviceInfo", "available_output_devices"]


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    name: str
    num_channels: int
    is_default: bool


def available_output_devices(num_channels: int = 2) -> list[DeviceInfo]:
    """Enumerate render devices (the TPU/CPU chips JAX sees)."""
    import jax

    devices = []
    for i, d in enumerate(jax.devices()):
        devices.append(
            DeviceInfo(
                name=f"{d.platform}:{d.id} ({getattr(d, 'device_kind', '?')})",
                num_channels=num_channels,
                is_default=(i == 0),
            )
        )
    return devices
