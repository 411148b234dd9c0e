"""Multi-host scale-out: DCN process groups for batch sharding.

SURVEY §5's communication-backend mapping: batch parallelism over instances
rides ICI within a pod slice and **DCN across hosts** — audio graphs are
embarrassingly parallel across instances, so multi-host needs no
collectives in the hot loop at all (and voice-parallel ``psum`` stays
within a slice where it rides ICI).

Usage on each host of a multi-host deployment::

    from firewheel_tpu.parallel import initialize_multihost, make_mesh

    initialize_multihost(coordinator="10.0.0.1:1234",
                         num_processes=4, process_id=HOST_RANK)
    mesh = make_mesh({"dp": jax.device_count()})   # global devices
    renderer = BatchRenderer(program, batch=GLOBAL_BATCH, mesh=mesh)

Each host then feeds params/fetches audio for its addressable shard
(``jax.local_devices()``); `jax.make_array_from_process_local_data` bridges
host-local numpy to the global batch axis.

This module is a thin, documented wrapper over ``jax.distributed`` — kept
separate so single-host users never touch it.
"""

from __future__ import annotations

import jax

__all__ = ["initialize_multihost", "local_batch_slice"]


def initialize_multihost(
    coordinator: str, num_processes: int, process_id: int, **kwargs
) -> None:
    """Join the multi-host process group (call before any backend use)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def local_batch_slice(global_batch: int) -> slice:
    """The slice of the global instance batch this host owns under a pure
    "dp" sharding (contiguous per-process blocks)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
