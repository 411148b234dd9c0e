"""Checkpoint/resume: persist and restore engine state.

The reference has no checkpointing (SURVEY §5: closest is deactivate
returning the user context, context.rs:162-211).  In the TPU engine all
recurrent audio state — phasors, smoothers, filter taps, delay lines,
playheads, meters — is one explicit pytree, so checkpointing falls out for
free: snapshot the state dict (plus, via ``extra_meta``, the stream
position — ``FirewheelCtx.save_checkpoint`` does this) and a later process
resumes sample-exactly.  Node *params* are plain host attributes owned by
the caller (a game's own data model); persist them alongside via
``extra_meta`` or the caller's own save format.

Format: a directory containing
* ``state.msgpack``  — the state pytree (flax.serialization msgpack);
* ``meta.json``      — sample rate, block size, stream position, node keys.

``flax.serialization`` keeps the dependency footprint minimal and the files
portable.

**Sharded fleets** (a dp-sharded :class:`~firewheel_tpu.parallel.mesh.
BatchRenderer` spanning hosts — the SERVING.md story): per-process shard
files.  Each process writes only its *addressable* slice of the batch axis
(``state.rank<k>.msgpack``), rank 0 writes the fleet metadata, and restore
lifts each process's slice back through
``jax.make_array_from_process_local_data`` — no host ever gathers the
global array, so checkpoints scale with per-host state, not fleet size.
Entry points: :meth:`BatchRenderer.save_checkpoint` /
:meth:`BatchRenderer.restore_checkpoint`, built on
:func:`save_sharded_checkpoint` / :func:`load_sharded_local` here.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "restore_into",
    "save_sharded_checkpoint",
    "load_sharded_local",
]

_STATE_FILE = "state.msgpack"
_META_FILE = "meta.json"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


# ---------------------------------------------------------------------------
# Sharded (per-process) checkpointing
# ---------------------------------------------------------------------------

def _local_slice(x):
    """This process's contiguous slice of a leading-axis-sharded array.

    ``np.asarray`` on an array spanning non-addressable devices gathers or
    faults; instead concatenate the *addressable* shards in index order.
    Replicated leaves (every shard covers the full array) dedupe to one
    copy."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    try:
        shards = x.addressable_shards
    except (AttributeError, RuntimeError):
        return np.asarray(x)
    by_start: dict[int, np.ndarray] = {}
    for s in shards:
        # only leading-axis (batch) sharding and replication are
        # reconstructible from per-start dedup; a leaf sharded along a
        # trailing axis would silently lose data here — refuse instead
        for d, idx in enumerate((s.index or ())[1:], start=1):
            if isinstance(idx, slice) and not (
                idx.start in (None, 0)
                and idx.stop in (None, x.shape[d])
            ):
                raise ValueError(
                    "save_sharded_checkpoint supports leading-axis "
                    f"(batch) sharding only; got shard index {s.index} "
                    f"on a leaf of shape {x.shape}"
                )
        idx = s.index[0] if s.index else slice(None)
        start = idx.start if isinstance(idx, slice) and idx.start else 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    parts = [by_start[k] for k in sorted(by_start)]
    return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)


def save_sharded_checkpoint(
    path: str, state, meta: dict | None = None
) -> None:
    """Write this process's shard of a (possibly multi-host) sharded state
    pytree to ``path``; rank 0 also writes the fleet metadata.

    Every process of the fleet must call this with the same ``path`` (a
    shared filesystem) and the same logical state.  Single-process use
    degenerates to one ``state.rank0.msgpack`` holding everything.
    """
    from flax import serialization

    rank = jax.process_index()
    os.makedirs(path, exist_ok=True)
    local = jax.tree.map(_local_slice, state)
    with open(os.path.join(path, f"state.rank{rank}.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(local))
    if rank == 0:
        full_meta = {
            "sharded": True,
            "process_count": jax.process_count(),
            "node_keys": sorted(state.keys())
            if isinstance(state, dict)
            else None,
        }
        if meta:
            reserved = set(full_meta) & set(meta)
            if reserved:
                raise ValueError(
                    f"meta uses reserved keys {sorted(reserved)}; nest user "
                    "metadata under your own key instead"
                )
            full_meta.update(meta)
        # atomic publish: other ranks poll for this file and read it
        # the moment it exists — a plain open/dump lets them see a
        # half-written JSON (raced in tests under load)
        tmp = os.path.join(path, f".{_META_FILE}.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            json.dump(full_meta, f, indent=2)
        os.replace(tmp, os.path.join(path, _META_FILE))


def load_sharded_local(path: str, local_template, *,
                       global_batch: int | None = None):
    """Load this process's shard back → ``(local_state, meta)``.

    ``local_template``: a pytree with the *local* (per-process) structure
    and shapes — e.g. ``jax.tree.map(_local_slice, renderer.init_state())``.
    The caller lifts the result onto devices
    (``jax.make_array_from_process_local_data`` for multi-host meshes).

    **Resharding** (fleet elasticity, SERVING.md): when the checkpoint
    was written by a DIFFERENT number of processes, pass
    ``global_batch`` (the leading-axis extent every leaf shares — the
    fleet's batch/capacity).  Each new process then reads exactly the
    old rank files overlapping its slice of ``[0, global_batch)``,
    concatenates, and re-slices — no process ever materializes the
    global array, so restores stay O(per-host state) in both
    directions (grow or shrink).  Without ``global_batch`` a
    process-count mismatch raises, as before.
    """
    from flax import serialization

    rank = jax.process_index()
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    old_count = meta.get("process_count")
    new_count = jax.process_count()
    if old_count != new_count:
        if global_batch is None:
            raise ValueError(
                f"fleet size mismatch: checkpoint has {old_count} "
                f"processes, this fleet has {new_count} (pass "
                "global_batch= to reshard)"
            )
        return _load_resharded(path, local_template, meta,
                               int(global_batch)), meta
    with open(os.path.join(path, f"state.rank{rank}.msgpack"), "rb") as f:
        local = serialization.from_bytes(_to_host(local_template), f.read())
    return local, meta


def _load_resharded(path: str, local_template, meta: dict,
                    global_batch: int):
    """Rebuild this process's ``[global_batch/Q]`` slice from a
    checkpoint written by ``P ≠ Q`` processes (each old rank file holds
    a contiguous ``[global_batch/P]`` slice of every leaf's leading
    axis)."""
    from flax import serialization

    P = int(meta["process_count"])
    Q = jax.process_count()
    r = jax.process_index()
    if global_batch % P or global_batch % Q:
        raise ValueError(
            f"global_batch {global_batch} must divide by both the "
            f"checkpoint's process count ({P}) and this fleet's ({Q})"
        )
    old_per = global_batch // P
    new_per = global_batch // Q
    host_template = _to_host(local_template)
    leaves = jax.tree.leaves(host_template)
    for leaf in leaves:
        if np.shape(leaf)[:1] != (new_per,):
            raise ValueError(
                "resharded restore needs every leaf batched on the "
                f"leading axis with extent {new_per}; got shape "
                f"{np.shape(leaf)}"
            )
    # the per-rank template: same per-instance shapes, old_per-leading
    old_template = jax.tree.map(
        lambda x: np.broadcast_to(
            np.asarray(x)[:1], (old_per,) + np.shape(x)[1:]
        ).copy(),
        host_template,
    )
    start, end = r * new_per, (r + 1) * new_per
    parts = []
    for k in range(start // old_per, (end - 1) // old_per + 1):
        with open(os.path.join(path, f"state.rank{k}.msgpack"), "rb") as f:
            old_local = serialization.from_bytes(old_template, f.read())
        lo = max(start - k * old_per, 0)
        hi = min(end - k * old_per, old_per)
        parts.append(jax.tree.map(
            lambda x, lo=lo, hi=hi: np.asarray(x)[lo:hi], old_local
        ))
    if len(parts) == 1:
        return parts[0]
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *parts)


def save_checkpoint(path: str, processor, extra_meta: dict | None = None) -> None:
    """Write the processor's full recurrent state to ``path`` (a directory).

    ``processor``: a :class:`~firewheel_tpu.processor.GraphProcessor` (or
    anything with ``_state``, ``sample_rate``, ``max_block_frames``).
    """
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    state = _to_host(processor.state_dict())
    with open(os.path.join(path, _STATE_FILE), "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = {
        "sample_rate": processor.sample_rate,
        "max_block_frames": processor.max_block_frames,
        "node_keys": sorted(state.keys()),
    }
    if extra_meta:
        # the keys restore_into validates against must not be clobbered by
        # caller metadata
        reserved = set(meta) & set(extra_meta)
        if reserved:
            raise ValueError(
                f"extra_meta uses reserved keys {sorted(reserved)}; nest "
                "user metadata under your own key instead"
            )
        meta.update(extra_meta)
    tmp = os.path.join(path, f".{_META_FILE}.{os.getpid()}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(path, _META_FILE))  # atomic publish


def load_checkpoint(path: str, template: Any):
    """Load a checkpoint against a ``template`` state pytree (for structure)
    → ``(state, meta)``."""
    from flax import serialization

    with open(os.path.join(path, _STATE_FILE), "rb") as f:
        state = serialization.from_bytes(_to_host(template), f.read())
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    return state, meta


def restore_into(path: str, processor) -> dict:
    """Restore a checkpoint into a live processor.

    The processor's graph must have the same node set (keys are validated);
    returns the checkpoint metadata.
    """
    current = processor.state_dict()
    state, meta = load_checkpoint(path, current)
    have = sorted(current.keys())
    want = meta.get("node_keys", have)
    if have != want:
        missing = set(want) - set(have)
        extra = set(have) - set(want)
        raise ValueError(
            "checkpoint/graph mismatch: "
            f"missing nodes {sorted(missing)}, unexpected {sorted(extra)}"
        )
    if meta.get("sample_rate") != processor.sample_rate:
        raise ValueError(
            f"sample-rate mismatch: checkpoint {meta.get('sample_rate')} vs "
            f"engine {processor.sample_rate}"
        )
    # block-size-dependent state (FDLs, delay lines) would load wrong-shaped
    if meta.get("max_block_frames") != processor.max_block_frames:
        raise ValueError(
            "max_block_frames mismatch: checkpoint "
            f"{meta.get('max_block_frames')} vs engine "
            f"{processor.max_block_frames}"
        )
    import jax.numpy as jnp

    processor.set_state_dict(jax.tree.map(lambda x: jnp.asarray(x), state))
    return meta
