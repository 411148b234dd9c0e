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
portable; swap in orbax for sharded multi-host arrays if state ever grows
past host memory (audio state never does).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "restore_into"]

_STATE_FILE = "state.msgpack"
_META_FILE = "meta.json"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


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
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=2)


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
