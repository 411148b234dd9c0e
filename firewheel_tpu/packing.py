"""Pytree packing: collapse hundreds of tiny leaves into a few arrays.

A realistic graph has hundreds of nodes, each staging a handful of scalar
params and carrying a handful of scalar state leaves.  Dispatching a jitted
program with ~700 separate arguments costs per-argument marshaling (and on
remote transports, per-buffer round trips) that dwarfs the device work —
measured ~1.5 s per block for a 260-node scene over the axon tunnel.

The packer groups pytree leaves by ``(dtype, shape)`` and stacks each group
into ONE array, so a dispatch carries ~4 packed arrays + any large
device-resident leaves (sample windows, IR spectra) as passthrough.  Inside
the traced function the pytree is reconstituted by slicing — free after
fusion.  Packed form is also kept *between* calls for recurrent state, so
steady-state streaming moves O(4) buffers per block instead of O(nodes).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import jax.numpy as jnp

__all__ = ["Packer"]


def _is_device(x) -> bool:
    return isinstance(x, jax.Array)


class Packer:
    """Structure-locked packer built from an example pytree.

    ``pack(tree)`` → ``(groups: dict[key, array], passthrough: list)``;
    ``unpack(groups, passthrough)`` inverts it (traceable).

    Leaves that are already device arrays in the example (large buffers)
    stay passthrough; everything else groups by (dtype, shape).
    """

    def __init__(self, example: Any):
        leaves, self.treedef = jax.tree.flatten(example)
        self.num_leaves = len(leaves)
        self._group_idx: dict[str, list[int]] = {}
        self._group_spec: dict[str, tuple] = {}
        self._pass_idx: list[int] = []
        for i, leaf in enumerate(leaves):
            # EVERY device array passes through, regardless of size: a
            # leaf's device-ness is stable (e.g. the sampler's sample is
            # always jnp, empty placeholder or real clip) while its SHAPE
            # may change — grouping by example shape would crash or
            # silently re-copy large buffers when it does.
            if _is_device(leaf):
                self._pass_idx.append(i)
                continue
            arr = np.asarray(leaf)
            key = f"{arr.dtype}:{arr.shape}"
            self._group_idx.setdefault(key, []).append(i)
            self._group_spec[key] = (arr.dtype, arr.shape)
        self.group_keys = sorted(self._group_idx)

    # -- host side -------------------------------------------------------------
    def pack(self, tree):
        leaves, treedef = jax.tree.flatten(tree)
        # leaf-count alone would let a same-count structural change route
        # values to the wrong nodes — compare the full treedef (a hard
        # error, not an assert: must survive `python -O`)
        if treedef != self.treedef:
            raise ValueError(
                f"pytree structure changed since the packer was built:\n"
                f"  was: {self.treedef}\n  now: {treedef}"
            )
        groups = {}
        for key in self.group_keys:
            idxs = self._group_idx[key]
            members = [leaves[i] for i in idxs]
            dtype, shape = self._group_spec[key]
            groups[key] = np.stack([np.asarray(m, dtype) for m in members])
        passthrough = [leaves[i] for i in self._pass_idx]
        return groups, passthrough

    # -- traceable inverse -------------------------------------------------------
    def unpack(self, groups, passthrough):
        leaves: list = [None] * self.num_leaves
        for key in self.group_keys:
            arr = groups[key]
            for j, i in enumerate(self._group_idx[key]):
                leaves[i] = arr[j]
        for j, i in enumerate(self._pass_idx):
            leaves[i] = passthrough[j]
        return jax.tree.unflatten(self.treedef, leaves)

    def repack_traced(self, tree):
        """Pack inside a trace (device-side stacks) — used to return state
        in packed form from a jitted step."""
        leaves = jax.tree.leaves(tree)
        groups = {
            key: jnp.stack([leaves[i] for i in self._group_idx[key]])
            for key in self.group_keys
        }
        passthrough = [leaves[i] for i in self._pass_idx]
        return groups, passthrough
