"""Semantics-preserving jaxpr equation reordering.

Escape hatch for the axon TPU tunnel's sticky spurious ``UNIMPLEMENTED``
server-side compiles (docs/KNOWN_ISSUES.md): round-1 evidence showed that a
module with the SAME ops — differing only in instruction order (zero
op-histogram difference, ordering-only StableHLO text diff) — compiles and
runs fine seconds later on the same chip.  This module manufactures exactly
that transformation for any traced program: re-emit the jaxpr's equations
in a different valid topological order (recursing into scan/cond/while
sub-jaxprs, where a streaming render's hot ops actually live).

The permutation preserves the SSA dataflow graph exactly — same equations,
same producers/consumers — so results are identical; only the textual
emission order (and thus the serialized module the server sees) changes.
Used by ``executor._ResilientJit`` as retry attempts 2-3; correctness is
golden-tested (bit-exact vs the unshuffled program) in
tests/test_resilient_jit.py.
"""

from __future__ import annotations

import jax
from jax.extend.core import ClosedJaxpr, Jaxpr, Literal, jaxpr_as_fun

__all__ = ["permute_closed_jaxpr", "shuffled"]

# Deterministic mixing constants (Knuth / xorshift-ish) for the seeded
# ready-queue pick; seed 0 reproduces the original order exactly.
_A = 2654435761
_B = 40503


def _permute_eqns(eqns, seed: int):
    """Return ``eqns`` in a seed-chosen valid topological order.

    Dependencies are the SSA def-use edges (an equation using var ``v``
    must follow the equation producing ``v``).  Jaxprs are pure SSA — vars
    are assigned once — so def-use is the complete constraint set.  Any
    equation carrying effects disables reordering (conservative; render
    programs are pure).
    """
    n = len(eqns)
    if n < 2:
        return eqns
    if any(eq.effects for eq in eqns):
        return eqns

    producer = {}
    for i, eq in enumerate(eqns):
        for v in eq.outvars:
            producer[v] = i
    succ = [[] for _ in range(n)]
    indeg = [0] * n
    for j, eq in enumerate(eqns):
        seen = set()
        for v in eq.invars:
            if isinstance(v, Literal):
                continue
            i = producer.get(v)
            if i is not None and i != j and i not in seen:
                succ[i].append(j)
                indeg[j] += 1
                seen.add(i)

    ready = [i for i in range(n) if indeg[i] == 0]
    order = []
    step = 0
    while ready:
        if seed == 0:
            p = 0
        else:
            p = (seed * _A + step * _B) % len(ready)
        # keep `ready` ascending so seed 0 = smallest-ready-index = the
        # original order (original indices ARE a topological labeling)
        i = ready.pop(p)
        order.append(i)
        step += 1
        newly = []
        for j in succ[i]:
            indeg[j] -= 1
            if indeg[j] == 0:
                newly.append(j)
        for j in sorted(newly):
            # insertion keeping ascending order
            lo, hi = 0, len(ready)
            while lo < hi:
                mid = (lo + hi) // 2
                if ready[mid] < j:
                    lo = mid + 1
                else:
                    hi = mid
            ready.insert(lo, j)
    assert len(order) == n, "cycle in jaxpr def-use graph?"
    return [eqns[i] for i in order]


def _permute_param(v, seed: int):
    """Recursively permute jaxpr-valued equation params (scan's ``jaxpr``,
    cond's ``branches``, while's ``cond_jaxpr``/``body_jaxpr``, custom-call
    ``call_jaxpr``, ...)."""
    if isinstance(v, ClosedJaxpr):
        return ClosedJaxpr(_permute_jaxpr(v.jaxpr, seed), v.consts)
    if isinstance(v, Jaxpr):
        return _permute_jaxpr(v, seed)
    if isinstance(v, (tuple, list)):
        out = [_permute_param(x, seed) for x in v]
        if all(a is b for a, b in zip(out, v)):
            return v
        return type(v)(out)
    return v


def _permute_jaxpr(jaxpr: Jaxpr, seed: int) -> Jaxpr:
    new_eqns = []
    for eq in jaxpr.eqns:
        new_params = {}
        changed = False
        for k, v in eq.params.items():
            # inner bodies shuffle too (with a varied seed); seed 0 stays
            # the identity at every depth
            pv = _permute_param(v, seed + 1 if seed else 0)
            new_params[k] = pv
            changed = changed or (pv is not v)
        new_eqns.append(eq.replace(params=new_params) if changed else eq)
    new_eqns = _permute_eqns(new_eqns, seed)
    return jaxpr.replace(eqns=new_eqns)


def permute_closed_jaxpr(closed: ClosedJaxpr, seed: int) -> ClosedJaxpr:
    """Seed-permuted, semantically identical copy of ``closed``."""
    return ClosedJaxpr(_permute_jaxpr(closed.jaxpr, seed), closed.consts)


def shuffled(fn, seed: int):
    """Wrap ``fn`` so its trace is re-emitted in a permuted equation order.

    The wrapper traces ``fn`` to a jaxpr (abstractly — works under jit),
    permutes the equation order with ``seed``, and evaluates the permuted
    program.  Identical results; different serialized module.
    """

    def wrapper(*args):
        flat, treedef = jax.tree.flatten(args)

        def flat_fn(*leaves):
            return fn(*jax.tree.unflatten(treedef, leaves))

        closed, out_shape = jax.make_jaxpr(flat_fn, return_shape=True)(*flat)
        out_tree = jax.tree.structure(
            out_shape, is_leaf=lambda x: x is None
        )
        results = jaxpr_as_fun(permute_closed_jaxpr(closed, seed))(*flat)
        return jax.tree.unflatten(out_tree, results)

    wrapper.__name__ = f"{getattr(fn, '__name__', 'fn')}_shuffle{seed}"
    wrapper.__qualname__ = wrapper.__name__
    return wrapper
