"""ZeRO-style optimizer-state (and optional parameter) sharding.

Reference analog: the DeepSpeed strategy hooks in ``main.py`` (the reference
accepts deepspeed_stage configs through Lightning; SURVEY.md §2.7 row
"ZeRO / optimizer-state sharding").  TPU-native design: instead of a runtime
that partitions optimizer buffers imperatively, every optimizer-state leaf
gets a ``NamedSharding`` that splits its largest mesh-divisible axis over the
mesh's data axis (ZeRO-1: state sharded, params replicated; for
ZeRO-3-style parameter sharding apply the same rules to the param tree —
``zero_shardings(params, plan)`` works on any pytree).  XLA then keeps
each shard resident on its device and emits the all-gathers/reduce-scatters
the update needs — no hand-written collectives.

Usage:
    rules = zero_shardings(opt_state, plan)             # pytree of shardings
    opt_state = jax.device_put(opt_state, rules)        # or jit out_shardings
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshPlan


def _leaf_spec(shape, n_shards: int, axis: str) -> P:
    """Shard the largest axis divisible by n_shards over mesh axis ``axis``;
    replicate otherwise.  Tiny leaves (scalars, norms, counts) stay
    replicated."""
    if not shape or int(np.prod(shape)) < 2 * n_shards:
        return P()
    best_axis, best_size = None, 0
    for i, s in enumerate(shape):
        if s % n_shards == 0 and s > best_size:
            best_axis, best_size = i, s
    if best_axis is None:
        return P()
    spec = [None] * len(shape)
    return P(*spec[:best_axis], axis, *spec[best_axis + 1:])


def zero_shardings(tree: Any, plan: MeshPlan) -> Any:
    """Pytree of NamedShardings mirroring `tree` (optimizer state or params)."""
    n = plan.n_data

    def leaf(x):
        shape = getattr(x, "shape", ())
        return NamedSharding(plan.mesh,
                             _leaf_spec(tuple(shape), n, plan.data_axis))

    return jax.tree_util.tree_map(leaf, tree)


def apply_zero(tree: Any, plan: MeshPlan) -> Any:
    """Place `tree` with ZeRO shardings (device_put keeps values intact)."""
    return jax.device_put(tree, zero_shardings(tree, plan))
