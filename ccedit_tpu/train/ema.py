"""Exponential moving average of parameters.

Parity target: sgm/modules/ema.py:5-86 (LitEma): warmup decay
``min(decay, (1+n)/(10+n))``, shadow copy, store/copy_to/restore scope.
Functional: EmaState is a pytree, update is jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EmaState:
    shadow: Any
    num_updates: jnp.ndarray  # scalar int32
    decay: float = 0.9999
    use_num_updates: bool = True

    @classmethod
    def create(cls, params, decay: float = 0.9999, use_num_updates: bool = True):
        # copy, don't alias: the shadow seeds from the live param buffers, and
        # an aliased leaf makes jit donation of the TrainState donate the same
        # buffer twice (INVALID_ARGUMENT on the single-device path, where no
        # device_put re-materializes the tree)
        return cls(
            shadow=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params),
            num_updates=jnp.asarray(0, dtype=jnp.int32),
            decay=decay,
            use_num_updates=use_num_updates,
        )

    def update(self, params) -> "EmaState":
        n = self.num_updates + 1
        if self.use_num_updates:
            decay = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        else:
            decay = jnp.asarray(self.decay)
        one_minus = 1.0 - decay
        shadow = jax.tree_util.tree_map(
            lambda s, p: s - one_minus * (s - p), self.shadow, params
        )
        return EmaState(shadow, n, self.decay, self.use_num_updates)


jax.tree_util.register_pytree_node(
    EmaState,
    lambda s: ((s.shadow, s.num_updates), (s.decay, s.use_num_updates)),
    lambda aux, children: EmaState(children[0], children[1], aux[0], aux[1]),
)
