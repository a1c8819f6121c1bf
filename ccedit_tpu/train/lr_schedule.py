"""LR multiplier schedules.

Parity target: sgm/lr_scheduler.py:4-135 — lambda-style multipliers applied
on top of a base LR (the reference feeds these to LambdaLR; here they are
plain step->float callables usable with optax.scale_by_schedule).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def tabulate_schedule(sched, num_steps: int, base_lr: float = 1.0):
    """Turn a host-Python step->multiplier schedule into a traceable optax
    schedule: precompute the table once on host, index with jnp.take under
    jit (the schedules above branch on Python ints and cannot trace).
    Steps past the table clamp to the final value."""
    import jax.numpy as jnp

    table = jnp.asarray(
        np.array([base_lr * float(sched(n)) for n in range(num_steps + 1)],
                 dtype=np.float32)
    )

    def schedule_fn(step):
        idx = jnp.clip(jnp.asarray(step, jnp.int32), 0, num_steps)
        return jnp.take(table, idx)

    return schedule_fn


class LambdaWarmUpCosineScheduler:
    """Linear warmup then cosine from lr_max to lr_min over lr_max_decay_steps."""

    def __init__(self, warm_up_steps, lr_min, lr_max, lr_start, max_decay_steps, verbosity_interval=0):
        self.lr_warm_up_steps = warm_up_steps
        self.lr_start = lr_start
        self.lr_min = lr_min
        self.lr_max = lr_max
        self.lr_max_decay_steps = max_decay_steps
        self.last_lr = 0.0

    def schedule(self, n: int) -> float:
        if n < self.lr_warm_up_steps:
            lr = (self.lr_max - self.lr_start) / self.lr_warm_up_steps * n + self.lr_start
        else:
            t = (n - self.lr_warm_up_steps) / (self.lr_max_decay_steps - self.lr_warm_up_steps)
            t = min(t, 1.0)
            lr = self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (1 + np.cos(t * np.pi))
        self.last_lr = lr
        return lr

    def __call__(self, n: int) -> float:
        return self.schedule(n)


class _CycledScheduler:
    def __init__(self, warm_up_steps: Sequence[int], f_min, f_max, f_start, cycle_lengths):
        assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) == len(cycle_lengths)
        self.lr_warm_up_steps = list(warm_up_steps)
        self.f_start = list(f_start)
        self.f_min = list(f_min)
        self.f_max = list(f_max)
        self.cycle_lengths = list(cycle_lengths)
        self.cum_cycles = np.cumsum([0] + self.cycle_lengths)

    def find_in_interval(self, n: int) -> int:
        for i, cl in enumerate(self.cum_cycles[1:]):
            if n <= cl:
                return i
        return len(self.cycle_lengths) - 1


class LambdaWarmUpCosineScheduler2(_CycledScheduler):
    """Cosine with multiple cycles (lr_scheduler.py:54-101)."""

    def schedule(self, n: int) -> float:
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            return (
                (self.f_max[cycle] - self.f_start[cycle]) / self.lr_warm_up_steps[cycle] * n
                + self.f_start[cycle]
            )
        t = (n - self.lr_warm_up_steps[cycle]) / (
            self.cycle_lengths[cycle] - self.lr_warm_up_steps[cycle]
        )
        t = min(t, 1.0)
        return self.f_min[cycle] + 0.5 * (self.f_max[cycle] - self.f_min[cycle]) * (
            1 + np.cos(t * np.pi)
        )

    def __call__(self, n: int) -> float:
        return self.schedule(n)


class LambdaLinearScheduler(_CycledScheduler):
    """Warmup then linear interpolation to f_min over the cycle
    (lr_scheduler.py:104-135) — the schedule CCEdit's training configs use."""

    def schedule(self, n: int) -> float:
        cycle = self.find_in_interval(n)
        n = n - self.cum_cycles[cycle]
        if n < self.lr_warm_up_steps[cycle]:
            return (
                (self.f_max[cycle] - self.f_start[cycle]) / self.lr_warm_up_steps[cycle] * n
                + self.f_start[cycle]
            )
        return self.f_min[cycle] + (self.f_max[cycle] - self.f_min[cycle]) * (
            self.cycle_lengths[cycle] - n
        ) / self.cycle_lengths[cycle]

    def __call__(self, n: int) -> float:
        return self.schedule(n)
