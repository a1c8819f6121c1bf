"""Multi-chip sampling: shard ONE clip across the mesh.

SURVEY.md §2.7/§5: spatial ops run on the folded (B·T) frame axis, so a
single clip parallelizes across chips by sharding the frame (T) axis — each
device carries T/n frames through every 2D conv and spatial attention, and
XLA inserts collectives only at the cheap temporal ops (kernel-3 1D convs and
T-token attention at T=17) and at the CFCA center-frame taps.  The reference
has no analog: its DDP (main.py:814-831) can only parallelize over
independent clips.

Everything here is sharding annotation + jit — collectives are emitted by
XLA over ICI (the scaling-book recipe: mesh, annotate, let the compiler
insert the comms).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MeshPlan

# conditioning entries carrying per-frame (T at dim 1) and spatial (H,W at
# dims 2,3) axes — video-shaped tensors (control_hint_features is the
# precomputed latent-res hint pyramid from encode_control_hint)
_CLIP_KEYS = ("control_hint", "control_hint_features", "concat")


def pick_clip_axis(plan: MeshPlan, shape: Sequence[int]) -> int:
    """Choose which latent axis to shard: the frame axis (1) when T divides
    the mesh — zero-comm spatial ops, collectives only at temporal ops — else
    the height axis (2): convs take halo exchanges, and because H is the
    outer dim of the (h w) token flatten the sharding survives into the
    spatial-attention token axis contiguously (q stays sharded, k/v gather).
    The production T=17 clip at 512x768 has H/8 = 64 = 8x8."""
    n = plan.n_data
    t = shape[1]
    if t % n == 0:
        return 1
    if len(shape) > 2 and shape[2] % n == 0:
        return 2
    if len(shape) > 3 and shape[3] % n == 0:
        return 3
    raise ValueError(
        f"no shardable clip axis for shape {tuple(shape)} over {n} devices"
    )


def _clip_spec(plan: MeshPlan, ndim: int, axis: int) -> P:
    spec = [None] * ndim
    spec[axis] = plan.data_axis
    return P(*spec)


def clip_sharding(plan: MeshPlan, ndim: int, axis: int) -> NamedSharding:
    return NamedSharding(plan.mesh, _clip_spec(plan, ndim, axis))


def shard_clip_cond(plan: MeshPlan, cond: Dict, shape: Sequence[int],
                    axis: int) -> Dict:
    """Place a conditioning dict for clip-sharded sampling: video-shaped
    tensors shard on the chosen axis (pixel-space H/W scale with the f=8
    factor but divisibility is preserved), everything else replicates."""
    out = {}
    t = shape[1]
    for k, v in cond.items():
        v = jnp.asarray(v)
        if k in _CLIP_KEYS and v.ndim >= 4 and v.shape[1] == t:
            out[k] = jax.device_put(v, clip_sharding(plan, v.ndim, axis))
        else:
            out[k] = jax.device_put(v, plan.replicated())
    return out


def make_frame_sharded_sample(
    engine,
    plan: MeshPlan,
    shape: Sequence[int],
    num_steps: Optional[int],
    **sample_kwargs,
):
    """Returns sample_fn(params, c, uc, rng[, x_prior]) jitted with ONE clip
    sharded over the mesh (frame axis when divisible, else latent width).
    Numerical results match the single-device program (same PRNG stream —
    jax RNG is sharding-independent)."""
    shape = tuple(shape)
    axis = pick_clip_axis(plan, shape)
    out_sharding = clip_sharding(plan, len(shape), axis)
    use_prior = sample_kwargs.pop("use_prior", False)

    def fn(params, c, uc, rng, x_prior=None):
        return engine.sample(
            params, c, uc, shape, rng, num_steps=num_steps,
            x_prior=x_prior if use_prior else None, **sample_kwargs,
        )

    jitted = jax.jit(fn, out_shardings=out_sharding)

    def call(params, c, uc, rng, x_prior=None):
        from ..ops.attention import mesh_context

        params = jax.device_put(params, plan.replicated())
        c = shard_clip_cond(plan, c, shape, axis)
        uc = shard_clip_cond(plan, uc, shape, axis) if uc is not None else None
        # trace under the mesh context: GSPMD cannot partition a
        # pallas_call, so every pallas-eligible attention must be routed
        # through shard_map at trace time (ops/attention.py header) —
        # without this the kernels lower unpartitioned and XLA replicates
        # their operands, forfeiting the sharding this module exists for
        with mesh_context(plan.mesh, plan.data_axis):
            if x_prior is not None:
                x_prior = jax.device_put(jnp.asarray(x_prior), out_sharding)
                return jitted(params, c, uc, rng, x_prior)
            return jitted(params, c, uc, rng)

    return call
