"""Device-mesh parallelism plan.

Replaces the reference's Lightning DDP/NCCL stack (SURVEY.md §2.7) with
jax.sharding: one program, sharding annotations, XLA-emitted collectives over
ICI.  The CCEdit workload maps cleanly:

  * batch axis ("data") — per-clip data parallelism for training and batched
    sampling (DDP equivalent; gradient psum emitted by XLA);
  * time-as-batch      — spatial ops run on the folded (B*T) axis, so a
    single clip also shards over "data" by splitting frames: the temporal
    ops (1D convs + T-token attention at T=17) are the only cross-device
    communication, which XLA lowers to cheap all-to-alls on ICI;
  * "model" axis        — optional tensor sharding of attention/MLP weights;
    unused by default at SD-1.5 scale (fits one chip) but the mesh carries
    the axis so it can be enabled without re-plumbing.

The `sdp` recipe from the scaling playbook: choose mesh, annotate in/out
shardings, let XLA insert collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshPlan:
    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    def batch_spec(self, ndim: int) -> P:
        """Shard the leading (batch) axis over data; replicate the rest.
        Scalar (0-d) leaves replicate — a rank-1 spec would be a rank
        mismatch at device_put."""
        if ndim == 0:
            return P()
        return P(self.data_axis, *([None] * (ndim - 1)))

    def batch_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, self.batch_spec(ndim))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> MeshPlan:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return MeshPlan(Mesh(arr, ("data", "model")))


def shard_batch(plan: MeshPlan, tree):
    """Place a pytree of host arrays with the batch axis sharded over data."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, plan.batch_sharding(np.ndim(x))), tree
    )


def replicate(plan: MeshPlan, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, plan.replicated()), tree
    )


def initialize_distributed() -> bool:
    """Multi-host bring-up (the reference's LOCAL_RANK/OMPI env bridging +
    DDP init, main.py:705-707,814-831): call jax.distributed.initialize when
    the standard coordinator envs are present; no-op single-host."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False
