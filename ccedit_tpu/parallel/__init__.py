from .mesh import MeshPlan, make_mesh, shard_batch, replicate  # noqa: F401
