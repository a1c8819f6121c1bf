"""Native (orbax) checkpoint save/load for engine param trees.

Complements torch_convert (which imports foreign checkpoints): once converted
or trained, params live in orbax format — async, sharded, resumable
(replaces the reference's Lightning ModelCheckpoint zoo, SURVEY.md §5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Restore a param tree.  ``like`` (a matching abstract/concrete tree)
    enables sharding-aware restoration."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
