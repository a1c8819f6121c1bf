"""Parameter freeze policies.

Parity target: VideoDiffusionEngine.freeze_model (diffusion.py:511-544) and
VideoDiffusionEngineTV2V overrides (:569-580):
  * 'none'    — train everything
  * 'spatial' — train only temporal layers + control branches; the TV2V
    engine then re-freezes the *structure* controlnet and unfreezes
    controlnet_img (appearance branch)
Expressed as a boolean mask over the param tree for optax.masked /
multi_transform.
"""

from __future__ import annotations

from typing import Callable, Dict

import flax
import jax


def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def _mask_from_predicate(params, pred: Callable[[str], bool]):
    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: pred(_path_str(k)) for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def freeze_mask(params, policy: str = "none"):
    """Returns a pytree of bools: True = trainable."""
    if policy == "none":
        return _mask_from_predicate(params, lambda p: True)
    if policy == "all":
        return _mask_from_predicate(params, lambda p: False)
    if policy == "spatial":
        # train temporal twins + any control branch (diffusion.py:521-536)
        def pred(p: str) -> bool:
            return "temporal" in p or "alpha_temporal" in p or "controlnet" in p

        return _mask_from_predicate(params, pred)
    if policy == "spatial_openlora":
        # spatial + LoRA adapter params stay trainable (diffusion.py:529-538)
        def pred(p: str) -> bool:
            return (
                "temporal" in p or "alpha_temporal" in p or "controlnet" in p
                or "lora" in p
            )

        return _mask_from_predicate(params, pred)
    if policy in ("spatial_tv2v", "spatial_tv2v_openlora"):
        # TV2V: structure controlnet frozen, appearance controlnet_img
        # trainable, temporal layers trainable (diffusion.py:569-580)
        openlora = policy.endswith("openlora")

        def pred(p: str) -> bool:
            if "controlnet_img" in p:
                return True
            if "controlnet" in p:
                return False
            if openlora and "lora" in p:
                return True
            return "temporal" in p or "alpha_temporal" in p

        return _mask_from_predicate(params, pred)
    raise ValueError(f"unknown freeze policy {policy!r}")


FREEZE_POLICIES = (
    "none", "all", "spatial", "spatial_openlora", "spatial_tv2v",
    "spatial_tv2v_openlora",
)


def count_trainable(params, mask) -> Dict[str, int]:
    import numpy as np

    flat_p = flax.traverse_util.flatten_dict(params)
    flat_m = flax.traverse_util.flatten_dict(mask)
    trainable = sum(int(np.prod(v.shape)) for k, v in flat_p.items() if flat_m[k])
    total = sum(int(np.prod(v.shape)) for v in flat_p.values())
    return {"trainable": trainable, "total": total, "frozen": total - trainable}
