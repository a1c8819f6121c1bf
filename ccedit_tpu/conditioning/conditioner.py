"""Conditioning framework — the GeneralConditioner redesigned for JAX.

Behavioural parity target: sgm/modules/encoders/modules.py:84-204.
  * each embedder has an input_key, a ucg_rate (classifier-free dropout), and
    routes its output to a conditioning key;
  * routing: input_key override (txt->crossattn, control_hint->control_hint,
    cond_img->cond_feat, interpolate_*->same) else by ndim (2->vector,
    3->crossattn, 4/5->concat) (modules.py:85,154-164);
  * get_unconditional_conditioning runs twice with ucg disabled (:190-204).

TPU-first split: ``prepare`` runs host-side (tokenization, decode) and returns
arrays; ``embed`` is a pure jittable function of (params, prepared, rng).
Outputs landing on the same key are concatenated on the channel axis
(modules.py:182-187).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.misc import append_dims

# reference KEY2CATDIM (modules.py:85): vector dim1, crossattn dim2, concat
# dim1 — all of which are the trailing feature/channel axis in our
# channels-last layout
KEY2CATDIM = {"vector": -1, "crossattn": -1, "concat": -1, "control_hint": -1, "cond_feat": -1}

_OUTPUT_KEY_OVERRIDES = {
    "txt": "crossattn",
    "control_hint": "control_hint",
    "cond_img": "cond_feat",
    "interpolate_first": "interpolate_first",
    "interpolate_last": "interpolate_last",
    "interpolate_first_last": "interpolate_first_last",
}

_DIM2KEY = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}


@dataclasses.dataclass
class EmbedderSpec:
    embedder: Any  # object with prepare()/embed() (see embedders.py)
    input_key: str
    ucg_rate: float = 0.0
    legacy_ucg_value: Optional[str] = None  # host-side prompt replacement
    is_trainable: bool = False
    out_key: Optional[str] = None

    def output_key(self, ndim: int) -> str:
        if self.out_key is not None:
            return self.out_key
        if self.input_key in _OUTPUT_KEY_OVERRIDES:
            return _OUTPUT_KEY_OVERRIDES[self.input_key]
        return _DIM2KEY[ndim]


class Conditioner:
    """Composes embedders.  Typical CCEdit stack: CLIP text + depth annotator
    (+ VAE reference-frame embedder)."""

    def __init__(self, specs: Sequence[EmbedderSpec]):
        self.specs = list(specs)

    # ---- params ------------------------------------------------------
    def init_params(self, rng: jax.Array, batch: Dict) -> Dict:
        prepared = self.prepare(batch)
        params = {}
        for i, spec in enumerate(self.specs):
            rng, k = jax.random.split(rng)
            params[f"embedder_{i}"] = spec.embedder.init_params(
                k, prepared[spec.input_key]
            )
        return params

    # ---- host side ---------------------------------------------------
    def prepare(self, batch: Dict, rng=None, apply_legacy_ucg: bool = False) -> Dict:
        """Host-side: convert raw batch values (strings, videos) to arrays.
        ``apply_legacy_ucg`` applies string-replacement dropout
        (possibly_get_ucg_val, modules.py:124-131) — training only."""
        out = dict(batch)
        for spec in self.specs:
            if spec.input_key not in batch:
                continue
            val = batch[spec.input_key]
            if apply_legacy_ucg and spec.legacy_ucg_value is not None and spec.ucg_rate > 0:
                import numpy as np

                assert rng is not None
                val = [
                    spec.legacy_ucg_value if np.random.rand() < spec.ucg_rate else v
                    for v in val
                ]
            out[spec.input_key] = spec.embedder.prepare(val)
        return out

    # ---- device side -------------------------------------------------
    def embed(
        self,
        params: Dict,
        prepared: Dict,
        rng: Optional[jax.Array] = None,
        force_zero_keys: Sequence[str] = (),
        apply_ucg: bool = False,
    ) -> Dict:
        """Pure/jittable: run every embedder, route + concat outputs."""
        cond: Dict[str, jnp.ndarray] = {}
        for i, spec in enumerate(self.specs):
            if spec.input_key not in prepared:
                continue
            kwargs = {}
            if getattr(spec.embedder, "wants_rng", False) and rng is not None:
                rng, k_emb = jax.random.split(rng)
                kwargs["rng"] = k_emb
            emb = spec.embedder.embed(
                params.get(f"embedder_{i}"), prepared[spec.input_key], **kwargs
            )
            if apply_ucg and spec.ucg_rate > 0.0 and spec.legacy_ucg_value is None:
                assert rng is not None
                rng, k = jax.random.split(rng)
                keep = jax.random.bernoulli(
                    k, 1.0 - spec.ucg_rate, (emb.shape[0],)
                ).astype(emb.dtype)
                emb = emb * append_dims(keep, emb.ndim)
            if spec.input_key in force_zero_keys:
                emb = jnp.zeros_like(emb)
            key = spec.output_key(emb.ndim)
            if key in cond:
                cond[key] = jnp.concatenate(
                    [cond[key], emb], axis=KEY2CATDIM.get(key, -1)
                )
            else:
                cond[key] = emb
        return cond

    def __call__(self, params, batch, rng=None, **kw) -> Dict:
        return self.embed(params, self.prepare(batch), rng=rng, **kw)

    def get_unconditional_conditioning(
        self,
        params,
        batch: Dict,
        batch_uc: Optional[Dict] = None,
        force_uc_zero_keys: Sequence[str] = (),
    ) -> Tuple[Dict, Dict]:
        """modules.py:190-204: run twice with ucg disabled."""
        c = self.embed(params, self.prepare(batch))
        uc = self.embed(
            params,
            self.prepare(batch_uc if batch_uc is not None else batch),
            force_zero_keys=force_uc_zero_keys,
        )
        return c, uc
