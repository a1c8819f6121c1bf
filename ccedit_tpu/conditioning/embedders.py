"""Embedder zoo — conditioning encoders for the Conditioner framework.

Behavioural parity targets (sgm/modules/encoders/modules.py):
  * FrozenCLIPEmbedder        — :358-420 (SD-1.5 text encoder, 'last' layer)
  * VAEEmbedder               — :982-1023 (reference frame -> shared-VAE latent)
  * IdentityEncoder           — :233-238
  * CustomIdentityEncoder     — :1026-1100 (random down-blur augmentation)
  * ConcatTimestepEmbedderND  — :944-960 (Fourier-embedded scalars -> vector)
  * ClassEmbedder             — :241-260
  * SpatialRescaler           — :789-846
  * InpaintingEncoder/OutpaintingEncoder — :2301-2374 (rect-mask video hints)
  * annotators (depth/lineart/edge/pose) live in conditioning/annotators/

Each embedder implements:
  prepare(value)             host-side -> np/jnp arrays (tokenize, etc.)
  init_params(rng, prepared) -> param tree (or None)
  embed(params, prepared)    pure jittable device fn
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..modules.clip import CLIPTextModel
from ..modules.layers import timestep_embedding
from .tokenizer import load_tokenizer


class Embedder:
    def prepare(self, value):
        return value

    def init_params(self, rng, prepared):
        return None

    def embed(self, params, prepared):
        raise NotImplementedError


class CLIPTextEmbedder(Embedder):
    """SD-1.5 text conditioning: CLIP ViT-L/14 text transformer, 77 tokens."""

    def __init__(
        self,
        asset_dir: Optional[str] = None,
        output_layer: str = "last",
        layer_idx: Optional[int] = None,
        max_len: int = 77,
        dtype=jnp.float32,
    ):
        self.tokenizer = load_tokenizer(asset_dir)
        self.model = CLIPTextModel(dtype=dtype)
        self.output_layer = output_layer
        self.layer_idx = layer_idx
        self.max_len = max_len

    def prepare(self, value):
        if isinstance(value, str):
            value = [value]
        if isinstance(value, (list, tuple)) and (not value or isinstance(value[0], str)):
            return jnp.asarray(self.tokenizer(list(value), self.max_len))
        return value  # already tokens

    def init_params(self, rng, prepared):
        return self.model.init(rng, prepared)["params"]

    def embed(self, params, tokens):
        return self.model.apply(
            {"params": params}, tokens,
            output_layer=self.output_layer, layer_idx=self.layer_idx,
        )


class IdentityEncoder(Embedder):
    def embed(self, params, prepared):
        return jnp.asarray(prepared)


class CustomIdentityEncoder(Embedder):
    """Identity with optional fixed down-blur augmentation (inference uses
    downsample_factor=1 => pure identity; the random training augmentation is
    sampled host-side via prepare_augmented)."""

    def __init__(self, downsample_factor: int = 1):
        self.downsample_factor = downsample_factor

    def embed(self, params, prepared):
        x = jnp.asarray(prepared)
        f = self.downsample_factor
        if f and f > 1:
            shape = list(x.shape)
            h_ax, w_ax = x.ndim - 3, x.ndim - 2
            small = list(shape)
            small[h_ax] //= f
            small[w_ax] //= f
            x = jax.image.resize(x, small, method="bilinear")
            x = jax.image.resize(x, shape, method="bilinear")
        return x


class VAEEmbedder(Embedder):
    """Encode the edited reference frame with the *shared* first-stage VAE
    (wired by the engine, diffusion.py:375-385).  Uses the posterior mode for
    determinism (the reference samples; mode is the variance-free choice and
    is what parity tests pin)."""

    def __init__(self, vae_apply=None, scale_factor: float = 0.18215):
        self.vae_apply = vae_apply  # set by the engine: (x) -> latent moments
        self.scale_factor = scale_factor

    def embed(self, params, prepared):
        assert self.vae_apply is not None, "VAEEmbedder not wired to a VAE"
        x = jnp.asarray(prepared)
        return self.vae_apply(x)


class ConcatTimestepEmbedderND(Embedder):
    """Fourier-embed N scalars per sample and flatten (modules.py:944-960)."""

    def __init__(self, outdim: int = 256):
        self.outdim = outdim

    def embed(self, params, prepared):
        x = jnp.asarray(prepared)
        if x.ndim == 1:
            x = x[:, None]
        b, n = x.shape
        emb = timestep_embedding(x.reshape(-1), self.outdim)
        return emb.reshape(b, n * self.outdim)


class ClassEmbedder(Embedder):
    def __init__(self, embed_dim: int, n_classes: int = 1000):
        self.embed_dim = embed_dim
        self.n_classes = n_classes

    def init_params(self, rng, prepared):
        return {
            "embedding": jax.random.normal(rng, (self.n_classes, self.embed_dim)) * 0.02
        }

    def embed(self, params, prepared):
        idx = jnp.asarray(prepared, dtype=jnp.int32)
        return params["embedding"][idx]


class SpatialRescaler(Embedder):
    def __init__(self, factor: float = 0.5, method: str = "bilinear"):
        self.factor = factor
        self.method = method

    def embed(self, params, prepared):
        x = jnp.asarray(prepared)
        shape = list(x.shape)
        h_ax, w_ax = x.ndim - 3, x.ndim - 2
        shape[h_ax] = int(shape[h_ax] * self.factor)
        shape[w_ax] = int(shape[w_ax] * self.factor)
        return jax.image.resize(x, shape, method=self.method)


class LowScaleEncoder(Embedder):
    """Noise-augmentation conditioning (modules.py:849-941): rescale the
    input, q-sample it at a random DDPM timestep, return the noised latent;
    the timestep is emitted separately for vector conditioning (the SD
    upscaler recipe).  Host supplies rng via prepare_rng for determinism."""

    def __init__(
        self,
        max_noise_level: int = 250,
        factor: float = 0.5,
        num_timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        seed: int = 0,
    ):
        from ..diffusion.discretization import make_ddpm_alphas_cumprod

        self.max_noise_level = max_noise_level
        self.factor = factor
        abar = make_ddpm_alphas_cumprod(num_timesteps, linear_start, linear_end)
        self.sqrt_abar = np.sqrt(abar).astype(np.float32)
        self.sqrt_1m_abar = np.sqrt(1.0 - abar).astype(np.float32)
        self._rng = np.random.default_rng(seed)
        self.last_noise_level = None

    def prepare(self, value):
        x = np.asarray(value)
        b = x.shape[0]
        t = self._rng.integers(0, self.max_noise_level, size=(b,))
        noise = self._rng.standard_normal(x.shape).astype(np.float32)
        self.last_noise_level = t.astype(np.int32)
        lead = (...,) + (None,) * (x.ndim - 1)
        noised = (
            self.sqrt_abar[t][lead] * x + self.sqrt_1m_abar[t][lead] * noise
        )
        return noised.astype(np.float32)

    def embed(self, params, prepared):
        x = jnp.asarray(prepared)
        if self.factor and self.factor != 1.0:
            shape = list(x.shape)
            h_ax, w_ax = x.ndim - 3, x.ndim - 2
            shape[h_ax] = int(shape[h_ax] * self.factor)
            shape[w_ax] = int(shape[w_ax] * self.factor)
            x = jax.image.resize(x, shape, method="bilinear")
        return x


class GaussianEncoder(Embedder):
    """Samples noise shaped like the input (train-time aug)."""

    def __init__(self, sigma: float = 1.0):
        self.sigma = sigma

    def embed(self, params, prepared):
        return jnp.asarray(prepared)  # noise added by loss pipeline


def _rect_mask(shape_bthw1, rng: np.random.Generator, lo=0.25, hi=0.75):
    b, t, h, w, _ = shape_bthw1
    mask = np.zeros((b, 1, h, w, 1), dtype=np.float32)
    for i in range(b):
        mh = int(h * rng.uniform(lo, hi))
        mw = int(w * rng.uniform(lo, hi))
        y0 = rng.integers(0, h - mh + 1)
        x0 = rng.integers(0, w - mw + 1)
        mask[i, 0, y0 : y0 + mh, x0 : x0 + mw, 0] = 1.0
    return np.broadcast_to(mask, shape_bthw1).copy()


class InpaintingEncoder(Embedder):
    """Random rect mask -> masked video hint (modules.py:2301-2338).
    Mask sampled host-side in prepare() for determinism under jit."""

    def __init__(self, seed: int = 0, outpaint: bool = False):
        self.rng = np.random.default_rng(seed)
        self.outpaint = outpaint

    def prepare(self, value):
        x = np.asarray(value)
        mask = _rect_mask(x.shape[:4] + (1,), self.rng)
        if self.outpaint:
            mask = 1.0 - mask
        return x * (1.0 - mask) + (-1.0) * mask  # masked region = -1 (black)

    def embed(self, params, prepared):
        return jnp.asarray(prepared)


class OutpaintingEncoder(InpaintingEncoder):
    def __init__(self, seed: int = 0):
        super().__init__(seed=seed, outpaint=True)


EMBEDDERS = {
    "clip_text": CLIPTextEmbedder,
    "identity": IdentityEncoder,
    "custom_identity": CustomIdentityEncoder,
    "vae": VAEEmbedder,
    "concat_timestep": ConcatTimestepEmbedderND,
    "class": ClassEmbedder,
    "spatial_rescaler": SpatialRescaler,
    "gaussian": GaussianEncoder,
    "low_scale": LowScaleEncoder,
    "inpainting": InpaintingEncoder,
    "outpainting": OutpaintingEncoder,
}
