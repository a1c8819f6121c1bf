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
from ..utils.misc import as_float_frames
from .tokenizer import load_tokenizer


class Embedder:
    #: embedders with per-batch randomness (train-time augmentation) set this
    #: and take ``embed(params, prepared, rng=None)``; the Conditioner splits
    #: its device rng into them so the augmentation re-randomizes every jitted
    #: step instead of freezing at trace time
    wants_rng = False

    def prepare(self, value):
        return value

    def init_params(self, rng, prepared):
        return None

    def embed(self, params, prepared):
        raise NotImplementedError


def _torch_resize_hw(x: jnp.ndarray, out_h: int, out_w: int,
                     method: str = "bilinear") -> jnp.ndarray:
    """Resize the trailing (H, W, C) axes with torch F.interpolate semantics.

    torch never antialiases (its bilinear/trilinear at align_corners=False is
    a plain half-pixel triangle kernel), while jax.image.resize defaults to
    antialias=True on downsampling — so every torch-parity resize must pass
    antialias=False.  torch's legacy 'nearest' picks floor(dst * in/out)
    (recompute_scale_factor semantics), NOT the half-pixel rounding jax uses,
    so it is done with an explicit index gather.  'area' (adaptive avg pool)
    is exact mean pooling for integer ratios."""
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    shape = list(x.shape)
    in_h, in_w = shape[h_ax], shape[w_ax]
    if (in_h, in_w) == (out_h, out_w):
        return x
    if method == "nearest":
        iy = jnp.floor(jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32)
        ix = jnp.floor(jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32)
        x = jnp.take(x, jnp.clip(iy, 0, in_h - 1), axis=h_ax)
        return jnp.take(x, jnp.clip(ix, 0, in_w - 1), axis=w_ax)
    if method == "area" and in_h % out_h == 0 and in_w % out_w == 0:
        fh, fw = in_h // out_h, in_w // out_w
        new = shape[:h_ax] + [out_h, fh, out_w, fw] + shape[w_ax + 1:]
        return x.reshape(new).mean(axis=(h_ax + 1, h_ax + 3))
    shape[h_ax], shape[w_ax] = out_h, out_w
    jmethod = {"bilinear": "linear", "trilinear": "linear"}.get(method, method)
    return jax.image.resize(x, shape, method=jmethod, antialias=False)


def _down_blur(x: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Down+up bilinear resize over the trailing (H, W, C) spatial axes,
    exactly the reference's interpolate(size=(h//f, w//f)) then back
    (modules.py:1060-1073) — no antialias, half-pixel bilinear."""
    if factor <= 1.0:
        return x
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    h, w = x.shape[h_ax], x.shape[w_ax]
    x = _torch_resize_hw(x, int(h / factor), int(w / factor), "bilinear")
    return _torch_resize_hw(x, h, w, "bilinear")


def _select_down_blur(x, factors, probs, rng, host_rng):
    """Pick a blur factor and apply it.  With a JAX ``rng`` the choice is a
    traced lax.switch (re-randomizes per step under jit, modules.py:997-1016);
    without one (eager inference) it falls back to the host RNG.  Returns
    (blurred, factor) where factor is traced or a python float resp."""
    if rng is not None:
        p = (jnp.asarray(probs, jnp.float32) if probs
             else jnp.full((len(factors),), 1.0 / len(factors)))
        idx = jax.random.choice(rng, len(factors), p=p)
        branches = [lambda xx, f=f: _down_blur(xx, float(f)) for f in factors]
        return (jax.lax.switch(idx, branches, x),
                jnp.asarray(factors, jnp.float32)[idx])
    factor = float(host_rng.choice(factors, p=probs if probs else None))
    return _down_blur(x, factor), factor


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
        return as_float_frames(prepared)


class CustomIdentityEncoder(Embedder):
    """Identity with the reference's random down-blur augmentation
    (modules.py:1026-1114): a factor drawn from ``down_blur_factor`` (probs
    ``down_blur_probs``, uniform default), then interpolate down to
    (int(h/f), int(w/f)) and back — bilinear for images, trilinear with T
    untouched for videos (identical to per-frame bilinear at half-pixel
    centers).  With no factor list it is a pure identity (inference).
    ``downsample_factor`` keeps the fixed-factor form for direct use."""

    def __init__(self, down_blur_factor=None, down_blur_probs=None,
                 downsample_factor: int = 1, seed: int = 0):
        self.down_blur_factor = list(down_blur_factor or [])
        self.down_blur_probs = list(down_blur_probs or [])
        self.downsample_factor = downsample_factor
        self._rng = np.random.default_rng(seed)
        self.wants_rng = bool(self.down_blur_factor)

    def embed(self, params, prepared, rng=None):
        x = as_float_frames(prepared)
        if self.down_blur_factor:
            x, _ = _select_down_blur(x, self.down_blur_factor,
                                     self.down_blur_probs, rng, self._rng)
            return x
        if self.downsample_factor and self.downsample_factor > 1:
            x = _down_blur(x, float(self.downsample_factor))
        return x


class VAEEmbedder(Embedder):
    """Encode the edited reference frame with the *shared* first-stage VAE
    (wired by the engine, diffusion.py:375-385).  With a train rng the
    posterior is SAMPLED (matching sgm/models/autoencoder.py:330); without
    one (inference, parity tests) the deterministic mode is used."""

    wants_rng = True

    def __init__(self, vae_apply=None, scale_factor: float = 0.18215,
                 down_blur_factor=None, down_blur_probs=None, seed: int = 0):
        self.vae_apply = vae_apply  # set by the engine: (x[, rng]) -> latent
        self.scale_factor = scale_factor
        # optional train-time down-blur augmentation (modules.py:997-1016)
        self.down_blur_factor = list(down_blur_factor or [])
        self.down_blur_probs = list(down_blur_probs or [])
        self._rng = np.random.default_rng(seed)

    def embed(self, params, prepared, rng=None):
        assert self.vae_apply is not None, "VAEEmbedder not wired to a VAE"
        x = as_float_frames(prepared)
        k_blur = k_post = None
        if rng is not None:
            k_blur, k_post = jax.random.split(rng)
        if self.down_blur_factor:
            x, _ = _select_down_blur(x, self.down_blur_factor,
                                     self.down_blur_probs, k_blur, self._rng)
        import inspect

        if "rng" in inspect.signature(self.vae_apply).parameters:
            return self.vae_apply(x, rng=k_post)
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
    """modules.py:241-260: nn.Embedding lookup; class n_classes-1 is reserved
    as the unconditional (ucg) class."""

    def __init__(self, embed_dim: int, n_classes: int = 1000,
                 add_sequence_dim: bool = False):
        self.embed_dim = embed_dim
        self.n_classes = n_classes
        self.add_sequence_dim = add_sequence_dim

    def init_params(self, rng, prepared):
        return {
            "embedding": jax.random.normal(rng, (self.n_classes, self.embed_dim)) * 0.02
        }

    def embed(self, params, prepared):
        idx = jnp.asarray(prepared, dtype=jnp.int32)
        c = params["embedding"][idx]
        if self.add_sequence_dim:
            c = c[:, None, :]
        return c

    def get_unconditional_conditioning(self, bs: int):
        return np.full((bs,), self.n_classes - 1, dtype=np.int64)


class SpatialRescaler(Embedder):
    """modules.py:789-846: n_stages × interpolate(scale_factor=multiplier)
    with torch semantics (floor output size per stage, no antialias, legacy
    nearest), then an optional 1×..k×k channel-mapper conv.  Video input
    (B,T,H,W,C) needs no wrap_video shuffle in channels-last layout — the
    resize already runs per frame."""

    def __init__(self, factor: float = 0.5, method: str = "bilinear",
                 n_stages: int = 1, out_channels: Optional[int] = None,
                 kernel_size: int = 1, bias: bool = False):
        assert n_stages >= 0
        self.factor = factor
        self.method = method
        self.n_stages = n_stages
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.bias = bias

    def init_params(self, rng, prepared):
        if self.out_channels is None:
            return None
        c_in = np.asarray(prepared).shape[-1]
        k = self.kernel_size
        w = jax.nn.initializers.lecun_normal()(
            rng, (k, k, c_in, self.out_channels), jnp.float32)
        p = {"kernel": w}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def embed(self, params, prepared):
        x = jnp.asarray(prepared)
        for _ in range(self.n_stages):
            h_ax, w_ax = x.ndim - 3, x.ndim - 2
            x = _torch_resize_hw(
                x, int(x.shape[h_ax] * self.factor),
                int(x.shape[w_ax] * self.factor), self.method)
        if self.out_channels is not None:
            lead = x.shape[:-3]
            xf = x.reshape((-1,) + x.shape[-3:])
            xf = jax.lax.conv_general_dilated(
                xf, params["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.bias:
                xf = xf + params["bias"]
            x = xf.reshape(lead + xf.shape[1:])
        return x


class LowScaleEncoder(Embedder):
    """Noise-augmentation conditioning (modules.py:849-941, the SD upscaler
    recipe): multiply the latent by ``scale_factor``, q-sample it at a random
    DDPM timestep (forward :925-938), then nearest-resize to ``out_size``
    (:934-935; exact for integer ratios — torch's legacy-nearest and jax's
    half-pixel nearest agree there, the reference's own comment shows
    repeat_interleave).  The reference encodes through its own first-stage
    model first; here the input is the latent (compose with VAEEmbedder for
    pixel input).  The timestep is kept on ``last_noise_level`` for vector
    conditioning.  ``noise_override``/``t_override`` replace the host draws
    (SURVEY §7.1 injection pattern)."""

    def __init__(
        self,
        max_noise_level: int = 250,
        out_size: Optional[int] = None,
        scale_factor: float = 1.0,
        num_timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        seed: int = 0,
    ):
        from ..diffusion.discretization import make_ddpm_alphas_cumprod

        self.max_noise_level = max_noise_level
        self.out_size = out_size
        self.scale_factor = scale_factor
        abar = make_ddpm_alphas_cumprod(num_timesteps, linear_start, linear_end)
        self.sqrt_abar = np.sqrt(abar).astype(np.float32)
        self.sqrt_1m_abar = np.sqrt(1.0 - abar).astype(np.float32)
        self._rng = np.random.default_rng(seed)
        self.last_noise_level = None

    def prepare(self, value, noise_override=None, t_override=None):
        x = np.asarray(value, dtype=np.float32) * self.scale_factor
        b = x.shape[0]
        t = (np.asarray(t_override, dtype=np.int64) if t_override is not None
             else self._rng.integers(0, self.max_noise_level, size=(b,)))
        noise = (np.asarray(noise_override, dtype=np.float32)
                 if noise_override is not None
                 else self._rng.standard_normal(x.shape).astype(np.float32))
        self.last_noise_level = t.astype(np.int32)
        lead = (...,) + (None,) * (x.ndim - 1)
        noised = (
            self.sqrt_abar[t][lead] * x + self.sqrt_1m_abar[t][lead] * noise
        )
        return noised.astype(np.float32)

    def embed(self, params, prepared):
        x = jnp.asarray(prepared)
        if self.out_size is not None:
            shape = list(x.shape)
            h_ax, w_ax = x.ndim - 3, x.ndim - 2
            shape[h_ax] = shape[w_ax] = int(self.out_size)
            x = jax.image.resize(x, shape, method="nearest")
        return x


class GaussianEncoder(Embedder):
    """modules.py:963-979: a trainable VAE-style Encoder whose moments feed a
    DiagonalGaussian; the SAMPLE is the conditioning (flattened to
    (B, H·W, C) when flatten_output).  The reference returns the KL in a log
    dict as an aux loss; here ``embed_with_kl`` returns ``(z, kl)`` as a
    functional output (mutable aux state on ``self`` would leak tracers under
    jit).  With no rng the posterior mode is used (deterministic eval);
    ``noise_override`` in embed injects the reparam noise for parity tests."""

    wants_rng = True

    def __init__(self, weight: float = 1.0, flatten_output: bool = True,
                 dtype=jnp.float32, **encoder_kwargs):
        from ..modules.vae import Encoder as VAEEncoder

        self.model = VAEEncoder(dtype=dtype, **encoder_kwargs)
        self.weight = weight
        self.flatten_output = flatten_output

    def init_params(self, rng, prepared):
        return self.model.init(rng, jnp.asarray(prepared))["params"]

    def embed_with_kl(self, params, prepared, rng=None, noise_override=None):
        from ..modules.vae import DiagonalGaussian

        moments = self.model.apply({"params": params}, jnp.asarray(prepared))
        post = DiagonalGaussian(moments)
        if noise_override is not None:
            z = post.mean + post.std * jnp.asarray(noise_override)
        elif rng is not None:
            z = post.sample(rng)
        else:
            z = post.mode()
        kl = post.kl()
        if self.flatten_output:
            b, h, w, c = z.shape
            z = z.reshape(b, h * w, c)
        return z, kl

    def embed(self, params, prepared, rng=None, noise_override=None):
        z, _ = self.embed_with_kl(params, prepared, rng=rng,
                                  noise_override=noise_override)
        return z


def _band_bounds(h, w, ratio_min, ratio_max, draws):
    """The reference's 4-draw centered-band rectangle (modules.py:2318-2321,
    2356-2359): start = int((u*range+min)*dim), end = int((1-(u*range+min))*dim),
    one shared rectangle per call (torch.rand(1), not per batch item)."""
    r = ratio_max - ratio_min
    h0 = int((draws[0] * r + ratio_min) * h)
    h1 = int((1.0 - (draws[1] * r + ratio_min)) * h)
    w0 = int((draws[2] * r + ratio_min) * w)
    w1 = int((1.0 - (draws[3] * r + ratio_min)) * w)
    return h0, h1, w0, w1


class InpaintingEncoder(Embedder):
    """Inpainting hint (modules.py:2301-2338): one shared centre-band rect per
    call; x -> (x+1)/2, the hole is set to -1, then the whole tensor is
    negated — kept pixels land in [-1, 0], the hole at +1.  (The reference
    deliberately never rescales the kept region back; replicated exactly.)
    Mask drawn host-side in prepare() for determinism under jit;
    ``rand_override`` injects the 4 uniform draws for parity tests."""

    def __init__(self, mask_ratio_min: float = 0.3, mask_ratio_max: float = 0.5,
                 seed: int = 0):
        assert 0 <= mask_ratio_min < mask_ratio_max <= 0.5
        self.mask_ratio_min = mask_ratio_min
        self.mask_ratio_max = mask_ratio_max
        self.rng = np.random.default_rng(seed)

    def prepare(self, value, rand_override=None):
        x = np.asarray(value, dtype=np.float32)
        draws = (np.asarray(rand_override, np.float32)
                 if rand_override is not None else self.rng.random(4))
        h, w = x.shape[-3], x.shape[-2]
        h0, h1, w0, w1 = _band_bounds(h, w, self.mask_ratio_min,
                                      self.mask_ratio_max, draws)
        out = (x + 1.0) / 2.0
        out[..., h0:h1, w0:w1, :] = -1.0
        return -out

    def embed(self, params, prepared):
        return jnp.asarray(prepared)


class OutpaintingEncoder(Embedder):
    """Outpainting hint (modules.py:2343-2374): keep the centre band as -x,
    everything outside becomes +1 ((x+1)/2 * mask * 2 - 1, negated)."""

    def __init__(self, mask_ratio_min: float = 0.0, mask_ratio_max: float = 0.4,
                 seed: int = 0):
        assert 0 <= mask_ratio_min < mask_ratio_max <= 0.5
        self.mask_ratio_min = mask_ratio_min
        self.mask_ratio_max = mask_ratio_max
        self.rng = np.random.default_rng(seed)

    def prepare(self, value, rand_override=None):
        x = np.asarray(value, dtype=np.float32)
        draws = (np.asarray(rand_override, np.float32)
                 if rand_override is not None else self.rng.random(4))
        h, w = x.shape[-3], x.shape[-2]
        h0, h1, w0, w1 = _band_bounds(h, w, self.mask_ratio_min,
                                      self.mask_ratio_max, draws)
        mask = np.zeros(x.shape, np.float32)
        mask[..., h0:h1, w0:w1, :] = 1.0
        return -(((x + 1.0) / 2.0) * mask * 2.0 - 1.0)

    def embed(self, params, prepared):
        return jnp.asarray(prepared)


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


class T5TextEmbedder(Embedder):
    """FrozenT5Embedder / FrozenByT5Embedder (encoders/modules.py:275-355):
    T5EncoderModel last_hidden_state over max_length-padded tokens.

    ByT5 ('byt5' variant) tokenizes exactly and asset-free (UTF-8 bytes);
    classic T5 needs a SentencePiece model file (spm_path) — offline builds
    can still construct the architecture and convert weights."""

    SIZES = {  # (d_model, d_kv, d_ff, heads, layers)
        "google/t5-v1_1-small": (512, 64, 1024, 6, 8),
        "google/t5-v1_1-base": (768, 64, 2048, 12, 12),
        "google/t5-v1_1-large": (1024, 64, 2816, 16, 24),
        "google/t5-v1_1-xl": (2048, 64, 5120, 32, 24),
        "google/t5-v1_1-xxl": (4096, 64, 10240, 64, 24),
        "google/byt5-base": (1536, 64, 3968, 12, 18),
    }

    def __init__(self, version="google/t5-v1_1-xxl", max_length=77,
                 variant="t5", spm_path=None, dtype=jnp.float32):
        from ..modules.t5 import T5Encoder

        d_model, d_kv, d_ff, heads, layers = self.SIZES.get(
            version, self.SIZES["google/t5-v1_1-xxl"])
        vocab = 384 if variant == "byt5" else 32128
        self.model = T5Encoder(vocab_size=vocab, d_model=d_model, d_kv=d_kv,
                               d_ff=d_ff, heads=heads, layers=layers,
                               dtype=dtype)
        self.max_length = max_length
        self.variant = variant
        self._spm = None
        if spm_path:
            import sentencepiece as sp  # optional dependency

            self._spm = sp.SentencePieceProcessor(model_file=spm_path)

    def prepare(self, value):
        if isinstance(value, str):
            value = [value]
        if isinstance(value, (list, tuple)) and (
                not value or isinstance(value[0], str)):
            if self.variant == "byt5":
                from ..modules.t5 import byt5_tokenize

                return jnp.asarray(byt5_tokenize(list(value), self.max_length))
            assert self._spm is not None, (
                "classic T5 tokenization needs spm_path (SentencePiece model)"
            )
            out = np.zeros((len(value), self.max_length), np.int32)
            for i, t in enumerate(value):
                ids = self._spm.encode(t)[: self.max_length - 1] + [1]
                out[i, : len(ids)] = ids
            return jnp.asarray(out)
        return value

    def init_params(self, rng, prepared):
        return self.model.init(rng, prepared)["params"]

    def embed(self, params, tokens):
        return self.model.apply({"params": params}, tokens)


class OpenCLIPTextEmbedder(Embedder):
    """FrozenOpenCLIPEmbedder(+2) (encoders/modules.py:423-598).

    layer='last': all resblocks -> ln_final.  layer='penultimate': v1
    semantics stop BEFORE the final resblock then ln_final; v2 ('emb2' with
    legacy=False) returns the raw hidden state and optionally the EOT-pooled
    projection."""

    def __init__(self, arch="ViT-H-14", layer="last", legacy=True,
                 always_return_pooled=False, max_length=77,
                 asset_dir=None, dtype=jnp.float32):
        from ..modules.openclip import OpenCLIPTextModel

        width, heads, layers = {
            "ViT-H-14": (1024, 16, 24),
            "ViT-bigG-14": (1280, 20, 32),
            "ViT-L-14": (768, 12, 12),
        }[arch]
        self.model = OpenCLIPTextModel(width=width, heads=heads, layers=layers,
                                       max_len=max_length, dtype=dtype)
        self.tokenizer = load_tokenizer(asset_dir)
        self.layer = layer
        self.legacy = legacy
        self.return_pooled = always_return_pooled
        self.max_length = max_length

    def prepare(self, value):
        if isinstance(value, str):
            value = [value]
        if isinstance(value, (list, tuple)) and (
                not value or isinstance(value[0], str)):
            return jnp.asarray(self.tokenizer(list(value), self.max_length))
        return value

    def init_params(self, rng, prepared):
        return self.model.init(rng, prepared)["params"]

    def embed(self, params, tokens):
        if self.legacy:
            # legacy (v1, and v2 with legacy=True): ln_final applied to the
            # selected hidden state; for 'penultimate' the final resblock's
            # output is never used, so skip computing it entirely
            if self.layer == "penultimate":
                out = self.model.apply({"params": params}, tokens,
                                       skip_last_layer=True)
                return out["penultimate_norm"]
            return self.model.apply({"params": params}, tokens)["last_norm"]
        out = self.model.apply({"params": params}, tokens)
        z = out["last" if self.layer == "last" else "penultimate"]
        if self.return_pooled:
            return z, out["pooled"]
        return z


class OpenCLIPImageEmbedder(Embedder):
    """FrozenOpenCLIPImageEmbedder (encoders/modules.py:601-758): CLIP-ViT
    image features with the reference's preprocessing (bicubic antialias 224
    resize, CLIP mean/std) and output plumbing (unsqueeze / repeat-to-max-len
    / pad-to-max-len / token output)."""

    MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, arch="ViT-H-14", unsqueeze_dim=False,
                 repeat_to_max_len=False, max_length=77, output_tokens=False,
                 dtype=jnp.float32):
        from ..modules.openclip import OpenCLIPVisionModel

        width, heads, layers, out_dim = {
            "ViT-H-14": (1280, 16, 32, 1024),
            "ViT-L-14": (1024, 16, 24, 768),
        }[arch]
        self.model = OpenCLIPVisionModel(width=width, heads=heads,
                                         layers=layers, output_dim=out_dim,
                                         dtype=dtype)
        self.unsqueeze_dim = unsqueeze_dim
        self.repeat_to_max_len = repeat_to_max_len
        self.max_length = max_length
        self.output_tokens = output_tokens

    def prepare(self, value):
        x = jnp.asarray(value)  # (B,H,W,3) in [-1,1]
        x = jax.image.resize(
            x, (x.shape[0], 224, 224, 3), method="bicubic", antialias=True)
        x = (x + 1.0) / 2.0
        return (x - self.MEAN) / self.STD

    def init_params(self, rng, prepared):
        return self.model.init(rng, prepared)["params"]

    def embed(self, params, images):
        if self.output_tokens:
            z, tokens = self.model.apply({"params": params}, images,
                                         output_tokens=True)
            return tokens, z
        z = self.model.apply({"params": params}, images)
        if self.unsqueeze_dim:
            z = z[:, None, :]
        if self.repeat_to_max_len:
            z_ = z[:, None, :] if z.ndim == 2 else z
            return jnp.broadcast_to(
                z_, (z_.shape[0], self.max_length, z_.shape[-1])), z
        return z


class CLIPT5Embedder(Embedder):
    """FrozenCLIPT5Encoder (encoders/modules.py:761-786): CLIP-L text and T5
    embeddings side by side, returned as a 2-list."""

    def __init__(self, asset_dir=None, clip_max_length=77, t5_max_length=77,
                 t5_version="google/t5-v1_1-xl", dtype=jnp.float32):
        self.clip = CLIPTextEmbedder(asset_dir=asset_dir, dtype=dtype)
        self.t5 = T5TextEmbedder(version=t5_version, max_length=t5_max_length,
                                 dtype=dtype)
        self.clip.max_len = clip_max_length

    def prepare(self, value):
        return {"clip": self.clip.prepare(value), "t5": self.t5.prepare(value)}

    def init_params(self, rng, prepared):
        import jax as _jax

        r1, r2 = _jax.random.split(rng)
        return {"clip": self.clip.init_params(r1, prepared["clip"]),
                "t5": self.t5.init_params(r2, prepared["t5"])}

    def embed(self, params, prepared):
        return [self.clip.embed(params["clip"], prepared["clip"]),
                self.t5.embed(params["t5"], prepared["t5"])]


class CustomIdentityDownCondEncoder(CustomIdentityEncoder):
    """CustomIdentityEncoder + blur-factor conditioning channels
    (encoders/modules.py:1115-1164): randomly down+up-sample by a factor from
    ``down_blur_factor`` (probs ``down_blur_probs``), then append a Fourier
    timestep embedding of the factor as extra channels broadcast over
    (T, H, W).  Video layout here is (B, T, H, W, C)."""

    def __init__(self, outdim: int, down_blur_factor=None,
                 down_blur_probs=None, seed: int = 0):
        super().__init__(downsample_factor=1)
        self.outdim = outdim
        self.down_blur_factor = list(down_blur_factor or [])
        self.down_blur_probs = list(down_blur_probs or [])
        self._rng = np.random.default_rng(seed)

    wants_rng = True

    def embed(self, params, prepared, rng=None):
        x = jnp.asarray(prepared)
        if not self.down_blur_factor:
            return x
        # jax.image has no trilinear; T is untouched by the reference's
        # trilinear call (size_down keeps nframe), so bilinear over (H, W)
        # per frame is the same computation
        x, factor = _select_down_blur(x, self.down_blur_factor,
                                      self.down_blur_probs, rng, self._rng)
        emb = timestep_embedding(
            jnp.full((x.shape[0],), factor, jnp.float32), self.outdim)
        bshape = x.shape[:-1] + (self.outdim,)
        emb = jnp.broadcast_to(
            emb.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (self.outdim,)),
            bshape)
        return jnp.concatenate([x, emb.astype(x.dtype)], axis=-1)
