"""CCEditEngine — the assembly of network, diffusion math, conditioner, VAE.

Behavioural parity targets (studied, not copied):
  * DiffusionEngine / VideoDiffusionEngine / VideoDiffusionEngineTV2V
    — sgm/models/diffusion.py:47-859 (shared_step, sample, encode/decode
      first stage, freeze policies, EMA hooks)
  * first-stage scale_factor 0.18215 — diffusion.py:158-163

TPU-first structure: the engine is a plain Python object holding *pure module
definitions*; all state (params, optimizer, EMA) lives in explicit pytrees.
Sampling compiles to ONE XLA program: conditioning embed -> CFG concat (once)
-> lax.scan over the sigma schedule -> VAE decode (reference: ~120 eager
dispatches per clip, SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.traverse_util
import optax

from ..conditioning.conditioner import Conditioner
from ..diffusion.denoiser import Denoiser
from ..diffusion.guidance import IdentityGuider, VanillaCFG
from ..diffusion.loss import StandardDiffusionLoss
from ..diffusion.samplers import BaseSampler
from ..modules.controlnet import CCEditNetwork
from ..modules.vae import AutoencoderKL, DiagonalGaussian
from ..utils.misc import as_float_frames
from ..train.ema import EmaState
from ..train.freeze import freeze_mask


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema: Optional[EmaState] = None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step, s.ema), None),
    lambda aux, c: TrainState(*c),
)


class CCEditEngine:
    def __init__(
        self,
        network: CCEditNetwork,
        denoiser: Denoiser,
        sampler: BaseSampler,
        conditioner: Conditioner,
        vae: Optional[AutoencoderKL] = None,
        loss_fn: Optional[StandardDiffusionLoss] = None,
        guider=None,
        scale_factor: float = 0.18215,
        input_key: str = "jpg",
        freeze_policy: str = "none",
        use_ema: bool = False,
        ema_decay: float = 0.9999,
    ):
        self.network = network
        self.denoiser = denoiser
        self.sampler = sampler
        self.conditioner = conditioner
        self.vae = vae
        self.loss_fn = loss_fn
        self.guider = guider if guider is not None else VanillaCFG(scale=7.5)
        self.scale_factor = scale_factor
        self.input_key = input_key
        self.freeze_policy = freeze_policy
        self.use_ema = use_ema
        self.ema_decay = ema_decay

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, example_batch: Dict,
                    fast: bool = False) -> Dict:
        """Build the full param tree from an example batch (shapes only).

        fast=True skips the eager flax init trace (which takes >1h for the
        full SD-scale model on a throttled host / over the device tunnel) by
        materializing the eval_shape'd tree directly: norm scales as ones,
        everything else zeros.  Intended for inference, where a checkpoint is
        overlaid right after (load_params)."""
        if not fast:
            return self._init_params_impl(rng, example_batch)
        shapes = jax.eval_shape(
            lambda r: self._init_params_impl(r, example_batch), rng
        )
        import flax

        flat = flax.traverse_util.flatten_dict(
            shapes, keep_empty_nodes=False, sep="/"
        )
        out = {}
        for k, s in flat.items():
            if s is None:  # parameterless embedders report None
                out[k] = None
                continue
            leaf = k.rsplit("/", 1)[-1]
            fill = jnp.ones if leaf in ("scale", "gamma") else jnp.zeros
            out[k] = fill(s.shape, s.dtype)
        params = flax.traverse_util.unflatten_dict(out, sep="/")
        if self.vae is not None and "vae" in params:
            # re-wire with concrete arrays (the trace-time wiring closed over
            # abstract values)
            self._wire_vae_embedders(params["vae"])
        return params

    def _init_params_impl(self, rng: jax.Array, example_batch: Dict) -> Dict:
        k_net, k_vae, k_cond, k_x = jax.random.split(rng, 4)
        params: Dict[str, Any] = {}

        prepared = self.conditioner.prepare(example_batch)
        params["conditioner"] = self.conditioner.init_params(k_cond, example_batch)

        if self.input_key in example_batch:
            x = jnp.asarray(example_batch[self.input_key])
        else:
            # inference batches carry no clean video; derive the pixel shape
            # from the control hint (same H,W as the clip)
            hint = jnp.asarray(example_batch["control_hint"])
            x = jnp.zeros(hint.shape[:-1] + (3,), dtype=jnp.float32)
        if self.vae is not None:
            # full __call__ so both encoder and decoder params are created
            params["vae"] = self.vae.init(k_vae, x, None, False)["params"]
            self._wire_vae_embedders(params["vae"])
            z = self.encode_first_stage(params, x)
        else:
            z = x

        cond = self.conditioner.embed(params["conditioner"], prepared)
        cond = self._cond_to_latent(params, cond)
        t = jnp.zeros((z.shape[0],), dtype=jnp.float32)
        params["network"] = self.network.init(k_net, z, t, cond)["params"]
        return params

    def _wire_vae_embedders(self, vae_params):
        """Give VAEEmbedder instances access to the shared first stage
        (diffusion.py:375-385)."""
        from ..conditioning.embedders import VAEEmbedder

        def vae_encode_mode(x, rng=None):
            moments = self.vae.apply(
                {"params": vae_params}, x, method=AutoencoderKL.encode_moments
            )
            dist = DiagonalGaussian(moments)
            # reference SAMPLES the posterior (autoencoder.py:330); with no
            # rng (inference / parity tests) use the deterministic mode
            z = dist.mode() if rng is None else dist.sample(rng)
            return z * self.scale_factor

        for spec in self.conditioner.specs:
            if isinstance(spec.embedder, VAEEmbedder):
                spec.embedder.vae_apply = vae_encode_mode

    def _cond_to_latent(self, params, cond: Dict) -> Dict:
        """Apply any cond post-processing that needs engine-owned modules."""
        return cond

    # ------------------------------------------------------------------
    # first stage
    # ------------------------------------------------------------------
    @property
    def latent_factor(self) -> int:
        """Pixel->latent spatial downsampling of the first stage (f=8 for the
        shipped KL-VAE)."""
        return 2 ** (len(self.vae.ch_mult) - 1) if self.vae is not None else 1

    def encode_first_stage(
        self, params, x, rng: Optional[jax.Array] = None
    ) -> jnp.ndarray:
        """pixels in [-1,1] -> scaled latents (diffusion.py:158-163).
        Deterministic (posterior mode) unless rng is given.  uint8 pixels
        are accepted and dequantized on device (cheap-upload path).
        With no VAE (IdentityFirstStage, autoencoder.py:596-615) this is
        the identity — the toy configs diffuse pixels directly."""
        x = as_float_frames(x)
        if self.vae is None:
            return x
        moments = self.vae.apply(
            {"params": params["vae"]}, x, method=AutoencoderKL.encode_moments
        )
        post = DiagonalGaussian(moments)
        z = post.sample(rng) if rng is not None else post.mode()
        return z * self.scale_factor

    def decode_first_stage(self, params, z) -> jnp.ndarray:
        if self.vae is None:
            return z
        return self.vae.apply(
            {"params": params["vae"]}, z / self.scale_factor,
            method=AutoencoderKL.decode,
        )

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------
    def _network_fn(self, net_params) -> Callable:
        def fn(x, c_noise, cond):
            return self.network.apply({"params": net_params}, x, c_noise, cond)

        return fn

    def _hoist_control_hint(self, net_params, cond_cat: Dict) -> Dict:
        """The ControlNet hint pyramid depends only on the hint, so under the
        sampling scan it is loop-invariant.  Precompute it once here (outside
        the scan's network call site) and swap ``control_hint`` for
        ``control_hint_features`` — bit-identical output, saves the 8-conv
        full-res pyramid on every NFE row (~59x per clip)."""
        if "control_hint" not in cond_cat:
            return cond_cat
        if not hasattr(self.network, "encode_control_hint"):
            return cond_cat
        if getattr(self.network, "controlnet", None) is None:
            return cond_cat
        encode = getattr(self, "_hint_encode_jit", None)
        if encode is None:
            # jit (cached on the instance) so the eager CLI path runs the
            # pyramid as ONE device execution instead of ~16 op-by-op RPC
            # dispatches; params enter as an argument, not a captured const.
            # Under an outer jit (sharded sampling) tracing just inlines it.
            encode = jax.jit(
                lambda p, h: self.network.apply(
                    {"params": p}, h, method=type(self.network).encode_control_hint,
                )
            )
            self._hint_encode_jit = encode
        feats = encode(net_params, cond_cat["control_hint"])
        out = dict(cond_cat)
        del out["control_hint"]
        out["control_hint_features"] = feats
        return out

    def make_denoise_fn(self, params, cond: Dict, uc: Optional[Dict],
                        guider_scale=None) -> Callable:
        """Returns denoise_fn(x, sigma_scalar) with CFG folded in; the
        conditioning concat happens once, outside the sampling scan.

        ``guider_scale`` (optional) overrides the guider's constructor scale
        and rides the ctx tuple, so when passed as a traced jit argument a
        guidance-strength sweep reuses one compiled program (None = use the
        guider's static scale, identical program to before).

        When the sampler runs in segmented mode (its own per-chunk jits), the
        weights must flow through jit ARGUMENTS, so a (fn, ctx) pair is
        returned instead — closure capture would serialize ~6GB of params
        into the HLO as constants."""
        guider = self.guider if uc is not None else IdentityGuider()
        cond_cat = guider.prepare_cond(cond, uc)
        cond_cat = self._hoist_control_hint(params["network"], cond_cat)

        def denoise_ctx(ctx, x, sigma):
            net_params, cc, gs = ctx
            net = self._network_fn(net_params)
            sigma_vec = jnp.broadcast_to(
                jnp.asarray(sigma, dtype=jnp.float32), (x.shape[0],)
            )
            x2, s2 = guider.expand(x, sigma_vec)
            out = self.denoiser(net, x2, s2, cc)
            return guider.combine(out, sigma_vec, scale=gs)

        ctx = (params["network"], cond_cat, guider_scale)
        if getattr(self.sampler, "segment_size", 0):
            return (denoise_ctx, ctx)

        def denoise_fn(x, sigma):
            return denoise_ctx(ctx, x, sigma)

        return denoise_fn

    def sample(
        self,
        params,
        cond: Dict,
        uc: Optional[Dict],
        shape: Sequence[int],
        rng: jax.Array,
        num_steps: Optional[int] = None,
        x_prior: Optional[jnp.ndarray] = None,
        prior_coefficient: float = 0.0,
        prior_noise_coefficient: float = 1.0,
        mode: str = "full",          # full | sdedit | skip_steps
        sdedit_steps: int = 0,
        inpaint_x0: Optional[jnp.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        init_noise: Optional[jnp.ndarray] = None,
        loop_noise: Optional[jnp.ndarray] = None,
        guider_scale=None,
    ) -> jnp.ndarray:
        """Draw latents.

        * mode="full": start from noise; x_prior mixing follows
          sampling_tv2v.py:371-376: randn = c_x*z_prior + c_noise*randn.
        * mode="sdedit": x_prior must be the clean video latent; the start is
          (z + noise*sigma_0)/sqrt(1+sigma_0^2) on the sampler's (img2img-
          pruned) schedule — sampling_tv2v.py:429-446.  The sampler's own
          prepare rescale then restores z + noise*sigma_0 exactly.
        * mode="skip_steps": sampler-level sdedit (sampling.py:270-293) —
          run only the last ``sdedit_steps`` iterations of the full schedule;
          x_prior must already be noised.
        * inpaint_x0/inpaint_mask: per-step mask-blend of the noised clean
          latent (sampling.py:138-165); mask 1 = generate, 0 = keep x0.
        * init_noise / loop_noise: externally supplied noise tensors (the
          SURVEY §7.1 parity harness): init_noise replaces the start-of-chain
          gaussian; loop_noise (num_steps, *shape) replaces the per-step
          ancestral draws.  Production uses jax.random; parity tests feed the
          reference's torch noise stream through these.
        """
        k_init, k_loop = jax.random.split(rng)
        if init_noise is not None:
            noise = jnp.asarray(init_noise, dtype=jnp.float32)
            assert tuple(noise.shape) == tuple(shape), (noise.shape, shape)
        else:
            noise = jax.random.normal(k_init, tuple(shape), dtype=jnp.float32)
        denoise_fn = self.make_denoise_fn(params, cond, uc,
                                          guider_scale=guider_scale)

        if mode == "sdedit":
            assert x_prior is not None, "sdedit needs the clean video latent"
            sigma0 = float(self.sampler.get_sigmas(num_steps)[0])
            x = (x_prior + noise * sigma0) / float(np.sqrt(1.0 + sigma0**2))
        elif mode == "skip_steps":
            assert x_prior is not None
            x = x_prior
        else:
            x = noise
            # the coefficients may be traced scalars (the sampling CLIs pass
            # them as jit ARGUMENTS so a serving-time coefficient sweep
            # reuses one compiled program); only a static python zero can
            # skip the mix
            static_zero = (isinstance(prior_coefficient, (int, float))
                           and prior_coefficient == 0.0)
            if x_prior is not None and not static_zero:
                x = prior_noise_coefficient * x + prior_coefficient * x_prior

        if mode == "skip_steps":
            return self.sampler.sdedit(sdedit_steps, denoise_fn, x, k_loop,
                                       num_steps, noise_override=loop_noise)
        if inpaint_x0 is not None:
            assert inpaint_mask is not None
            # loop_noise here may be a {"loop": rows, "pre": rows} dict — the
            # inpaint path draws TWO noise streams per step (img_orig blend +
            # ancestral); see BaseSampler.sample_inpainting
            return self.sampler.sample_inpainting(
                denoise_fn, x, k_loop, inpaint_x0, inpaint_mask, num_steps,
                noise_override=loop_noise,
            )
        return self.sampler(denoise_fn, x, k_loop, num_steps=num_steps,
                            noise_override=loop_noise)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def make_optimizer(self, learning_rate, params) -> optax.GradientTransformation:
        mask = freeze_mask(params["network"], self.freeze_policy)
        full_mask = {
            "network": mask,
            "conditioner": jax.tree_util.tree_map(lambda _: False, params.get("conditioner", {})),
            "vae": jax.tree_util.tree_map(lambda _: False, params.get("vae", {})),
        }
        full_mask = {k: v for k, v in full_mask.items() if k in params}
        labels = jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze", full_mask
        )
        return optax.multi_transform(
            {
                "train": optax.adamw(learning_rate=learning_rate, weight_decay=1e-2),
                "freeze": optax.set_to_zero(),
            },
            labels,
        )

    # EMA shadows only the TRAINABLE network subtree: frozen params never
    # change, and the EMA of a constant is the constant — shadowing them
    # (the reference's LitEma copies every buffer, sgm/modules/ema.py:15-29)
    # wastes ~60% of the shadow's HBM at the CCEdit freeze policies on a
    # 16 GB chip.  merge_ema() reconstitutes the full-tree shadow exactly.
    def ema_subset(self, net_params):
        flat = flax.traverse_util.flatten_dict(net_params)
        mask = flax.traverse_util.flatten_dict(
            freeze_mask(net_params, self.freeze_policy))
        return flax.traverse_util.unflatten_dict(
            {k: v for k, v in flat.items() if mask[k]})

    def merge_ema(self, net_params, shadow):
        """Full network params with EMA values on the trainable leaves."""
        flat = dict(flax.traverse_util.flatten_dict(net_params))
        flat.update(flax.traverse_util.flatten_dict(shadow))
        return flax.traverse_util.unflatten_dict(flat)

    def create_train_state(self, params, tx) -> TrainState:
        state = TrainState(
            params=params,
            opt_state=tx.init(params),
            step=jnp.asarray(0, dtype=jnp.int32),
            ema=EmaState.create(self.ema_subset(params["network"]),
                                self.ema_decay) if self.use_ema else None,
        )
        return state

    def loss(self, params, prepared_batch: Dict, rng: jax.Array) -> jnp.ndarray:
        k_cond, k_vae, k_loss = jax.random.split(rng, 3)
        cond = self.conditioner.embed(
            params["conditioner"], prepared_batch, rng=k_cond, apply_ucg=True
        )
        x = jnp.asarray(prepared_batch[self.input_key])
        z = self.encode_first_stage(params, x, rng=k_vae) if self.vae is not None else x
        net = self._network_fn(params["network"])
        losses = self.loss_fn(k_loss, net, self.denoiser, cond, z)
        return jnp.mean(losses)

    def make_train_step(self, tx) -> Callable:
        def train_step(state: TrainState, prepared_batch: Dict, rng: jax.Array):
            def loss_fn(params):
                return self.loss(params, prepared_batch, rng)

            loss_val, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = (state.ema.update(self.ema_subset(params["network"]))
                   if state.ema is not None else None)
            return (
                TrainState(params, opt_state, state.step + 1, ema),
                {"loss": loss_val},
            )

        return train_step
