"""ControlNet branches and the composed CCEdit network.

Behavioural parity targets (studied, not copied):
  * ControlNet2D          — controlmodel.py:195-317 (per-frame trunk, 8-conv
    hint pyramid or identity, 13 zero-conv taps, no_add_x mode)
  * ControlledUNetModel3DTV2V + wrapper — controlmodel.py:320-553 +
    wrappers.py:155-207 (hint inversion, center-frame appearance branch,
    CFCA reference bank)
  * Interpolate variant   — controlmodel.py:556-617 + wrappers.py:210-264

TPU-first redesign: the reference splits "network" and "wrapper" and threads
mutable lists/hooks between them; here ``CCEditNetwork`` is one pure module
``(x, t, cond-dict) -> eps`` whose submodules are the UNet and the control
branches — directly jittable, no hooks.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import zeros as zeros_init

from ..ops.quant import QConv
from ..ops.video import fold_time, unfold_time
from .layers import timestep_embedding
from .unet import NUM_REF_CFCA, UNetModel

Dtype = Any

# channel ladder of the ControlNet hint pyramid (controlmodel.py:215-231)
_HINT_CHANNELS = (16, 16, 32, 32, 96, 96, 256)
_HINT_STRIDES = (1, 1, 2, 1, 2, 1, 2)


class HintPyramid(nn.Module):
    """8-conv stride-2 pyramid RGB -> model_channels, zero-ended."""

    model_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        for i, (ch, s) in enumerate(zip(_HINT_CHANNELS, _HINT_STRIDES)):
            pad = "SAME" if s == 1 else ((1, 1), (1, 1))
            h = QConv(ch, (3, 3), strides=(s, s), padding=pad,
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.silu(h)
        return QConv(
            self.model_channels, (3, 3), padding="SAME",
            kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="conv_out",
        )(h)


class ZeroConv2D(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return QConv(
            self.features, (1, 1), kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="conv",
        )(x)


class ControlNet2D(UNetModel):
    """Encoder-half UNet emitting 13 zero-conv'd residual taps.

    Accepts (N,H,W,C) images or (B,T,H,W,C) video (folded per-frame with
    emb/context repeated, controlmodel.py:260-266).
    """

    hint_channels: int = 3
    control_scales: float = 1.0
    no_add_x: bool = False
    input_hint_identity: bool = False  # set_input_hint_block_as_identity
    encoder_only: bool = True
    unet_type: str = "2d"

    def setup(self):
        super().setup()
        if not self.input_hint_identity:
            self.input_hint_block = HintPyramid(
                self.model_channels, dtype=self.dtype, name="input_hint_block"
            )
        zero_convs = []
        ch = self.model_channels
        cur = ch
        k = 0
        zero_convs.append(ZeroConv2D(cur, dtype=self.dtype, name=f"zero_convs_{k}")); k += 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self._nrb(level)):
                cur = mult * ch
                zero_convs.append(ZeroConv2D(cur, dtype=self.dtype, name=f"zero_convs_{k}")); k += 1
            if level != len(self.channel_mult) - 1:
                zero_convs.append(ZeroConv2D(cur, dtype=self.dtype, name=f"zero_convs_{k}")); k += 1
        self.zero_convs = zero_convs
        self.middle_block_out = ZeroConv2D(cur, dtype=self.dtype, name="middle_block_out")

    def encode_hint(self, hint):
        """The hint pyramid alone: RGB-res hint -> latent-res guided features.

        The pyramid depends only on the hint (not on x or t), so under a
        sampling scan it is loop-invariant: precompute once per clip and pass
        the result as ``hint_features`` to skip ~8 full-res convs per NFE row.
        (The reference recomputes it on every forward, controlmodel.py:290-296
        — structural win, not a parity deviation: identical output.)
        """
        is_video = hint.ndim == 5
        b = hint.shape[0] if is_video else None
        if is_video:
            hint = fold_time(hint)
        if self.input_hint_identity:
            guided = self.input_blocks[0][0][1](hint)
        else:
            guided = self.input_hint_block(hint)
        return unfold_time(guided, b) if is_video else guided

    def __call__(  # type: ignore[override]
        self,
        x,
        hint,
        timesteps,
        context=None,
        y=None,
        return_attn_bank: bool = False,
        hint_features=None,
    ):
        is_video = x.ndim == 5
        if is_video:
            b, t = x.shape[0], x.shape[1]
            x = fold_time(x)
            if hint_features is None:
                hint = fold_time(hint)
            else:
                hint_features = fold_time(hint_features)
            timesteps = jnp.repeat(timesteps, t, axis=0)
            context = jnp.repeat(context, t, axis=0) if context is not None else None
            y = jnp.repeat(y, t, axis=0) if y is not None else None

        emb = self._embed(timesteps, y)

        if hint_features is not None:
            guided_hint = hint_features
        elif self.input_hint_identity:
            # latent hint: run it through the stem conv (controlmodel.py:293-296)
            guided_hint = self.input_blocks[0][0][1](hint)
        else:
            guided_hint = self.input_hint_block(hint)

        bank = [] if return_attn_bank else None
        outs = []
        h = x
        for i, blk in enumerate(self.input_blocks):
            if i == 0:
                if self.no_add_x:
                    h = guided_hint
                else:
                    h = self._apply_block(blk, h, emb, context, None)
                    h = h + guided_hint
            else:
                h = self._apply_block_banked(blk, h, emb, context, bank)
            outs.append(self.zero_convs[i](h))

        h = self._apply_block_banked(self.middle_block, h, emb, context, bank)
        outs.append(self.middle_block_out(h))

        control = [o * self.control_scales for o in outs]
        if is_video:
            control = [unfold_time(o, b) for o in control]
        if return_attn_bank:
            return tuple(control), tuple(bank)
        return tuple(control)

    def _apply_block_banked(self, blk, h, emb, context, bank):
        for kind, mod in blk:
            if kind == "res":
                h = mod(h, emb)
            elif kind == "attn":
                h = mod(h, context=context)
                if bank is not None and len(bank) < NUM_REF_CFCA:
                    bank.append(h)
            else:
                h = mod(h)
        return h


class HintPyramidLatent(nn.Module):
    """ControlNet3D's stride-1 hint block (controlmodel.py:49-66): keeps the
    hint at latent resolution, zero-ended."""

    model_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        for i, ch in enumerate(_HINT_CHANNELS):
            h = QConv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.silu(h)
        return QConv(
            self.model_channels, (3, 3), padding="SAME",
            kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="conv_out",
        )(h)


class ControlNet3D(UNetModel):
    """Temporal-aware control branch (controlmodel.py:23-190): pseudo-3D
    encoder trunk with per-scale pseudo-3D zero-conv taps (2D zero conv +
    zero temporal conv).  Unused by the shipped CCEdit configs but part of
    the reference surface.  Input: (B, T, h, w, C) latents + latent-res hint.

    ``disable_temporal`` (controlmodel.py:102-190): operate on the *center
    frame only* — the trunk runs with T=1, where every zero-init temporal twin
    contributes nothing, matching the reference's module-stripping for
    2D-initialized checkpoints; taps are emitted as (B, h', w', C) maps."""

    hint_channels: int = 4
    control_scales: float = 1.0
    disable_temporal: bool = False
    encoder_only: bool = True
    unet_type: str = "pseudo-3d"

    def setup(self):
        super().setup()
        from .blocks import TemporalConv, spatial_temporal

        self._spatial_temporal = spatial_temporal
        self.input_hint_block = HintPyramidLatent(
            self.model_channels, dtype=self.dtype, name="input_hint_block"
        )
        zero_convs = []
        zero_convs_t = []
        ch = self.model_channels
        cur = ch
        k = 0

        def add(c):
            nonlocal k
            zero_convs.append(ZeroConv2D(c, dtype=self.dtype, name=f"zero_convs_{k}"))
            zero_convs_t.append(
                TemporalConv(c, kernel_size=1, dtype=self.dtype,
                             name=f"zero_convs_temporal_{k}")
            )
            k += 1

        add(cur)
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self._nrb(level)):
                cur = mult * ch
                add(cur)
            if level != len(self.channel_mult) - 1:
                add(cur)
        self.zero_convs = zero_convs
        self.zero_convs_temporal = zero_convs_t
        self.middle_block_out = ZeroConv2D(cur, dtype=self.dtype, name="middle_block_out")
        self.middle_block_out_temporal = TemporalConv(
            cur, kernel_size=1, dtype=self.dtype, name="middle_block_out_temporal"
        )

    def __call__(self, x, hint, timesteps, context=None, y=None):  # type: ignore[override]
        from .blocks import spatial_temporal

        if self.disable_temporal:
            t_mid = x.shape[1] // 2
            x = x[:, t_mid : t_mid + 1]
            if hint.ndim == 5:
                hint = hint[:, t_mid : t_mid + 1]
            else:
                hint = hint[:, None]

        b, t = x.shape[0], x.shape[1]
        emb = self._embed(timesteps, y)
        guided = fold_time(hint)
        guided = self.input_hint_block(guided)
        guided = unfold_time(guided, b)

        outs = []
        h = x
        for i, blk in enumerate(self.input_blocks):
            if i == 0:
                conv_in = blk[0][1]
                h = spatial_temporal(h, conv_in, self.input_blocks_temporal)
                h = h + guided
            else:
                h = self._apply_block(blk, h, emb, context, None)
            outs.append(
                spatial_temporal(h, self.zero_convs[i], self.zero_convs_temporal[i])
            )
        h = self._apply_block(self.middle_block, h, emb, context, None)
        outs.append(
            spatial_temporal(h, self.middle_block_out, self.middle_block_out_temporal)
        )
        if self.disable_temporal:
            # center-frame maps (B, h', w', C)
            return tuple(o[:, 0] * self.control_scales for o in outs)
        return tuple(o * self.control_scales for o in outs)


def raig_ref_mapping(channel_mult, num_res_blocks, attention_resolutions):
    """Bank index for every UNet transformer in application order.

    Generalizes the reference's hardcoded SD-1.5 table (controlmodel.py:
    658-678, {0..6, 5,5,4,3,3,2,1,1,0}): encoder/middle transformers use
    their own banked activation; each decoder level reuses its encoder
    level's banks in reverse, front-padded with the level's last bank.
    """
    nrb = (
        list(num_res_blocks)
        if isinstance(num_res_blocks, (list, tuple))
        else [num_res_blocks] * len(channel_mult)
    )
    enc_banks_per_level = {}
    mapping = []
    ds = 1
    k = 0
    for level in range(len(channel_mult)):
        banks = []
        if ds in attention_resolutions:
            for _ in range(nrb[level]):
                banks.append(k)
                mapping.append(k)
                k += 1
        enc_banks_per_level[level] = banks
        if level != len(channel_mult) - 1:
            ds *= 2
    mapping.append(k)  # middle
    k += 1
    ds_dec = ds
    for level in reversed(range(len(channel_mult))):
        if ds_dec in attention_resolutions:
            banks = list(reversed(enc_banks_per_level[level]))
            n_slots = nrb[level] + 1
            banks = [banks[0]] * (n_slots - len(banks)) + banks
            mapping.extend(banks)
        if level:
            ds_dec //= 2
    return tuple(mapping)


class CCEditNetwork(nn.Module):
    """The composed CCEdit denoising network: pseudo-3D UNet + structure
    ControlNet (+ optional appearance ControlNet with center-frame injection
    and CFCA reference bank).  One pure function ``(x, t, cond) -> eps``.

    cond keys (wrappers.py:155-207 + conditioner routing):
      crossattn     (B, L, D) text tokens
      vector        (B, adm) optional
      concat        channel-concat latents, optional
      control_hint  (B, T, H, W, 3) in [-1, 1] — inverted ControlNet-1.1 style
      cond_feat     (B, h, w, 4) VAE latent of the edited reference frame
      interpolate_first_last (B, 2, h, w, 4) for the interpolation variant
    """

    unet: UNetModel
    controlnet: Optional[ControlNet2D] = None
    controlnet_img: Optional[ControlNet2D] = None
    crossframe_type: Optional[str] = None  # None | 'reference'
    interpolate: bool = False
    raig: bool = False  # 2D reference-attention image generation

    def encode_control_hint(self, control_hint):
        """Inversion + hint pyramid, once per clip.  Returns latent-res
        features to pass as ``cond["control_hint_features"]`` (in place of
        ``control_hint``) — bit-identical output, saves the 8-conv full-res
        pyramid on every one of the scan's network evals."""
        hint = 1.0 - (control_hint + 1.0) / 2.0
        return self.controlnet.encode_hint(hint)

    def __call__(self, x, timesteps, cond):
        context = cond.get("crossattn")
        y = cond.get("vector")
        concat = cond.get("concat")
        if concat is not None:
            x = jnp.concatenate([x, concat], axis=-1)

        if self.raig:
            # 2D reference-attention path (OpenAIWrapperRAIG, wrappers.py:47-79
            # + ControlledUNetModel2DRAIG, controlmodel.py:620-719): the
            # appearance branch is run only to bank its transformer
            # activations; every UNet ST attends to a mapped bank entry.
            _, bank = self.controlnet_img(
                x, cond["cond_feat"], timesteps, context=context, y=y,
                return_attn_bank=True,
            )
            tok = [a.reshape(a.shape[0], -1, a.shape[-1]) for a in bank]
            mapping = raig_ref_mapping(
                self.unet.channel_mult, self.unet.num_res_blocks,
                self.unet.attention_resolutions,
            )
            refs = tuple(tok[m] for m in mapping)
            return self.unet(x, timesteps, context=context, y=y, ref_contexts=refs)

        control = None
        if self.controlnet is not None and "control_hint_features" in cond:
            # hint pyramid precomputed once per clip (loop-invariant under the
            # sampling scan) via `encode_control_hint`
            control = self.controlnet(
                x, None, timesteps, context=context, y=y,
                hint_features=cond["control_hint_features"])
        elif self.controlnet is not None and "control_hint" in cond:
            hint = cond["control_hint"]
            hint = 1.0 - (hint + 1.0) / 2.0  # ControlNet-1.1 inversion (wrappers.py:160-162)
            control = self.controlnet(x, hint, timesteps, context=context, y=y)

        img_control = None
        ref_contexts = None
        interpolate_control = None

        if self.interpolate:
            ifl = cond["interpolate_first_last"]  # (B, 2, h, w, C)
            x_fl = jnp.concatenate([x[:, 0], x[:, -1]], axis=0)
            hint_fl = jnp.concatenate([ifl[:, 0], ifl[:, 1]], axis=0)
            t_fl = jnp.concatenate([timesteps, timesteps], axis=0)
            ctx_fl = (
                jnp.concatenate([context, context], axis=0)
                if context is not None else None
            )
            y_fl = jnp.concatenate([y, y], axis=0) if y is not None else None
            ctl = self.controlnet_img(x_fl, hint_fl, t_fl, context=ctx_fl, y=y_fl)
            firsts, lasts = zip(*(jnp.split(c, 2, axis=0) for c in ctl))
            interpolate_control = (tuple(firsts), tuple(lasts))
        elif self.controlnet_img is not None and "cond_feat" in cond:
            t_mid = x.shape[1] // 2
            x_center = x[:, t_mid]
            want_bank = self.crossframe_type == "reference"
            out = self.controlnet_img(
                x_center, cond["cond_feat"], timesteps, context=context, y=y,
                return_attn_bank=want_bank,
            )
            if want_bank:
                img_control, bank = out
                # (B, H, W, C) activations -> (B, H*W, C) token banks
                ref_contexts = tuple(
                    a.reshape(a.shape[0], -1, a.shape[-1]) for a in bank
                )
            else:
                img_control = out

        return self.unet(
            x,
            timesteps,
            context=context,
            y=y,
            control=control,
            img_control=img_control,
            ref_contexts=ref_contexts,
            interpolate_control=interpolate_control,
        )
