"""The SD-1.5 UNet, 2D and pseudo-3D, with ControlNet injection points.

Behavioural parity targets (studied, not copied):
  * UNetModel (2D)        — sgm/modules/diffusionmodules/openaimodel.py:1003-1578
  * UNetModel3D           — openaimodel.py:1581-1639 (temporal stem + head)
  * unet_type switch      — openaimodel.py:1085-1125
  * ControlledUNetModel3DTV2V.forward — controlmodel.py:471-550 (control added
    in the decoder, img_control added onto the *center frame* in the encoder)
  * Interpolate variant   — controlmodel.py:556-617 (first/last-frame injection)

TPU-first notes: channels-last; the reference's mutable ``control.pop()``
lists become positional tuples; the hooked CFCA reference bank becomes the
explicit ``ref_contexts`` input (first 7 transformers in DFS order = 6 encoder
+ 1 middle for the SD-1.5 layout).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import zeros as zeros_init

from ..ops.quant import QConv
from .blocks import (
    Downsample,
    Downsample3D,
    ResBlock,
    ResBlock3D,
    TemporalConv,
    Upsample,
    Upsample3D,
    spatial_temporal,
)
from .layers import TimeEmbed, timestep_embedding
from .transformer import SpatialTransformer, SpatialTransformer3D, SpatialTransformer3DCA

Dtype = Any

# number of CFCA transformers fed by the reference bank: 6 encoder + 1 middle
# (controlmodel.py:496-503 "the first 7 st modules")
NUM_REF_CFCA = 7


class UNetModel(nn.Module):
    """Full UNet.  ``unet_type`` selects 2D ((N,H,W,C) input) or pseudo-3D
    ((B,T,H,W,C) input).  When used as a ControlNet trunk, set
    ``encoder_only=True`` (no output blocks / head)."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: Any = 2  # int or per-level list
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    num_head_channels: int = -1
    transformer_depth: Any = 1  # int or per-level list
    context_dim: Optional[int] = 768
    use_spatial_transformer: bool = True
    use_linear_in_transformer: bool = False
    legacy: bool = False
    unet_type: str = "2d"  # "2d" | "pseudo-3d"
    conv_resample: bool = True
    resblock_updown: bool = False
    use_scale_shift_norm: bool = False
    disable_text_ca: bool = False
    enable_ref_attn: bool = False  # 2D RAIG reference attention
    disable_temporal_text_ca: bool = True
    enable_attention3d_crossframe: bool = False
    st3dca_ca_type: str = "center"
    use_learnable_alpha: bool = False
    adm_in_channels: Optional[int] = None  # vector conditioning (SDXL 'sequential')
    encoder_only: bool = False
    use_remat: bool = False  # activation rematerialization (the reference's
    # use_checkpoint flag, diffusionmodules/util.py:46-241) — trades FLOPs for
    # HBM in training; applied per res/attn block
    remat_policy: Optional[str] = None  # jax.checkpoint_policies name, e.g.
    # "dots_with_no_batch_dims_saveable": save dense-layer outputs in fwd so
    # bwd skips their recompute (costs HBM; None = recompute everything)
    dtype: Dtype = jnp.float32

    def _remat(self, cls):
        if self.remat_policy:
            import jax

            return nn.remat(
                cls, policy=getattr(jax.checkpoint_policies, self.remat_policy)
            )
        return nn.remat(cls)

    @property
    def is_video(self) -> bool:
        return self.unet_type == "pseudo-3d"

    # ------------------------------------------------------------------
    def _nrb(self, level: int) -> int:
        n = self.num_res_blocks
        return n[level] if isinstance(n, (list, tuple)) else n

    def _tdepth(self, level: int) -> int:
        d = self.transformer_depth
        return d[level] if isinstance(d, (list, tuple)) else d

    def _heads_dims(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            n_heads, d_head = self.num_heads, ch // self.num_heads
        else:
            n_heads, d_head = ch // self.num_head_channels, self.num_head_channels
        if self.legacy:
            d_head = ch // self.num_heads if self.use_spatial_transformer else self.num_head_channels
        return n_heads, d_head

    def _make_res(self, ch, out_ch, name, up=False, down=False):
        cls = ResBlock3D if self.is_video else ResBlock
        if self.use_remat:
            cls = self._remat(cls)
        kw = {}
        if self.is_video:
            kw["use_learnable_alpha"] = self.use_learnable_alpha
        return cls(
            channels=ch,
            emb_channels=4 * self.model_channels,
            out_channels=out_ch,
            use_scale_shift_norm=self.use_scale_shift_norm,
            up=up,
            down=down,
            dtype=self.dtype,
            name=name,
            **kw,
        )

    def _make_transformer(self, ch, depth, name):
        n_heads, d_head = self._heads_dims(ch)
        if self.is_video:
            cls = (
                SpatialTransformer3DCA
                if self.enable_attention3d_crossframe
                else SpatialTransformer3D
            )
            if self.use_remat:
                cls = self._remat(cls)
            kw = dict(
                disable_temporal_text_ca=self.disable_temporal_text_ca,
                use_learnable_alpha=self.use_learnable_alpha,
            )
            if self.enable_attention3d_crossframe:
                kw["ca_type"] = self.st3dca_ca_type
            return cls(
                in_channels=ch, n_heads=n_heads, d_head=d_head, depth=depth,
                context_dim=self.context_dim,
                use_linear=self.use_linear_in_transformer,
                dtype=self.dtype, name=name, **kw,
            )
        cls2d = SpatialTransformer
        if self.enable_ref_attn:
            from .transformer import SpatialTransformerCA

            cls2d = SpatialTransformerCA
        if self.use_remat:
            cls2d = self._remat(cls2d)
        return cls2d(
            in_channels=ch, n_heads=n_heads, d_head=d_head, depth=depth,
            context_dim=self.context_dim,
            use_linear=self.use_linear_in_transformer,
            disable_text_ca=self.disable_text_ca,
            dtype=self.dtype, name=name,
        )

    def _make_downsample(self, ch, name):
        cls = Downsample3D if self.is_video else Downsample
        return cls(ch, use_conv=self.conv_resample, dtype=self.dtype, name=name)

    def _make_upsample(self, ch, name):
        cls = Upsample3D if self.is_video else Upsample
        return cls(ch, use_conv=self.conv_resample, dtype=self.dtype, name=name)

    # ------------------------------------------------------------------
    def setup(self):
        ch = self.model_channels
        self.time_embed = TimeEmbed(4 * ch, dtype=self.dtype, name="time_embed")
        if self.adm_in_channels is not None:
            self.label_emb = TimeEmbed(4 * ch, dtype=self.dtype, name="label_emb")

        # --- encoder ---
        input_blocks = [[("conv_in", QConv(ch, (3, 3), padding="SAME",
                                             dtype=self.dtype, name="conv_in"))]]
        enc_chans = [ch]
        cur = ch
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for nr in range(self._nrb(level)):
                blk = [("res", self._make_res(cur, mult * ch, f"in_{level}_{nr}_res"))]
                cur = mult * ch
                if ds in self.attention_resolutions and self.use_spatial_transformer:
                    blk.append(
                        ("attn", self._make_transformer(cur, self._tdepth(level),
                                                        f"in_{level}_{nr}_attn"))
                    )
                input_blocks.append(blk)
                enc_chans.append(cur)
            if level != len(self.channel_mult) - 1:
                input_blocks.append(
                    [("down", self._make_downsample(cur, f"in_{level}_down"))]
                )
                enc_chans.append(cur)
                ds *= 2
        self.input_blocks = input_blocks

        if self.is_video:
            self.input_blocks_temporal = TemporalConv(
                ch, dtype=self.dtype, name="input_blocks_temporal"
            )

        # --- middle ---
        n_levels = len(self.channel_mult)
        self.middle_block = [
            ("res", self._make_res(cur, cur, "mid_res1")),
            ("attn", self._make_transformer(cur, self._tdepth(n_levels - 1), "mid_attn")),
            ("res", self._make_res(cur, cur, "mid_res2")),
        ]

        if self.encoder_only:
            return

        # --- decoder ---
        output_blocks = []
        chans = list(enc_chans)
        ds_dec = ds
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self._nrb(level) + 1):
                ich = chans.pop()
                blk = [("res", self._make_res(cur + ich, mult * ch,
                                              f"out_{level}_{i}_res"))]
                cur = mult * ch
                if ds_dec in self.attention_resolutions and self.use_spatial_transformer:
                    blk.append(
                        ("attn", self._make_transformer(cur, self._tdepth(level),
                                                        f"out_{level}_{i}_attn"))
                    )
                if level and i == self._nrb(level):
                    blk.append(("up", self._make_upsample(cur, f"out_{level}_up")))
                    ds_dec //= 2
                output_blocks.append(blk)
        self.output_blocks = output_blocks

        self.out_norm = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     dtype=self.dtype, name="out_norm")
        self.out_conv = QConv(
            self.out_channels, (3, 3), padding="SAME",
            kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, name="out_conv",
        )
        if self.is_video:
            self.out_temporal = TemporalConv(
                self.out_channels, dtype=self.dtype, name="out_temporal"
            )

    # ------------------------------------------------------------------
    def _apply_block(self, blk, h, emb, context, st_state):
        """Apply one input/middle/output block (list of (kind, module))."""
        for kind, mod in blk:
            if kind == "res":
                h = mod(h, emb)
            elif kind == "attn":
                ref_ctx = None
                if st_state is not None:
                    idx, refs = st_state
                    if refs is not None and idx[0] < len(refs):
                        ref_ctx = refs[idx[0]]
                    idx[0] += 1
                if self.is_video or self.enable_ref_attn:
                    h = mod(h, context=context, ref_context=ref_ctx)
                else:
                    h = mod(h, context=context)
            else:  # down / up / conv_in
                h = mod(h)
        return h

    def _embed(self, timesteps, y):
        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = self.time_embed(t_emb)
        if self.adm_in_channels is not None:
            assert y is not None, "model is vector-conditional but y is None"
            emb = emb + self.label_emb(y)
        return emb

    def __call__(
        self,
        x,
        timesteps,
        context=None,
        y=None,
        control: Optional[Tuple] = None,
        img_control: Optional[Tuple] = None,
        ref_contexts: Optional[Tuple] = None,
        interpolate_control: Optional[Tuple] = None,
        only_mid_control: bool = False,
    ):
        """x: (B,T,H,W,C) video latents (or (N,H,W,C) for 2D).

        control            — 13-tuple of encoder+middle residuals, added in
                             the *decoder* (structure branch).
        img_control        — 13-tuple of (B,H',W',C) maps added onto the
                             *center frame* in the encoder (appearance branch).
        ref_contexts       — 7-tuple of (B, hw, C) token banks for CFCA
                             reference mode.
        interpolate_control— ((13 first-frame maps), (13 last-frame maps)).
        """
        emb = self._embed(timesteps, y)
        st_state = ([0], ref_contexts)
        control = list(control) if control is not None else None
        img_control = list(img_control) if img_control is not None else None
        if interpolate_control is not None:
            ic_first, ic_last = [list(c) for c in interpolate_control]
        else:
            ic_first = ic_last = None

        hs = []
        h = x
        for i, blk in enumerate(self.input_blocks):
            if i == 0 and self.is_video:
                conv_in = blk[0][1]
                h = spatial_temporal(h, conv_in, self.input_blocks_temporal)
            else:
                h = self._apply_block(blk, h, emb, context, st_state)
            if img_control is not None and not only_mid_control:
                t_mid = h.shape[1] // 2
                h = h.at[:, t_mid].add(img_control.pop(0))
            if ic_first is not None:
                h = h.at[:, 0].add(ic_first.pop(0))
                h = h.at[:, -1].add(ic_last.pop(0))
            hs.append(h)

        h = self._apply_block(self.middle_block, h, emb, context, st_state)
        if img_control is not None:
            h = h.at[:, h.shape[1] // 2].add(img_control.pop(0))
        if ic_first is not None:
            h = h.at[:, 0].add(ic_first.pop(0))
            h = h.at[:, -1].add(ic_last.pop(0))
        if control is not None:
            h = h + control.pop()

        for blk in self.output_blocks:
            if only_mid_control or control is None:
                h = jnp.concatenate([h, hs.pop()], axis=-1)
            else:
                h = jnp.concatenate([h, hs.pop() + control.pop()], axis=-1)
            h = self._apply_block(blk, h, emb, context, st_state)

        if self.is_video:
            def head_spatial(z):
                return self.out_conv(nn.silu(self.out_norm(z)))

            def head_temporal(z):
                return self.out_temporal(nn.silu(z))

            return spatial_temporal(h, head_spatial, head_temporal)
        return self.out_conv(nn.silu(self.out_norm(h)))
