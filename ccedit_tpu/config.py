"""Config system: reference-YAML compatibility + typed builders.

The reference wires everything through ``instantiate_from_config`` on
``{target: python.path, params: {...}}`` trees (sgm/util.py:168-185) merged by
OmegaConf with CLI dotlists (main.py:711-713).  Here the same YAML files are
accepted (BASELINE.json requirement) but resolve through an explicit mapping
of reference target paths to our TPU-native constructors — no reflective
imports, every component remains a typed object.

Public API:
  load_config(paths, overrides) -> dict  (deep merge + key=value dotlist)
  build_engine(cfg)             -> CCEditEngine
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import yaml

from .conditioning.conditioner import Conditioner, EmbedderSpec
from .conditioning import embedders as E
from .diffusion import (
    DiscreteDenoiser,
    Denoiser,
    StandardDiffusionLoss,
    make_discretization,
    make_sampler,
    make_sigma_sampler,
)
from .diffusion.guidance import IdentityGuider, VanillaCFG
from .models.engine import CCEditEngine
from .modules.controlnet import CCEditNetwork, ControlNet2D
from .modules.unet import UNetModel
from .modules.vae import AutoencoderKL


# ---------------------------------------------------------------------------
# yaml load / merge / dotlist
# ---------------------------------------------------------------------------

def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except Exception:
        return s


def apply_dotlist(cfg: Dict, overrides: Sequence[str]) -> Dict:
    """OmegaConf-style ``a.b.c=value`` overrides (main.py:560-566).

    Integer path segments index into lists (OmegaConf dotlist semantics),
    e.g. ``...emb_models.1.params.fake_annotator=true`` targets the second
    embedder of a conditioner config."""
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} is not key=value")
        key, val = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if isinstance(node, list):
                node = node[int(p)]
            else:
                node = node.setdefault(p, {})
        last = parts[-1]
        if isinstance(node, list):
            node[int(last)] = _parse_value(val)
        else:
            node[last] = _parse_value(val)
    return cfg


class _LenientLoader(yaml.SafeLoader):
    """SafeLoader that repairs undefined aliases to null: the reference's
    shipped training YAMLs contain `*Key` with no `&Key` anchor
    (sd_1_5_controlldm-test-tv2v-depthmidas.yaml:162) — strict YAML (and the
    reference itself) would crash; we load them with a warning instead."""

    def compose_node(self, parent, index):
        import yaml.events as ev

        if self.check_event(ev.AliasEvent):
            anchor = self.peek_event().anchor
            if anchor not in self.anchors:
                import warnings

                self.get_event()
                warnings.warn(f"undefined YAML alias *{anchor} -> null")
                return yaml.ScalarNode("tag:yaml.org,2002:null", "null")
        return super().compose_node(parent, index)


def load_config(paths: Sequence[str] | str, overrides: Sequence[str] = ()) -> Dict:
    if isinstance(paths, (str, Path)):
        paths = [paths]
    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = _deep_merge(cfg, yaml.load(f, Loader=_LenientLoader) or {})
    return apply_dotlist(cfg, overrides)


# ---------------------------------------------------------------------------
# target resolution
# ---------------------------------------------------------------------------

def _tname(cfg: Dict) -> str:
    return str(cfg.get("target", "")).rsplit(".", 1)[-1]


def _params(cfg: Optional[Dict]) -> Dict:
    return dict((cfg or {}).get("params") or {})


_SCALING = {"EpsScaling": "eps", "EDMScaling": "edm", "VScaling": "v"}
_WEIGHTING = {
    "EpsWeighting": "eps", "EDMWeighting": "edm", "VWeighting": "v",
    "UnitWeighting": "unit",
}
_DISCRETIZATION = {
    "LegacyDDPMDiscretization": "legacy_ddpm",
    "EDMDiscretization": "edm",
}
_SAMPLER = {
    "EulerEDMSampler": "euler",
    "HeunEDMSampler": "heun",
    "EulerAncestralSampler": "euler_ancestral",
    "DPMPP2SAncestralSampler": "dpmpp_2s_ancestral",
    "DPMPP2MSampler": "dpmpp_2m",
    "LinearMultistepSampler": "lms",
}


def build_discretization(cfg: Dict):
    return make_discretization(_DISCRETIZATION[_tname(cfg)], **_params(cfg))


def build_denoiser(cfg: Dict) -> Denoiser:
    p = _params(cfg)
    scaling = _SCALING[_tname(p.get("scaling_config", {}))]
    weighting_cfg = p.get("weighting_config")
    weighting = _WEIGHTING[_tname(weighting_cfg)] if weighting_cfg else "eps"
    disc = build_discretization(
        p.get("discretization_config", {"target": "LegacyDDPMDiscretization"})
    )
    if _tname(cfg) == "DiscreteDenoiser":
        return DiscreteDenoiser(
            scaling=scaling, weighting=weighting,
            num_idx=p.get("num_idx", 1000), discretization=disc,
        )
    return Denoiser(scaling=scaling, weighting=weighting)


def build_sampler(cfg: Dict):
    p = _params(cfg)
    disc = build_discretization(
        p.get("discretization_config", {"target": "LegacyDDPMDiscretization"})
    )
    kwargs = {}
    for k in ("s_churn", "s_tmin", "s_tmax", "s_noise", "eta", "order"):
        if k in p:
            kwargs[k] = p[k]
    return make_sampler(
        _SAMPLER[_tname(cfg)],
        discretization=disc,
        num_steps=p.get("num_steps"),
        **kwargs,
    )


def build_guider(cfg: Optional[Dict], default_scale: float = 7.5):
    if cfg is None:
        return VanillaCFG(scale=default_scale)
    name = _tname(cfg)
    if name == "IdentityGuider":
        return IdentityGuider()
    return VanillaCFG(scale=_params(cfg).get("scale", default_scale))


# ---- network --------------------------------------------------------------

_UNET_KEY_MAP = {
    "in_channels": "in_channels",
    "model_channels": "model_channels",
    "out_channels": "out_channels",
    "num_res_blocks": "num_res_blocks",
    "attention_resolutions": "attention_resolutions",
    "channel_mult": "channel_mult",
    "num_heads": "num_heads",
    "num_head_channels": "num_head_channels",
    "transformer_depth": "transformer_depth",
    "context_dim": "context_dim",
    "use_linear_in_transformer": "use_linear_in_transformer",
    "legacy": "legacy",
    "use_scale_shift_norm": "use_scale_shift_norm",
    "resblock_updown": "resblock_updown",
    "disable_temporal_text_ca": "disable_temporal_text_ca",
    "disable_text_ca": "disable_text_ca",
    "enable_attention3d_crossframe": "enable_attention3d_crossframe",
    "enable_ref_attn": "enable_ref_attn",
    "ST3DCA_ca_type": "st3dca_ca_type",
    "use_learnable_alpha": "use_learnable_alpha",
    "adm_in_channels": "adm_in_channels",
    "use_checkpoint": "use_remat",
    # TPU-only extension (no reference analog): jax.checkpoint_policies name
    # selecting WHAT the remat'd blocks save for the backward pass
    "remat_policy": "remat_policy",
}


def _unet_kwargs(p: Dict, dtype) -> Dict:
    kw = {"dtype": dtype}
    for src, dst in _UNET_KEY_MAP.items():
        if src in p:
            v = p[src]
            if isinstance(v, list):
                v = tuple(v)
            kw[dst] = v
    return kw


def build_controlnet(cfg: Dict, dtype) -> ControlNet2D:
    p = _params(cfg)
    kw = _unet_kwargs(p, dtype)
    kw.pop("out_channels", None)
    return ControlNet2D(
        hint_channels=p.get("hint_channels", 3),
        control_scales=float(p.get("control_scales", 1.0)),
        no_add_x=bool(p.get("no_add_x", False)),
        input_hint_identity=bool(p.get("set_input_hint_block_as_identity", False)),
        **kw,
    )


def build_network(cfg: Dict, dtype=jnp.float32) -> CCEditNetwork:
    name = _tname(cfg)
    p = _params(cfg)
    kw = _unet_kwargs(p, dtype)

    video = name in (
        "UNetModel3D", "ControlledUNetModel3DTV2V",
        "ControlledUNetModel3DTV2VInterpolate", "ControlNet3D",
    )
    raig = name == "ControlledUNetModel2DRAIG"
    if raig:
        kw["enable_ref_attn"] = True
    unet = UNetModel(unet_type="pseudo-3d" if video else "2d", **kw)

    controlnet = None
    controlnet_img = None
    if "controlnet_config" in p:
        controlnet = build_controlnet(p["controlnet_config"], dtype)
    if p.get("controlnet_img_config"):
        controlnet_img = build_controlnet(p["controlnet_img_config"], dtype)

    return CCEditNetwork(
        unet=unet,
        controlnet=controlnet,
        controlnet_img=controlnet_img,
        crossframe_type=p.get("crossframe_type"),
        interpolate=(name == "ControlledUNetModel3DTV2VInterpolate"),
        raig=raig,
    )


# ---- first stage ----------------------------------------------------------

def build_vae(cfg: Dict, dtype=jnp.float32) -> Optional[AutoencoderKL]:
    # pixel-space training (the toy configs): IdentityFirstStage means NO
    # autoencoder — the engine diffuses pixels directly
    # (sgm/models/autoencoder.py:596-615; toy/mnist.yaml:45-46)
    if "IdentityFirstStage" in _tname(cfg):
        return None
    p = _params(cfg)
    dd = p.get("ddconfig", {})
    return AutoencoderKL(
        embed_dim=p.get("embed_dim", 4),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        in_channels=dd.get("in_channels", 3),
        out_ch=dd.get("out_ch", 3),
        z_channels=dd.get("z_channels", 4),
        resolution=dd.get("resolution", 256),
        dtype=dtype,
    )



# ---- autoencoder training engine ------------------------------------------

def build_autoencoder_engine(cfg: Dict):
    """Map the reference autoencoder training YAML
    (configs/example_training/autoencoder/.../imagenet-attnfree-logvar.yaml)
    onto the AutoencodingEngine: encoder/decoder geometry (the two sections
    always agree in the shipped files), GeneralLPIPSWithDiscriminator loss
    knobs, DiagonalGaussian regularizer weights."""
    from .models.autoencoder_engine import (
        AutoencodingEngine,
        LPIPSWithDiscriminatorConfig,
    )

    p = _params(cfg.get("model", cfg))
    enc = _params(p.get("encoder_config", {}))
    ae = AutoencoderKL(
        ch=enc.get("ch", 128),
        ch_mult=tuple(enc.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=enc.get("num_res_blocks", 2),
        attn_resolutions=tuple(enc.get("attn_resolutions", ())),
        in_channels=enc.get("in_channels", 3),
        out_ch=enc.get("out_ch", 3),
        z_channels=enc.get("z_channels", 4),
        resolution=enc.get("resolution", 256),
    )
    lp = _params(p.get("loss_config", {}))
    loss_cfg = LPIPSWithDiscriminatorConfig(
        disc_start=int(lp.get("disc_start", 0)),
        logvar_init=float(lp.get("logvar_init", 0.0)),
        pixelloss_weight=float(lp.get("pixelloss_weight", 1.0)),
        disc_num_layers=int(lp.get("disc_num_layers", 3)),
        disc_in_channels=int(lp.get("disc_in_channels", 3)),
        disc_factor=float(lp.get("disc_factor", 1.0)),
        disc_weight=float(lp.get("disc_weight", 1.0)),
        perceptual_weight=float(lp.get("perceptual_weight", 1.0)),
        disc_loss=lp.get("disc_loss", "hinge"),
        learn_logvar=bool(lp.get("learn_logvar", False)),
        regularization_weights=lp.get("regularization_weights"),
    )
    return AutoencodingEngine(ae, loss_cfg)


# ---- conditioner ----------------------------------------------------------

def _build_embedder(emb_cfg: Dict, asset_dir: Optional[str], dtype):
    name = _tname(emb_cfg)
    p = _params(emb_cfg)
    if name == "FrozenCLIPEmbedder":
        return E.CLIPTextEmbedder(
            asset_dir=asset_dir,
            output_layer=p.get("layer", "last"),
            layer_idx=p.get("layer_idx"),
            dtype=dtype,
        )
    if name == "VAEEmbedder":
        return E.VAEEmbedder()
    if name in ("IdentityEncoder",):
        return E.IdentityEncoder()
    if name in ("CustomIdentityEncoder",):
        return E.CustomIdentityEncoder(
            down_blur_factor=p.get("down_blur_factor"),
            down_blur_probs=p.get("down_blur_probs"),
            downsample_factor=p.get("downsample_factor", 1),
        )
    if name == "CustomIdentityDownCondEncoder":
        return E.CustomIdentityDownCondEncoder(
            outdim=p.get("outdim", 256),
            down_blur_factor=p.get("down_blur_factor"),
            down_blur_probs=p.get("down_blur_probs"),
        )
    if name == "ConcatTimestepEmbedderND":
        return E.ConcatTimestepEmbedderND(p.get("outdim", 256))
    if name == "ClassEmbedder":
        return E.ClassEmbedder(p.get("embed_dim", 512), p.get("n_classes", 1000),
                               add_sequence_dim=p.get("add_sequence_dim", False))
    if name == "LowScaleEncoder":
        return E.LowScaleEncoder(
            max_noise_level=p.get("max_noise_level", 250),
            out_size=p.get("output_size"),
            scale_factor=p.get("scale_factor", 1.0),
            num_timesteps=p.get("timesteps", 1000),
            linear_start=p.get("linear_start", 0.00085),
            linear_end=p.get("linear_end", 0.0120),
        )
    if name == "SpatialRescaler":
        return E.SpatialRescaler(
            p.get("multiplier", p.get("factor", 0.5)),
            p.get("method", "bilinear"),
            n_stages=p.get("n_stages", 1),
            out_channels=p.get("out_channels"),
            kernel_size=p.get("kernel_size", 1),
            bias=p.get("bias", False),
        )
    if name == "InpaintingEncoder":
        return E.InpaintingEncoder(
            mask_ratio_min=p.get("mask_ratio_min", 0.3),
            mask_ratio_max=p.get("mask_ratio_max", 0.5),
        )
    if name == "OutpaintingEncoder":
        return E.OutpaintingEncoder(
            mask_ratio_min=p.get("mask_ratio_min", 0.0),
            mask_ratio_max=p.get("mask_ratio_max", 0.4),
        )
    if name == "GaussianEncoder":
        enc_keys = ("ch", "ch_mult", "num_res_blocks", "attn_resolutions",
                    "in_channels", "z_channels", "double_z", "resolution")
        return E.GaussianEncoder(
            weight=p.get("weight", 1.0),
            flatten_output=p.get("flatten_output", True),
            dtype=dtype,
            **{k: p[k] for k in enc_keys if k in p},
        )
    if name == "FrozenT5Embedder":
        return E.T5TextEmbedder(
            version=p.get("version", "google/t5-v1_1-xxl"),
            max_length=p.get("max_length", 77),
            spm_path=p.get("spm_path"), dtype=dtype,
        )
    if name == "FrozenByT5Embedder":
        return E.T5TextEmbedder(
            version=p.get("version", "google/byt5-base"),
            max_length=p.get("max_length", 77), variant="byt5", dtype=dtype,
        )
    if name in ("FrozenOpenCLIPEmbedder", "FrozenOpenCLIPEmbedder2"):
        return E.OpenCLIPTextEmbedder(
            arch=p.get("arch", "ViT-H-14"),
            layer=p.get("layer", "last"),
            legacy=p.get("legacy", True) or name == "FrozenOpenCLIPEmbedder",
            always_return_pooled=p.get("always_return_pooled", False),
            max_length=p.get("max_length", 77),
            asset_dir=asset_dir, dtype=dtype,
        )
    if name == "FrozenOpenCLIPImageEmbedder":
        return E.OpenCLIPImageEmbedder(
            arch=p.get("arch", "ViT-H-14"),
            unsqueeze_dim=p.get("unsqueeze_dim", False),
            repeat_to_max_len=p.get("repeat_to_max_len", False),
            max_length=p.get("max_length", 77),
            output_tokens=p.get("output_tokens", False), dtype=dtype,
        )
    if name == "FrozenCLIPT5Encoder":
        return E.CLIPT5Embedder(
            asset_dir=asset_dir,
            clip_max_length=p.get("clip_max_length", 77),
            t5_max_length=p.get("t5_max_length", 77),
            t5_version=p.get("t5_version", "google/t5-v1_1-xl"), dtype=dtype,
        )
    if name in (
        "DepthMidasEncoder", "DepthZoeEncoder", "LineartEncoder",
        "SoftEdgeEncoder", "NormalBaeEncoder", "ScribbleHEDEncoder",
        "ScribblePidiNetEncoder", "OpenposeEncoder",
    ):
        from .conditioning.annotators import build_annotator

        return build_annotator(name, p)
    raise KeyError(f"unknown embedder target {name!r}")


def build_conditioner(cfg: Dict, asset_dir=None, dtype=jnp.float32) -> Conditioner:
    specs: List[EmbedderSpec] = []
    for emb_cfg in _params(cfg).get("emb_models", []):
        specs.append(
            EmbedderSpec(
                embedder=_build_embedder(emb_cfg, asset_dir, dtype),
                input_key=emb_cfg.get("input_key", "txt"),
                ucg_rate=float(emb_cfg.get("ucg_rate", 0.0)),
                legacy_ucg_value=emb_cfg.get("legacy_ucg_value"),
                is_trainable=bool(emb_cfg.get("is_trainable", False)),
            )
        )
    return Conditioner(specs)


# ---- loss -----------------------------------------------------------------

def build_lr_scheduler(cfg: Optional[Dict]):
    """Build an LR multiplier schedule from a model scheduler_config
    (main.py feeds these to LambdaLR; the trainer tabulates them for jit).
    Reference classes: sgm/lr_scheduler.py:4-135."""
    if not cfg:
        return None
    from .train import lr_schedule as L

    known = {
        "LambdaWarmUpCosineScheduler": L.LambdaWarmUpCosineScheduler,
        "LambdaWarmUpCosineScheduler2": L.LambdaWarmUpCosineScheduler2,
        "LambdaLinearScheduler": L.LambdaLinearScheduler,
    }
    name = _tname(cfg)
    if name not in known:
        raise ValueError(
            f"unknown scheduler_config target {cfg.get('target')!r}; "
            f"supported: {sorted(known)} (sgm/lr_scheduler.py ships only "
            "these three)")
    return known[name](**_params(cfg))


def build_loss(cfg: Optional[Dict]) -> Optional[StandardDiffusionLoss]:
    if not cfg:
        return None
    p = _params(cfg)
    ss_cfg = p.get("sigma_sampler_config", {"target": "DiscreteSampling"})
    ss_name = {"EDMSampling": "edm", "DiscreteSampling": "discrete"}[_tname(ss_cfg)]
    ss_params = _params(ss_cfg)
    if "discretization_config" in ss_params:  # training YAMLs nest it
        ss_params["discretization"] = build_discretization(
            ss_params.pop("discretization_config"))
    sigma_sampler = make_sigma_sampler(ss_name, **ss_params)
    return StandardDiffusionLoss(
        sigma_sampler=sigma_sampler,
        loss_type=p.get("type", "l2"),
        offset_noise_level=p.get("offset_noise_level", 0.0),
        offset_noise_varying_dim=p.get("offset_noise_varying_dim", 1),
    )


# ---- engine ---------------------------------------------------------------

_FREEZE_MAP = {
    "none": "none",
    "spatial": "spatial",
    "spatial_openlora": "spatial_openlora",
}


def build_engine(
    cfg: Dict,
    asset_dir: Optional[str] = None,
    dtype=jnp.float32,
    guider_scale: float = 7.5,
    sampler: Optional[object] = None,
    num_steps: Optional[int] = None,
) -> CCEditEngine:
    """Build a CCEditEngine from a reference-format model config
    (cfg['model'] = {target: ...Engine, params: {...}})."""
    model_cfg = cfg.get("model", cfg)
    p = _params(model_cfg)
    engine_name = _tname(model_cfg)

    network = build_network(p["network_config"], dtype=dtype)
    denoiser = build_denoiser(p["denoiser_config"])
    conditioner = build_conditioner(p.get("conditioner_config", {}), asset_dir, dtype)
    vae = build_vae(p["first_stage_config"], dtype=dtype) if "first_stage_config" in p else None
    loss = build_loss(p.get("loss_fn_config"))

    if sampler is None:
        if "sampler_config" in p:
            sampler = build_sampler(p["sampler_config"])
        else:
            sampler = make_sampler(
                "dpmpp_2s_ancestral",
                discretization=make_discretization("legacy_ddpm"),
                num_steps=num_steps or 30,
            )

    freeze = _FREEZE_MAP.get(p.get("freeze_model", "none"), "none")
    if engine_name in ("VideoDiffusionEngineTV2V", "VideoDiffusionEngineTV2VInterpolate"):
        # diffusion.py:569-580: structure controlnet re-frozen, controlnet_img opened
        if freeze == "spatial":
            freeze = "spatial_tv2v"
        elif freeze == "spatial_openlora":
            freeze = "spatial_tv2v_openlora"

    # honour a YAML guider_config (guiders.py target + scale); the explicit
    # guider_scale arg only sets the default when the YAML carries none
    guider_cfg = None
    if "sampler_config" in p:
        guider_cfg = _params(p["sampler_config"]).get("guider_config")

    return CCEditEngine(
        network=network,
        denoiser=denoiser,
        sampler=sampler,
        conditioner=conditioner,
        vae=vae,
        loss_fn=loss,
        guider=build_guider(guider_cfg, default_scale=guider_scale),
        scale_factor=p.get("scale_factor", 0.18215),
        input_key=p.get("input_key", "jpg"),
        freeze_policy=freeze,
        use_ema=bool(p.get("use_ema", False)),
    )
