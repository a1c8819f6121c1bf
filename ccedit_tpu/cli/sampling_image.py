"""2D txt2img / img2img CLI (the sampling_image.py / demo path).

Parity target: scripts/sampling/sampling_image.py + scripts/demo helpers
(do_sample / do_img2img, streamlit_helpers.py:458-642) run headlessly:
plain 2D UNet, CFG, k-diffusion samplers, optional img2img strength
(Img2ImgDiscretizationWrapper).

The session/sampling core is factored out so the web demo (`cli/demo.py`)
drives the exact same code path the CLI does.
"""

from __future__ import annotations

import argparse
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import build_engine, load_config
from ..data.video import load_image, to_uint8
from ..diffusion import make_discretization, make_sampler
from ..diffusion.guidance import IdentityGuider, VanillaCFG
from .pipeline import SAMPLER_NAMES, load_params

DISCRETIZATION_NAMES = ("legacy_ddpm", "edm")
GUIDER_NAMES = ("VanillaCFG", "IdentityGuider")


def add_image_args(p: argparse.ArgumentParser,
                   config_required: bool = True) -> argparse.ArgumentParser:
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--config_path", type=str, required=config_required,
                   default="")
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--lora_path", type=str, default="")
    p.add_argument("--lora_strength", type=float, default=0.8)
    p.add_argument("--vae_path", type=str, default="")
    p.add_argument("--prompt", type=str, default="a professional photograph")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--init_image", type=str, default="", help="img2img source")
    p.add_argument("--img2img_strength", type=float, default=0.75)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--W", type=int, default=512)
    p.add_argument("--sample_steps", type=int, default=40)
    p.add_argument("--sampler_name", type=str, default="EulerEDMSampler",
                   choices=sorted(SAMPLER_NAMES))
    p.add_argument("--discretization", type=str, default="legacy_ddpm",
                   choices=DISCRETIZATION_NAMES)
    p.add_argument("--guider", type=str, default="VanillaCFG",
                   choices=GUIDER_NAMES)
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--save_path", type=str, default="outputs/demo/txt2img")
    p.add_argument("--tokenizer_assets", type=str, default="")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fake_annotator", action="store_true",
                   help="allow pseudo-depth stand-ins for weightless annotators")
    p.add_argument("--watermark", action="store_true",
                   help="embed the SDV2 invisible watermark in outputs")
    p.add_argument("--safety_clip_ckpt", type=str, default="",
                   help="CLIP ViT-L visual ckpt for the DeepFloyd filter")
    p.add_argument("--safety_heads_dir", type=str, default="",
                   help="directory with p_head_v1.npz / w_head_v1.npz")
    return p


@dataclass
class ImageSession:
    """A loaded model the demo keeps warm across requests, like the
    reference's `init_st` streamlit-cached state (streamlit_helpers.py:75)."""

    engine: Any
    params: Any
    video_mode: bool
    # jitted-program caches: jax's in-memory trace cache is keyed on the
    # wrapper object, so rebuilding jax.jit per request would re-trace the
    # whole sampler+decode program every time (host tracing is the dominant
    # warm cost at SD scale).  Keyed on everything the TRACE depends on;
    # cfg_scale/seed are runtime arguments and deliberately absent.
    generate_cache: dict = field(default_factory=dict)
    encode_jit: Any = None

    @property
    def latent_factor(self) -> int:
        return self.engine.latent_factor


def build_image_session(args) -> ImageSession:
    """Build engine + load params for the txt2img/img2img path.  Extra
    conditioner inputs of video configs (control_hint/cond_img) are fed the
    init image or black frames so any shipped config runs in 2D mode."""
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = load_config(args.config_path)
    engine = build_engine(cfg, asset_dir=args.tokenizer_assets or None,
                          dtype=dtype, guider_scale=args.cfg_scale)
    if args.fake_annotator:
        from ..conditioning.annotators.base import AnnotatorEmbedder

        for spec in engine.conditioner.specs:
            if isinstance(spec.embedder, AnnotatorEmbedder):
                spec.embedder.allow_fake = True
    batch, _ = _make_batches(engine, args)
    params = load_params(engine, args, batch)
    video_mode = getattr(getattr(engine.network, "unet", None),
                         "unet_type", "2d") != "2d"
    return ImageSession(engine=engine, params=params, video_mode=video_mode)


def _make_batches(engine, args):
    batch = {"txt": [args.prompt]}
    batch_uc = {"txt": [args.negative_prompt]}
    extra_src = None
    if args.init_image:
        extra_src = load_image(args.init_image, (args.H, args.W))
    for spec in engine.conditioner.specs:
        key = spec.input_key
        if key in batch or key == "txt":
            continue
        if key in ("control_hint",):
            img = extra_src if extra_src is not None else np.zeros(
                (args.H, args.W, 3), np.float32) - 1.0
            batch[key] = batch_uc[key] = img[None, None]
        elif key in ("cond_img",):
            img = extra_src if extra_src is not None else np.zeros(
                (args.H, args.W, 3), np.float32) - 1.0
            batch[key] = batch_uc[key] = img[None]
    return batch, batch_uc


def configure_sampler(engine, args) -> None:
    """Install sampler/discretization/guider from the request — the demo's
    init_sampling widget surface (streamlit_helpers.py:277-322)."""
    strength = args.img2img_strength if args.init_image else None
    engine.sampler = make_sampler(
        SAMPLER_NAMES[args.sampler_name],
        discretization=make_discretization(
            getattr(args, "discretization", "legacy_ddpm"),
            **({"img2img_strength": strength} if strength else {}),
        ),
        num_steps=args.sample_steps,
    )
    if getattr(args, "guider", "VanillaCFG") == "IdentityGuider":
        engine.guider = IdentityGuider()
    else:
        engine.guider = VanillaCFG(scale=args.cfg_scale)


def sample_images(session: ImageSession, args,
                  save_dir: Optional[Path] = None) -> List[np.ndarray]:
    """Run txt2img (or img2img when args.init_image is set) and return the
    uint8 HWC frames; optionally also save sample_NNN.png files."""
    engine, params = session.engine, session.params
    configure_sampler(engine, args)
    batch, batch_uc = _make_batches(engine, args)
    c, uc = engine.conditioner.get_unconditional_conditioning(
        params["conditioner"], batch, batch_uc
    )

    rng = jax.random.PRNGKey(args.seed)
    if save_dir is not None:
        save_dir.mkdir(parents=True, exist_ok=True)

    # demo-parity output filters (streamlit_helpers.py:29-72 + detect path)
    sample_filter = None
    if args.safety_clip_ckpt or args.safety_heads_dir:
        from ..utils.safety import DeepFloydDataFiltering

        heads = Path(args.safety_heads_dir) if args.safety_heads_dir else None
        sample_filter = DeepFloydDataFiltering.from_files(
            clip_ckpt=args.safety_clip_ckpt or None,
            p_head_path=str(heads / "p_head_v1.npz") if heads else None,
            w_head_path=str(heads / "w_head_v1.npz") if heads else None,
        )
    watermarker = None
    if args.watermark:
        from ..utils.watermark import WatermarkEmbedder

        watermarker = WatermarkEmbedder()

    # a pseudo-3D (video) model samples a single-frame clip; plain 2D models
    # keep 4-D latents (the auto_pipeline reuses the tvi2v config by default)
    f = session.latent_factor
    if session.video_mode:
        z_shape = (1, 1, args.H // f, args.W // f, 4)
    else:
        z_shape = (1, args.H // f, args.W // f, 4)
    x_prior = None
    if args.init_image:
        if session.encode_jit is None:
            session.encode_jit = jax.jit(engine.encode_first_stage)
        img = load_image(args.init_image, (args.H, args.W))[None]
        if session.video_mode:
            img = img[None]
        x_prior = session.encode_jit(params, jnp.asarray(img))

    # One jitted program per request structure: sample + decode + [0,1]
    # rescale run as a single device execution (eager dispatch costs
    # seconds per op on RPC-tunneled hosts), with params/conditioning as
    # ARGUMENTS and --cfg_scale as a weak-typed traced scalar so a
    # guidance-strength sweep in the demo reuses the compiled program.
    # The jitted wrapper is cached on the session keyed on every request
    # field the trace depends on (configure_sampler rebuilds an equivalent
    # sampler for equal keys, so reuse is safe) — a warm demo session
    # serves repeat requests without re-tracing.
    use_prior = x_prior is not None
    gen_key = (args.sampler_name, args.sample_steps,
               getattr(args, "discretization", "legacy_ddpm"),
               args.img2img_strength if args.init_image else None,
               getattr(args, "guider", "VanillaCFG"), z_shape, use_prior)
    generate = session.generate_cache.get(gen_key)
    if generate is None:

        def _generate(p, cc, ucc, key, prior, gs):
            if use_prior:
                # do_img2img: start from (z + noise*sigma0)/sqrt(1+sigma0^2)
                # on the strength-pruned schedule
                # (streamlit_helpers.py:594-607); the sampler's prepare
                # rescale restores z + noise*sigma0
                lat = engine.sample(p, cc, ucc, z_shape, key, x_prior=prior,
                                    mode="sdedit", guider_scale=gs)
            else:
                lat = engine.sample(p, cc, ucc, z_shape, key, guider_scale=gs)
            img = engine.decode_first_stage(p, lat)
            if session.video_mode:
                img = img[:, 0]
            return (jnp.clip(img, -1.0, 1.0) + 1.0) / 2.0

        if getattr(engine.sampler, "segment_size", 0):
            generate = _generate  # the segmented sampler jits its own chunks
        else:
            generate = jax.jit(_generate)
        session.generate_cache[gen_key] = generate
    gs_arg = jnp.asarray(float(args.cfg_scale))

    outputs: List[np.ndarray] = []
    for i in range(args.num_samples):
        rng, k = jax.random.split(rng)
        t0 = time.time()
        img01 = generate(params, c, uc, k, x_prior, gs_arg)
        if sample_filter is not None:
            img01 = sample_filter(img01)
        img01 = np.asarray(img01)
        if watermarker is not None:
            img01 = watermarker(img01)
        out = to_uint8(img01[0] * 2.0 - 1.0)
        outputs.append(out)
        if save_dir is not None:
            Image.fromarray(out).save(save_dir / f"sample_{i:03d}.png")
            print(f"[done] sample {i}: {time.time() - t0:.1f}s "
                  f"-> {save_dir}/sample_{i:03d}.png")
    return outputs


def main():
    args = add_image_args(argparse.ArgumentParser()).parse_args()
    session = build_image_session(args)
    sample_images(session, args, save_dir=Path(args.save_path))


if __name__ == "__main__":
    main()
