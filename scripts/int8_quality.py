#!/usr/bin/env python
"""Workload-level int8 quality: exact-bf16 vs CCEDIT_INT8 sampling output
(VERDICT r3 Next #2).

Runs the FULL headline sampling chain twice on the real chip at the
production geometry (17f 512x768, 30-step DPM++2S TV2V by default) with the
SAME seed and the SAME weights — once exact bf16, once with both int8 paths
(W8A8 convs/matmuls + int8 QK^T attention) — then reports latent- and
pixel-space divergence: cosine, PSNR, SSIM per frame and aggregated.

Weights: no checkpoints exist in this environment, so parameters are
materialized by init RULE (kernel: lecun-normal by fan-in, scale: 1,
bias: 0, embedding: N(0,0.02)) — the same distributions flax init draws,
built leaf-by-leaf in one jitted pass instead of tracing the 1.6 B-param
net.init (>1 h on this host).  GroupNorm keeps activations normalized, so
perturbation propagation through the network is representative; the
numbers measure ARITHMETIC divergence of the int8 path, not perceptual
quality of a trained model (re-run with converted weights the day
checkpoints land — the loader is ccedit_tpu/utils/torch_convert.py).

Usage:  python scripts/int8_quality.py [tv2v|tvi2v]
Env:    QUAL_STEPS / QUAL_FRAMES / QUAL_H / QUAL_W to scale down.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ccedit_tpu.diffusion import (
    DiscreteDenoiser, LegacyDDPMDiscretization, VanillaCFG, make_sampler,
)
from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.unet import UNetModel
from ccedit_tpu.modules.vae import AutoencoderKL
from ccedit_tpu.ops import attention, quant


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rule_init(shapes, seed=0, dtype=jnp.bfloat16):
    """Materialize a param tree by flax init rules, one jitted pass."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def build(key):
        out = []
        keys = jax.random.split(key, len(leaves))
        for (path, s), k in zip(leaves, keys):
            name = str(path[-1]).lower()
            dt = dtype if s.dtype == jnp.float32 else s.dtype
            if "kernel" in name:
                fan_in = int(np.prod(s.shape[:-1])) or 1
                out.append(jax.random.normal(k, s.shape, jnp.float32)
                           * (1.0 / np.sqrt(fan_in)))
            elif "scale" in name:
                out.append(jnp.ones(s.shape, jnp.float32))
            elif "embedding" in name:
                out.append(0.02 * jax.random.normal(k, s.shape, jnp.float32))
            elif "alpha" in name:
                out.append(jnp.zeros(s.shape, jnp.float32))
            else:  # bias and friends
                out.append(jnp.zeros(s.shape, jnp.float32))
            out[-1] = out[-1].astype(dt)
        return jax.tree_util.tree_unflatten(
            treedef, out)

    return jax.jit(build)(jax.random.PRNGKey(seed))


def psnr(a, b, peak=255.0):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def ssim(a, b, peak=255.0):
    """Global-window SSIM per channel (Wang et al. simplified: uniform 8x8
    windows via block means) — adequate for a divergence gate."""
    from scipy.ndimage import uniform_filter

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
    mu_a = uniform_filter(a, size=8)
    mu_b = uniform_filter(b, size=8)
    va = uniform_filter(a * a, size=8) - mu_a ** 2
    vb = uniform_filter(b * b, size=8) - mu_b ** 2
    cov = uniform_filter(a * b, size=8) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    return float(s.mean())


def main():
    workload = (sys.argv[1] if len(sys.argv) > 1
                else os.environ.get("QUAL_WORKLOAD", "tv2v"))
    T = int(os.environ.get("QUAL_FRAMES", 17))
    H = int(os.environ.get("QUAL_H", 512))
    W = int(os.environ.get("QUAL_W", 768))
    steps = int(os.environ.get("QUAL_STEPS", 50 if workload == "tvi2v" else 30))
    cfg_scale = 7.0 if workload == "tvi2v" else 7.5
    dtype = jnp.bfloat16
    h8, w8 = H // 8, W // 8

    sd15 = dict(in_channels=4, model_channels=320, out_channels=4,
                num_res_blocks=2, attention_resolutions=(4, 2, 1),
                channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                context_dim=768, dtype=dtype)
    if workload == "tvi2v":
        unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                         enable_attention3d_crossframe=True,
                         st3dca_ca_type="center_self", **sd15)
        cn = ControlNet2D(hint_channels=3, **sd15)
        cn_img = ControlNet2D(hint_channels=4, input_hint_identity=True,
                              no_add_x=True, disable_text_ca=True, **sd15)
        net = CCEditNetwork(unet=unet, controlnet=cn, controlnet_img=cn_img)
    else:
        unet = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                         **sd15)
        cn = ControlNet2D(hint_channels=3, **sd15)
        net = CCEditNetwork(unet=unet, controlnet=cn)
    vae = AutoencoderKL(dtype=dtype)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, T, h8, w8, 4), jnp.float32)
    tt = jnp.array([500.0])
    # structured, non-degenerate conditioning (zeros would null the hint path)
    kh, kc = jax.random.split(jax.random.PRNGKey(42))
    cond = {
        "crossattn": (0.1 * jax.random.normal(kc, (1, 77, 768))).astype(dtype),
        "control_hint": jnp.tile(
            jnp.sin(jnp.arange(W, dtype=jnp.float32) / 17.0)[None, None, None, :, None],
            (1, T, H, 1, 3)).astype(dtype),
    }
    if workload == "tvi2v":
        cond["cond_feat"] = (0.3 * jax.random.normal(
            kh, (1, h8, w8, 4))).astype(dtype)

    t0 = time.time()
    p_shapes = jax.eval_shape(net.init, rng, x, tt, cond)
    params = rule_init(p_shapes, seed=1, dtype=dtype)
    v_shapes = jax.eval_shape(
        lambda k, z: vae.init(k, z, method=AutoencoderKL.decode), rng, x[:, 0])
    vae_params = rule_init(v_shapes, seed=2, dtype=dtype)
    n = sum(v.size for v in jax.tree_util.tree_leaves(params))
    log(f"# rule-init params {n/1e9:.2f}B in {time.time()-t0:.1f}s")

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=cfg_scale)
    uc = {**cond, "crossattn": jnp.zeros_like(cond["crossattn"])}
    cond_cat = guider.prepare_cond(cond, uc)
    rows = 2 * steps - 1
    x0 = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)

    def denoise_with_ctx(ctx, xx, sigma):
        p, cc = ctx
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(lambda a, b, c: net.apply(p, a.astype(dtype), b, c)
                  .astype(jnp.float32), x2, s2, cc)
        return guider.combine(out, sv)

    def run(tag):
        # FRESH sampler + jit objects per path: the quant flags are read at
        # TRACE time, and the sampler caches its jitted runner by call
        # structure — reusing objects would silently serve the exact-path
        # compiled program to the int8 run.
        sampler = make_sampler("dpmpp_2s_ancestral",
                               discretization=LegacyDDPMDiscretization(),
                               num_steps=steps,
                               segment_size=15 if rows > 24 else 0)
        encode_hint_features = jax.jit(lambda p, ch: net.apply(
            p, ch, method=CCEditNetwork.encode_control_hint))
        decode_clip = jax.jit(lambda vp, latents: jnp.clip(
            (vae.apply(vp, latents / 0.18215, method=AutoencoderKL.decode)
             + 1.0) * 127.5, 0, 255).astype(jnp.uint8))

        t0 = time.time()
        cc = dict(cond_cat)
        feats = encode_hint_features(params, cc.pop("control_hint"))
        cc["control_hint_features"] = feats
        lat = sampler((denoise_with_ctx, (params, cc)), x0,
                      jax.random.PRNGKey(9))
        lat_np = np.asarray(jax.device_get(lat), np.float32)
        frames = np.asarray(jax.device_get(decode_clip(vae_params, lat)))
        log(f"# {tag}: sampled+decoded in {time.time()-t0:.1f}s "
            f"(|lat| max {np.abs(lat_np).max():.3f})")
        return lat_np, frames[0]  # (T,H,W,3) uint8

    # exact path first
    quant.set_quantized_matmul(False)
    attention.set_quantized_qk(False)
    lat_e, fr_e = run("exact bf16")

    variants = []
    # (a) int8 QK^T only — the measured-fastest config (bench: 51.6 vs
    # 53.75 s exact); this is the path the docs recommend, so its quality
    # number is the one that matters most.
    attention.set_quantized_qk(True)
    try:
        variants.append(("qk8", *run("int8 QK^T only")))
    finally:
        attention.set_quantized_qk(False)
    # (b) the full CCEDIT_INT8 umbrella (W8A8 + QK^T) — measured SLOWER
    # than exact at this workload (54.8 s); quality recorded for the table.
    quant.set_quantized_matmul(True)
    attention.set_quantized_qk(True)
    try:
        variants.append(("int8_full", *run("int8 (W8A8 + QK^T)")))
    finally:
        quant.set_quantized_matmul(False)
        attention.set_quantized_qk(False)

    report = {
        "workload": f"{workload} {T}f {H}x{W} {steps} steps CFG{cfg_scale}",
        "weights": "rule-init (lecun kernels, unit scales) — no checkpoints "
                   "in env; measures int8 arithmetic divergence",
    }
    lat_rng = float(lat_e.max() - lat_e.min())
    for tag, lat_q, fr_q in variants:
        lat_cos = float(
            np.dot(lat_e.ravel().astype(np.float64),
                   lat_q.ravel().astype(np.float64))
            / (np.linalg.norm(lat_e.ravel())
               * np.linalg.norm(lat_q.ravel()) + 1e-12))
        per_frame_psnr = [psnr(fr_e[t], fr_q[t]) for t in range(fr_e.shape[0])]
        per_frame_ssim = [ssim(fr_e[t], fr_q[t]) for t in range(fr_e.shape[0])]
        report[tag] = {
            "latent_cosine": round(lat_cos, 6),
            "latent_psnr_db": round(
                psnr(lat_e, lat_q, peak=lat_rng if lat_rng > 0 else 1.0), 2),
            "frame_psnr_db_min": round(min(per_frame_psnr), 2),
            "frame_psnr_db_mean": round(float(np.mean(per_frame_psnr)), 2),
            "frame_ssim_min": round(min(per_frame_ssim), 4),
            "frame_ssim_mean": round(float(np.mean(per_frame_ssim)), 4),
            "per_frame_psnr_db": [round(v, 2) for v in per_frame_psnr],
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
