#!/usr/bin/env python
"""Exact model-FLOP accounting for the TV2V/TVI2V headline programs.

Lowers + compiles the SAME functions bench.py times — one denoise row
(CFG batch-doubled UNet+ControlNet eval), the loop-invariant hint
pyramid, and the VAE decode — on the XLA:CPU backend with abstract
(ShapeDtypeStruct) arguments, and reads XLA's own post-optimization
`cost_analysis()["flops"]` for each.  No parameters are materialized and
nothing runs; this is a compile-only count, so the numbers are exact for
the optimized HLO the device executes (modulo backend-specific fusion,
which does not change FLOPs of dot/conv ops).

The printed constants are embedded in bench.py's MFU accounting
(`model_tflops_per_nfe`, `mfu` detail fields) — re-run this script to
regenerate them if the network definition changes:

    JAX_PLATFORMS=cpu python scripts/flops_nfe.py [tv2v|tvi2v]

Methodology matches docs/PERF_r3.md §9 (the VAE's hand-derived 64.56
TFLOP count) but is automated via XLA instead of hand enumeration.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ccedit_tpu.diffusion import DiscreteDenoiser, LegacyDDPMDiscretization, VanillaCFG
from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
from ccedit_tpu.modules.unet import UNetModel
from ccedit_tpu.modules.vae import AutoencoderKL


def flops_of(fn, *abstract_args) -> float:
    comp = jax.jit(fn).lower(*abstract_args).compile()
    ca = comp.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(d["flops"])


def abstract(tree):
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), tree)


def main():
    workload = sys.argv[1] if len(sys.argv) > 1 else "tv2v"
    T, H, W = 17, 512, 768
    B = 1
    dtype = jnp.bfloat16
    h8, w8 = H // 8, W // 8

    sd15 = dict(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
        num_heads=8, transformer_depth=1, context_dim=768, dtype=dtype,
    )
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
    x = jnp.zeros((B, T, h8, w8, 4), jnp.float32)
    tt = jnp.full((B,), 500.0)
    cond = {
        "crossattn": jnp.zeros((B, 77, 768), dtype=dtype),
        "control_hint": jnp.zeros((B, T, H, W, 3), dtype=dtype),
    }
    if workload == "tvi2v":
        cond["cond_feat"] = jnp.zeros((B, h8, w8, 4), dtype=dtype)

    p_abs = abstract(jax.eval_shape(net.init, rng, x, tt, cond))

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=7.5 if workload == "tv2v" else 7.0)
    uc = dict(cond)
    cond_cat = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), uc, cond)

    # the hint pyramid is hoisted out of the scan (bench.py / PERF_r3 §10):
    # count it ONCE per clip, and count the per-row NFE with precomputed
    # hint features as input — exactly the program split the device runs
    print("lowering hint pyramid ...", file=sys.stderr, flush=True)
    def hint_fn(p, ch):
        return net.apply(p, ch, method=CCEditNetwork.encode_control_hint)

    hint_flops = flops_of(
        hint_fn, p_abs, abstract(cond_cat["control_hint"]))

    feats_abs = abstract(jax.eval_shape(
        hint_fn, p_abs, abstract(cond_cat["control_hint"])))

    print("lowering denoise row (NFE) ...", file=sys.stderr, flush=True)

    def denoise_row(p, cc_nohint, feats, xx, sigma):
        cc = dict(cc_nohint)
        cc["control_hint_features"] = feats
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(
            lambda a, b, c: net.apply(p, a.astype(dtype), b, c)
            .astype(jnp.float32), x2, s2, cc)
        return guider.combine(out, sv)

    cc_nohint = {k: v for k, v in cond_cat.items() if k != "control_hint"}
    nfe_flops = flops_of(
        denoise_row, p_abs, abstract(cc_nohint), feats_abs, abstract(x),
        jax.ShapeDtypeStruct((), jnp.float32))

    print("lowering VAE decode ...", file=sys.stderr, flush=True)

    def decode_fn(vp, latents):
        dec = vae.apply(vp, latents / 0.18215, method=AutoencoderKL.decode)
        return jnp.clip((dec + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    v_abs = abstract(jax.eval_shape(
        lambda k, z: vae.init(k, z, method=AutoencoderKL.decode), rng, x[:, 0]))
    vae_flops = flops_of(decode_fn, v_abs, abstract(x))

    steps = 30 if workload == "tv2v" else 50
    rows = 2 * steps - 1
    total = rows * nfe_flops + hint_flops + vae_flops
    print(json.dumps({
        "workload": f"{workload} {T}f {H}x{W} {steps} steps (rows={rows})",
        "nfe_tflops": round(nfe_flops / 1e12, 3),
        "hint_pyramid_tflops": round(hint_flops / 1e12, 3),
        "vae_decode_tflops": round(vae_flops / 1e12, 3),
        "total_clip_tflops": round(total / 1e12, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
