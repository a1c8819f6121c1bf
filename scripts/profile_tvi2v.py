#!/usr/bin/env python
"""Where does the TVI2V +0.557 s/NFE (vs TV2V) actually go?

Slope-timed (profile_r3.py method) decomposition of the 50-step
reference-guided workload's network eval:
  - TV2V full NFE (baseline)
  - TVI2V full NFE
  - TVI2V minus appearance ControlNet (CFCA only, bank faked)
  - appearance ControlNet2D alone at its real shape (B=2 center frame)
  - CFCA-site attention op alone: n_k 6144 vs 12288

Run: python scripts/profile_tvi2v.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench(name, fn, *args, i1=2, i2=6, n=2):
    def make(iters):
        def looped(*a):
            def body(_, carry):
                out = fn(carry, *a[1:])
                eps = (out.astype(jnp.float32).ravel()[0] * 1e-20)
                return carry + eps.astype(carry.dtype)
            return jax.lax.fori_loop(0, iters, body, a[0])
        return jax.jit(looped)

    f1, f2 = make(i1), make(i2)
    jax.device_get(jnp.ravel(f1(*args))[0])
    jax.device_get(jnp.ravel(f2(*args))[0])

    def t(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.device_get(jnp.ravel(f(*args))[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    ms = (t(f2) - t(f1)) * 1e3 / (i2 - i1)
    print(f"{name:56s} {ms:9.1f} ms", flush=True)
    return ms


def main():
    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel

    dtype = jnp.bfloat16
    T, H, W = 17, 512, 768
    h8, w8 = H // 8, W // 8
    sd15 = dict(in_channels=4, model_channels=320, out_channels=4,
                num_res_blocks=2, attention_resolutions=(4, 2, 1),
                channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
                context_dim=768, dtype=dtype)
    key = jax.random.PRNGKey(0)
    print(f"# device: {jax.devices()[0]} (slope-timed, CFG batch B=2)")

    def materialize(shapes):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape,
                                dtype if s.dtype == jnp.float32 else s.dtype),
            shapes)

    x = jnp.zeros((2, T, h8, w8, 4), jnp.float32)
    tt = jnp.array([500.0, 500.0])
    ctx = jnp.zeros((2, 77, 768), dtype)
    hint = jnp.zeros((2, T, H, W, 3), dtype)
    feat = jnp.zeros((2, T, h8, w8, 320), dtype)

    # ---- TV2V baseline ----
    unet_tv = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                        **sd15)
    cn = ControlNet2D(hint_channels=3, **sd15)
    net_tv = CCEditNetwork(unet=unet_tv, controlnet=cn)
    cond_tv = {"crossattn": ctx, "control_hint_features": feat}
    p_tv = materialize(jax.eval_shape(
        net_tv.init, key, x, tt,
        {"crossattn": ctx, "control_hint": hint}))
    bench("TV2V full NFE", lambda c, p, cc: net_tv.apply(p, c, tt, cc),
          x, p_tv, cond_tv)

    # ---- TVI2V ----
    unet_ti = UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                        enable_attention3d_crossframe=True,
                        st3dca_ca_type="center_self", **sd15)
    cn_img = ControlNet2D(hint_channels=4, input_hint_identity=True,
                          no_add_x=True, disable_text_ca=True, **sd15)
    net_ti = CCEditNetwork(unet=unet_ti, controlnet=cn, controlnet_img=cn_img,
                           crossframe_type="reference")
    cond_ti = {"crossattn": ctx, "control_hint_features": feat,
               "cond_feat": jnp.zeros((2, h8, w8, 4), dtype)}
    p_ti = materialize(jax.eval_shape(
        net_ti.init, key, x, tt,
        {"crossattn": ctx, "control_hint": hint,
         "cond_feat": cond_ti["cond_feat"]}))
    bench("TVI2V full NFE", lambda c, p, cc: net_ti.apply(p, c, tt, cc),
          x, p_ti, cond_ti)

    # ---- appearance CN alone (what TVI2V adds as a module) ----
    # NOTE: with no_add_x the noisy center frame x is DISCARDED (block 0 is
    # replaced by the guided hint, controlmodel.py:293-302) — the branch
    # depends only on (params, cond_feat, timestep).  Feed the loop carry in
    # through cond_feat (same shape as x) or XLA hoists the whole trunk out
    # of the timing loop and the row measures ~0.
    xc = jnp.zeros((2, h8, w8, 4), jnp.float32)
    p_img = {"params": p_ti["params"]["controlnet_img"]}
    bench("appearance CN2D alone (B=2 center frame)",
          lambda c, p: jax.tree_util.tree_reduce(
              lambda a, b: a + b.astype(jnp.float32).ravel()[0],
              cn_img.apply(p, xc, c, tt, context=None,
                           return_attn_bank=True)[0],
              jnp.float32(0.0)) + c.ravel()[0],
          xc, p_img)

    # ---- UNet3D with CFCA, banks faked (isolates the CFCA attention cost)
    # build correctly-shaped fake banks via eval_shape on the CN
    _, bank = jax.eval_shape(
        lambda p, c: cn_img.apply(p, c, cond_ti["cond_feat"], tt,
                                  context=None, return_attn_bank=True),
        p_img, xc)
    refs = tuple(jnp.zeros((a.shape[0], a.shape[1] * a.shape[2], a.shape[3]),
                           dtype) for a in bank)
    p_unet_ti = {"params": p_ti["params"]["unet"]}
    ctl = None
    bench("UNet3D+CFCA (fake banks, no CNs)",
          lambda c, p, r: unet_ti.apply(p, c, tt, context=ctx,
                                        ref_contexts=r),
          x, p_unet_ti, refs)
    p_unet_tv = {"params": p_tv["params"]["unet"]}
    bench("UNet3D plain (no CNs)",
          lambda c, p: unet_tv.apply(p, c, tt, context=ctx), x, p_unet_tv)

    # ---- raw attention op: n_k doubling ----
    from ccedit_tpu.ops.attention import dot_product_attention
    q = jax.random.normal(key, (34, 8, 6144, 40), dtype)
    k2 = jax.random.normal(key, (34, 8, 12288, 40), dtype)
    bench("flash n_k=6144", lambda qq: dot_product_attention(qq, qq, qq), q,
          i1=3, i2=9, n=3)
    bench("flash n_k=12288",
          lambda qq, kk: dot_product_attention(qq, kk, kk), q, k2,
          i1=3, i2=9, n=3)


if __name__ == "__main__":
    main()
