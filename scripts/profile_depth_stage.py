#!/usr/bin/env python
"""Decompose the e2e depth stage (PERF_r3 §14: 9-11 s vs ~0.5 s compute).

Suspects: host mp4 decode, to_uint8, the 20 MB uint8 host->device upload,
DPT dispatch, and the scalar-fetch sync.  Also measures a chunked pipelined
variant (upload chunk i+1 while DPT runs chunk i).

Run on the real chip: python scripts/profile_depth_stage.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cc"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ccedit_tpu.conditioning.annotators.base import midas_postprocess
from ccedit_tpu.conditioning.annotators.dpt_midas import DPTHybrid
from ccedit_tpu.data.video import load_video_keyframes, save_video_frames, to_uint8

T, H, W = 17, 512, 768
dtype = jnp.bfloat16


def sync(x):
    jax.block_until_ready(x)
    jax.device_get(jnp.ravel(x)[0])
    return x


def main():
    import tempfile
    tmpdir = tempfile.mkdtemp(prefix="depth_probe_")
    src_path = os.path.join(tmpdir, "src.mp4")
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    yy, xx = yy / H, xx / W
    src = np.stack([
        np.stack([
            np.sin(2 * np.pi * (2 * xx + 0.05 * t + 0.3 * ch)) *
            np.cos(2 * np.pi * (yy + 0.03 * t)) for ch in range(3)
        ], axis=-1) for t in range(34)
    ]).astype(np.float32)
    save_video_frames(src, src_path, fps=18.0)

    rng = jax.random.PRNGKey(0)
    dpt = DPTHybrid(dtype=dtype)
    shapes = jax.eval_shape(dpt.init, rng, jnp.zeros((T, H, W, 3), jnp.float32))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        shapes)

    @jax.jit
    def make_hint(dp, frames_u8):
        frames = frames_u8.astype(dtype) / 127.5 - 1.0
        depth = dpt.apply(dp, frames)
        return midas_postprocess(depth.astype(jnp.float32)).astype(dtype)

    # warm everything once
    frames_np = load_video_keyframes(src_path, target_fps=6.0, num_keyframes=T,
                                     size_hw=(H, W))
    u8 = to_uint8(frames_np)
    sync(make_hint(params, jnp.asarray(u8)))

    print("== sequential decomposition (3 reps) ==")
    for rep in range(3):
        t0 = time.time()
        frames_np = load_video_keyframes(src_path, target_fps=6.0,
                                         num_keyframes=T, size_hw=(H, W))
        t1 = time.time()
        u8 = to_uint8(frames_np)
        t2 = time.time()
        dev = jax.device_put(u8)
        jax.block_until_ready(dev)
        # force the transfer to be observable: fetch one scalar
        jax.device_get(dev[0, 0, 0, 0])
        t3 = time.time()
        out = make_hint(params, dev)
        jax.block_until_ready(out)
        t4 = time.time()
        jax.device_get(jnp.ravel(out)[0])
        t5 = time.time()
        print(f"rep{rep}: decode {t1-t0:.2f}  to_u8 {t2-t1:.2f}  "
              f"upload {t3-t2:.2f}  dispatch+run {t4-t3:.2f}  sync {t5-t4:.2f}  "
              f"total {t5-t0:.2f}")

    # pure compute, slope-timed: chained reps inside one jit
    @jax.jit
    def chained(dp, frames_u8, n):
        def body(i, acc):
            frames = (frames_u8.astype(dtype) + acc * 1e-9) / 127.5 - 1.0
            depth = dpt.apply(dp, frames)
            h = midas_postprocess(depth.astype(jnp.float32)).astype(dtype)
            return jnp.mean(h).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    dev = jax.device_put(u8)
    sync(chained(params, dev, 1))
    t0 = time.time(); sync(chained(params, dev, 2)); t2 = time.time() - t0
    t0 = time.time(); sync(chained(params, dev, 6)); t6 = time.time() - t0
    print(f"== DPT compute slope: {(t6-t2)/4*1000:.1f} ms/eval "
          f"(n=2 {t2:.2f}s, n=6 {t6:.2f}s)")

    # upload bandwidth probe: different sizes
    print("== upload bandwidth ==")
    for mb in [1, 5, 20]:
        arr = np.zeros((mb * 1024 * 1024,), np.uint8)
        t0 = time.time()
        d = jax.device_put(arr)
        jax.block_until_ready(d)
        jax.device_get(d[0])
        dt = time.time() - t0
        print(f"  {mb} MB: {dt:.2f}s = {mb/dt:.1f} MB/s")

    # chunked pipelined variant: upload chunk i+1 while DPT runs chunk i
    CH = 5
    n_chunks = (T + CH - 1) // CH
    padT = n_chunks * CH

    @jax.jit
    def make_hint_chunk(dp, frames_u8):
        frames = frames_u8.astype(dtype) / 127.5 - 1.0
        depth = dpt.apply(dp, frames)
        return midas_postprocess(depth.astype(jnp.float32)).astype(dtype)

    u8p = np.concatenate([u8, np.zeros((padT - T, H, W, 3), np.uint8)], 0)
    # warm chunk program
    sync(make_hint_chunk(params, jnp.asarray(u8p[:CH])))

    for rep in range(3):
        t0 = time.time()
        devs = []
        outs = []
        # dispatch all uploads + computes without syncing; jax pipelines
        for c in range(n_chunks):
            d = jax.device_put(u8p[c * CH:(c + 1) * CH])
            outs.append(make_hint_chunk(params, d))
        for o in outs:
            jax.block_until_ready(o)
        jax.device_get(jnp.ravel(outs[-1])[0])
        dt = time.time() - t0
        print(f"pipelined chunks({CH}) rep{rep}: {dt:.2f}s")


if __name__ == "__main__":
    main()
