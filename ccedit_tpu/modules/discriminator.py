"""PatchGAN discriminator + GAN losses for VAE training.

Behavioural parity targets (referenced by sgm/modules/autoencoding/losses/
__init__.py:6-8):
  * ``taming.modules.discriminator.model.NLayerDiscriminator`` — pix2pix
    PatchGAN: Conv(4,2) + LeakyReLU(0.2), then n_layers of
    Conv(4,2,no-bias)+BatchNorm+LeakyReLU with channel doubling (cap 8x),
    a stride-1 stage, and a 1-channel head.
  * ``weights_init`` — N(0, 0.02) convs, BatchNorm scale N(1, 0.02), bias 0.
  * ``hinge_d_loss`` / ``vanilla_d_loss``.

TPU notes: channels-last; BatchNorm uses per-batch statistics (torch train
mode — taming never switches the discriminator to eval during GAN training);
under data parallelism the engine computes batch stats per shard, which
matches torch DDP's unsynced BatchNorm default.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _BatchStatsNorm(nn.Module):
    """BatchNorm over (N,H,W) with batch statistics (no running averages —
    GAN training uses train-mode stats on both G and D passes)."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch Conv2d(k=4, s=2, p=1): symmetric padding 1 gives identical
        # window starts and counts for every input size
        pad = ((1, 1), (1, 1))
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=pad,
                    dtype=self.dtype, name="conv_0")(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2), padding=pad,
                        use_bias=False, dtype=self.dtype, name=f"conv_{n}")(x)
            x = _BatchStatsNorm(dtype=self.dtype, name=f"bn_{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False, dtype=self.dtype,
                    name=f"conv_{self.n_layers}")(x)
        x = _BatchStatsNorm(dtype=self.dtype, name=f"bn_{self.n_layers}")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1, dtype=self.dtype,
                       name="head")(x)


def discriminator_init(rng, model: NLayerDiscriminator, sample):
    """taming weights_init semantics: conv kernels N(0, 0.02), norm scale
    N(1, 0.02), norm bias 0.  Conv biases are NOT touched by weights_init —
    torch leaves them at the Conv2d default U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
    reproduced here so the GAN starting point matches."""
    params = model.init(rng, sample)["params"]

    # modules that own a conv kernel (their bias gets the torch conv default)
    conv_fanin = {}

    def collect(path, leaf):
        if path[-1].key == "kernel":
            kh, kw, cin = leaf.shape[0], leaf.shape[1], leaf.shape[2]
            conv_fanin[tuple(p.key for p in path[:-1])] = kh * kw * cin
        return leaf

    jax.tree_util.tree_map_with_path(collect, params)

    def reinit(path, leaf):
        keyseq = "/".join(str(p.key) for p in path)
        sub = jax.random.fold_in(rng, hash(keyseq) % (2 ** 31))
        if path[-1].key == "kernel":
            return 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype)
        if path[-1].key == "scale":
            return 1.0 + 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype)
        parent = tuple(p.key for p in path[:-1])
        if path[-1].key == "bias" and parent in conv_fanin:
            bound = conv_fanin[parent] ** -0.5
            return jax.random.uniform(sub, leaf.shape, leaf.dtype,
                                      minval=-bound, maxval=bound)
        return jnp.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(reinit, params)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(nn.softplus(-logits_real))
                  + jnp.mean(nn.softplus(logits_fake)))
