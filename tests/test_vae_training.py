"""VAE GAN training: LPIPS + PatchGAN discriminator parity (torch oracles
built from the public taming definitions the reference imports at
sgm/modules/autoencoding/losses/__init__.py:6-8) and the 2-optimizer
AutoencodingEngine training loop."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# -- torch oracles ----------------------------------------------------------

class _TorchVGG16(torch.nn.Module):
    """torchvision vgg16.features layout (13 convs, 5 pools)."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers += [torch.nn.Conv2d(in_ch, v, 3, padding=1),
                           torch.nn.ReLU()]
                in_ch = v
        self.features = torch.nn.Sequential(*layers)

    def taps(self, x):
        out, taps = x, []
        tap_idx = {3, 8, 15, 22, 29}  # relu1_2, 2_2, 3_3, 4_3, 5_3
        for i, layer in enumerate(self.features):
            out = layer(out)
            if i in tap_idx:
                taps.append(out)
        return taps


class _TorchLPIPS(torch.nn.Module):
    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __init__(self):
        super().__init__()
        self.net = _TorchVGG16()
        chans = [64, 128, 256, 512, 512]
        self.lins = torch.nn.ModuleList(
            [torch.nn.Conv2d(c, 1, 1, bias=False) for c in chans])

    def forward(self, in0, in1):
        f0 = self.net.taps((in0 - self.SHIFT) / self.SCALE)
        f1 = self.net.taps((in1 - self.SHIFT) / self.SCALE)
        total = 0
        for k, (a, b) in enumerate(zip(f0, f1)):
            a = a / (a.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            b = b / (b.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            total = total + self.lins[k]((a - b) ** 2).mean([2, 3],
                                                            keepdim=True)
        return total


class _TorchNLayerDisc(torch.nn.Module):
    """taming NLayerDiscriminator(use_actnorm=False)."""

    def __init__(self, input_nc=3, ndf=8, n_layers=3):
        super().__init__()
        seq = [torch.nn.Conv2d(input_nc, ndf, 4, 2, 1),
               torch.nn.LeakyReLU(0.2, True)]
        mult = 1
        for n in range(1, n_layers):
            prev, mult = mult, min(2 ** n, 8)
            seq += [torch.nn.Conv2d(ndf * prev, ndf * mult, 4, 2, 1,
                                    bias=False),
                    torch.nn.BatchNorm2d(ndf * mult),
                    torch.nn.LeakyReLU(0.2, True)]
        prev, mult = mult, min(2 ** n_layers, 8)
        seq += [torch.nn.Conv2d(ndf * prev, ndf * mult, 4, 1, 1, bias=False),
                torch.nn.BatchNorm2d(ndf * mult),
                torch.nn.LeakyReLU(0.2, True),
                torch.nn.Conv2d(ndf * mult, 1, 4, 1, 1)]
        self.main = torch.nn.Sequential(*seq)

    def forward(self, x):
        return self.main(x)


def _randomize(model, seed, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * scale
    model.load_state_dict(sd)
    return model


class TestLPIPSParity:
    def test_matches_torch(self):
        import jax.numpy as jnp

        from ccedit_tpu.modules.lpips import LPIPS, convert_lpips

        tm = _randomize(_TorchLPIPS().eval(), 80, 0.08)
        g = torch.Generator().manual_seed(81)
        a = torch.rand(2, 3, 32, 32, generator=g) * 2 - 1
        b = torch.rand(2, 3, 32, 32, generator=g) * 2 - 1
        with torch.no_grad():
            ref = tm(a, b).numpy()

        sd = {}
        for k, v in tm.state_dict().items():
            k = k.replace("lins.", "lin").replace("net.features.", "net.features.")
            sd[k] = v.numpy()
        # adapt lins.N.weight -> linN.model.1.weight (taming layout)
        sd = {k.replace("lin", "lin") if not k.startswith("lin") else
              f"{k.split('.')[0]}.model.1.weight": v for k, v in sd.items()}
        params = convert_lpips(sd)
        jm = LPIPS()
        out = jm.apply({"params": params},
                       jnp.asarray(a.numpy().transpose(0, 2, 3, 1)),
                       jnp.asarray(b.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).reshape(-1),
                                   ref.reshape(-1), atol=1e-4, rtol=1e-3)


class TestDiscriminatorParity:
    def test_matches_torch(self):
        import jax.numpy as jnp

        from ccedit_tpu.modules.discriminator import NLayerDiscriminator

        tm = _randomize(_TorchNLayerDisc(ndf=8).train(), 82, 0.08)
        g = torch.Generator().manual_seed(83)
        x = torch.rand(2, 3, 32, 32, generator=g) * 2 - 1
        with torch.no_grad():
            ref = tm(x).numpy()

        # convert: conv layers at main indices 0,2,5,8,11; bns at 3,6,9
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = {
            "conv_0": {"kernel": sd["main.0.weight"].transpose(2, 3, 1, 0),
                       "bias": sd["main.0.bias"]},
            "conv_1": {"kernel": sd["main.2.weight"].transpose(2, 3, 1, 0)},
            "bn_1": {"scale": sd["main.3.weight"], "bias": sd["main.3.bias"]},
            "conv_2": {"kernel": sd["main.5.weight"].transpose(2, 3, 1, 0)},
            "bn_2": {"scale": sd["main.6.weight"], "bias": sd["main.6.bias"]},
            "conv_3": {"kernel": sd["main.8.weight"].transpose(2, 3, 1, 0)},
            "bn_3": {"scale": sd["main.9.weight"], "bias": sd["main.9.bias"]},
            "head": {"kernel": sd["main.11.weight"].transpose(2, 3, 1, 0),
                     "bias": sd["main.11.bias"]},
        }
        jm = NLayerDiscriminator(ndf=8)
        out = jm.apply({"params": params},
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                                   atol=1e-4, rtol=1e-3)


class TestVAETrainer:
    def test_two_steps_update_both_optimizers(self):
        import jax
        import jax.numpy as jnp

        from ccedit_tpu.models.autoencoder_engine import (
            AutoencodingEngine,
            LPIPSWithDiscriminatorConfig,
            VAETrainer,
        )
        from ccedit_tpu.modules.vae import AutoencoderKL

        ae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(), resolution=32)
        cfg = LPIPSWithDiscriminatorConfig(
            disc_start=0, disc_num_layers=2,
            regularization_weights={"kl_loss": 1e-6})
        eng = AutoencodingEngine(ae, cfg)
        trainer = VAETrainer(eng, lr=1e-4)
        x = jnp.asarray(
            np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
            * 2 - 1)
        state = trainer.init_state(jax.random.PRNGKey(0), x)
        p0 = jax.tree_util.tree_map(np.asarray, state["params"])
        for i in range(2):
            state, logs = trainer.train_step(state, x, jax.random.PRNGKey(i))
        assert np.isfinite(float(logs["train/total_loss"]))
        assert np.isfinite(float(logs["train/disc_loss"]))
        p1 = state["params"]
        # generator (ae) and discriminator moved; frozen lpips unchanged
        assert not np.allclose(
            p0["ae"]["encoder"]["conv_in"]["kernel"],
            np.asarray(p1["ae"]["encoder"]["conv_in"]["kernel"]))
        assert not np.allclose(p0["disc"]["conv_0"]["kernel"],
                               np.asarray(p1["disc"]["conv_0"]["kernel"]))
        np.testing.assert_allclose(
            p0["lpips"]["lin_0"]["kernel"],
            np.asarray(p1["lpips"]["lin_0"]["kernel"]))
        assert int(state["step"]) == 2
