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


def _lpips_params(tm):
    """_TorchLPIPS state_dict -> our flax params via the production
    convert_lpips (taming vgg.pth key layout)."""
    from ccedit_tpu.modules.lpips import convert_lpips

    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("lins."):
            sd[f"lin{k.split('.')[1]}.model.1.weight"] = v.numpy()
        else:
            sd[k] = v.numpy()
    return convert_lpips(sd)


def _disc_params(tm, n_layers=3):
    """_TorchNLayerDisc state_dict -> our NLayerDiscriminator params."""
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"conv_0": {"kernel": sd["main.0.weight"].transpose(2, 3, 1, 0),
                         "bias": sd["main.0.bias"]}}
    idx = 2
    for n in range(1, n_layers + 1):
        params[f"conv_{n}"] = {
            "kernel": sd[f"main.{idx}.weight"].transpose(2, 3, 1, 0)}
        params[f"bn_{n}"] = {"scale": sd[f"main.{idx + 1}.weight"],
                             "bias": sd[f"main.{idx + 1}.bias"]}
        idx += 3
    params["head"] = {"kernel": sd[f"main.{idx}.weight"].transpose(2, 3, 1, 0),
                      "bias": sd[f"main.{idx}.bias"]}
    return params


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
    @pytest.mark.slow
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


class TestGANLossParity:
    """The COMPOSITE autoencoder GAN loss, oracle-pinned: the reference's
    own ``GeneralLPIPSWithDiscriminator`` (sgm/modules/autoencoding/losses/
    __init__.py:87-246) is imported and executed — its real ``__init__``,
    ``forward`` and ``calculate_adaptive_weight`` (torch autograd through
    the decoder's last conv) — with torch stand-ins registered under the
    ``taming`` module names it imports (LPIPS / NLayerDiscriminator /
    hinge+vanilla d-losses, the public taming definitions).  The posterior
    eps draw is injected on both sides, and our ``AutoencodingEngine``
    generator/discriminator losses must reproduce: total loss, nll, g_loss,
    the adaptive d_weight (jax.grad vs torch.autograd.grad seam), rec_loss,
    kl regularization, hinge AND vanilla disc losses, and the disc_start
    warm-up gate."""

    GEOM = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
    DISC_START = 3
    DISC_WEIGHT = 0.75
    KL_W = 1e-6

    @staticmethod
    def _install_taming_oracles():
        import sys
        import types

        import torch.nn.functional as F

        class _NLayerDisc(_TorchNLayerDisc):
            def __init__(self, input_nc=3, ndf=8, n_layers=3,
                         use_actnorm=False):
                assert not use_actnorm
                super().__init__(input_nc=input_nc, ndf=8, n_layers=n_layers)

        def weights_init(m):  # taming model.py weights_init
            name = m.__class__.__name__
            if name.find("Conv") != -1:
                torch.nn.init.normal_(m.weight.data, 0.0, 0.02)
            elif name.find("BatchNorm") != -1:
                torch.nn.init.normal_(m.weight.data, 1.0, 0.02)
                torch.nn.init.constant_(m.bias.data, 0)

        def hinge_d_loss(logits_real, logits_fake):
            return 0.5 * (torch.mean(F.relu(1.0 - logits_real))
                          + torch.mean(F.relu(1.0 + logits_fake)))

        def vanilla_d_loss(logits_real, logits_fake):
            return 0.5 * (torch.mean(F.softplus(-logits_real))
                          + torch.mean(F.softplus(logits_fake)))

        for name in ("taming.modules.discriminator",
                     "taming.modules.discriminator.model",
                     "taming.modules.losses.vqperceptual"):
            if name not in sys.modules:
                m = types.ModuleType(name)
                import importlib.machinery as im

                m.__spec__ = im.ModuleSpec(name, None)
                sys.modules[name] = m
        dm = sys.modules["taming.modules.discriminator.model"]
        dm.NLayerDiscriminator = _NLayerDisc
        dm.weights_init = weights_init
        vq = sys.modules["taming.modules.losses.vqperceptual"]
        vq.hinge_d_loss = hinge_d_loss
        vq.vanilla_d_loss = vanilla_d_loss
        sys.modules["taming.modules.losses.lpips"].LPIPS = _TorchLPIPS

    @pytest.fixture(scope="class")
    def oracle(self):
        from reference_compat import install_reference

        install_reference()
        self._install_taming_oracles()
        from sgm.modules.autoencoding.losses import (
            GeneralLPIPSWithDiscriminator,
        )
        from sgm.modules.distributions.distributions import (
            DiagonalGaussianDistribution,
        )
        from sgm.modules.diffusionmodules.model import (
            Decoder as TDec,
            Encoder as TEnc,
        )

        g = self.GEOM
        ddconfig = dict(
            double_z=True, z_channels=4, resolution=g["resolution"],
            in_channels=3, out_ch=3, ch=g["ch"], ch_mult=list(g["ch_mult"]),
            num_res_blocks=g["num_res_blocks"], attn_resolutions=[],
            dropout=0.0,
        )
        tenc, tdec = TEnc(**ddconfig), TDec(**ddconfig)
        tq, tpq = torch.nn.Conv2d(8, 8, 1), torch.nn.Conv2d(4, 4, 1)
        for m, seed in ((tenc, 61), (tdec, 62), (tq, 63), (tpq, 64)):
            _randomize(m, seed, 0.08)

        refs = {}
        for kind in ("hinge", "vanilla"):
            ref = GeneralLPIPSWithDiscriminator(
                disc_start=self.DISC_START, disc_weight=self.DISC_WEIGHT,
                disc_loss=kind,
                regularization_weights={"kl_loss": self.KL_W},
            )
            _randomize(ref.perceptual_loss, 65, 0.08)
            _randomize(ref.discriminator, 66, 0.08)
            refs[kind] = ref

        gen = torch.Generator().manual_seed(67)
        x = torch.rand(2, 3, 32, 32, generator=gen) * 2 - 1
        eps = torch.randn(2, 4, 16, 16, generator=gen)

        def torch_side(ref, optimizer_idx, global_step):
            moments = tq(tenc(x))
            posterior = DiagonalGaussianDistribution(moments)
            z = posterior.mean + posterior.std * eps
            kl = posterior.kl()
            kl = torch.sum(kl) / kl.shape[0]  # DiagonalGaussianRegularizer
            xrec = tdec(tpq(z))
            return ref(
                {"kl_loss": kl}, x, xrec, optimizer_idx, global_step,
                last_layer=tdec.conv_out.weight,
            )

        return dict(tenc=tenc, tdec=tdec, tq=tq, tpq=tpq, refs=refs,
                    x=x, eps=eps, torch_side=torch_side)

    @pytest.fixture(scope="class")
    def ours(self, oracle):
        import jax.numpy as jnp

        from ccedit_tpu.io.torch_convert import convert_vae
        from ccedit_tpu.models.autoencoder_engine import (
            AutoencodingEngine,
            LPIPSWithDiscriminatorConfig,
        )
        from ccedit_tpu.modules.discriminator import NLayerDiscriminator
        from ccedit_tpu.modules.vae import AutoencoderKL

        g = self.GEOM
        sd = {}
        for name, m in (("encoder", oracle["tenc"]),
                        ("decoder", oracle["tdec"]),
                        ("quant_conv", oracle["tq"]),
                        ("post_quant_conv", oracle["tpq"])):
            sd.update({f"first_stage_model.{name}.{k}": v.detach().numpy()
                       for k, v in m.state_dict().items()})
        ae_params = convert_vae(sd, ch_mult=g["ch_mult"],
                                num_res_blocks=g["num_res_blocks"])

        engines = {}
        for kind in ("hinge", "vanilla"):
            eng = AutoencodingEngine(
                AutoencoderKL(embed_dim=4, **g),
                LPIPSWithDiscriminatorConfig(
                    disc_start=self.DISC_START, disc_weight=self.DISC_WEIGHT,
                    disc_loss=kind,
                    regularization_weights={"kl_loss": self.KL_W}),
            )
            eng.disc = NLayerDiscriminator(ndf=8)
            engines[kind] = eng
        params = {
            "ae": ae_params,
            "logvar": jnp.asarray(0.0, jnp.float32),
            "disc": _disc_params(oracle["refs"]["hinge"].discriminator),
            "lpips": _lpips_params(oracle["refs"]["hinge"].perceptual_loss),
        }
        x_j = jnp.asarray(oracle["x"].numpy().transpose(0, 2, 3, 1))
        eps_j = jnp.asarray(oracle["eps"].numpy().transpose(0, 2, 3, 1))
        return dict(engines=engines, params=params, x=x_j, eps=eps_j)

    @pytest.mark.parametrize("global_step", [5, 0],
                             ids=["disc-active", "disc-gated"])
    @pytest.mark.slow
    def test_generator_loss_parity(self, oracle, ours, global_step):
        import jax

        ref_loss, ref_log = oracle["torch_side"](
            oracle["refs"]["hinge"], 0, global_step)
        eng = ours["engines"]["hinge"]
        loss, log = eng.generator_loss(
            ours["params"], ours["x"], jax.random.PRNGKey(0),
            jax.numpy.asarray(global_step), noise_override=ours["eps"])
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=2e-3, atol=1e-6)
        for ours_k, ref_k in [("nll_loss", "train/nll_loss"),
                              ("g_loss", "train/g_loss"),
                              ("d_weight", "train/d_weight"),
                              ("rec_loss", "train/rec_loss"),
                              ("kl_loss", "train/kl_loss")]:
            np.testing.assert_allclose(
                float(log[ours_k]), float(ref_log[ref_k]),
                rtol=2e-3, atol=1e-6, err_msg=ours_k)

    @pytest.mark.parametrize("kind", ["hinge", "vanilla"])
    @pytest.mark.parametrize("global_step", [5, 0],
                             ids=["disc-active", "disc-gated"])
    def test_discriminator_loss_parity(self, oracle, ours, kind, global_step):
        import jax

        with torch.no_grad():
            ref_loss, ref_log = oracle["torch_side"](
                oracle["refs"][kind], 1, global_step)
        eng = ours["engines"][kind]
        loss, log = eng.discriminator_loss(
            ours["params"], ours["x"], jax.random.PRNGKey(0),
            jax.numpy.asarray(global_step), noise_override=ours["eps"])
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(
            float(log["logits_real"]), float(ref_log["train/logits_real"]),
            rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(
            float(log["logits_fake"]), float(ref_log["train/logits_fake"]),
            rtol=2e-3, atol=1e-6)

    def test_latent_lpips_parity(self, oracle, ours):
        """LatentLPIPS (losses/__init__.py:19-84): latent L2 + LPIPS through
        a frozen decoder, plus the perceptual_weight_on_inputs branch — the
        reference's real forward run with our converted decoder/LPIPS."""
        import jax.numpy as jnp

        from sgm.modules.autoencoding.losses import LatentLPIPS as RefLL

        from ccedit_tpu.models.autoencoder_engine import LatentLPIPS
        from ccedit_tpu.modules.vae import AutoencoderKL

        tdec, tpq = oracle["tdec"], oracle["tpq"]
        ref = RefLL.__new__(RefLL)
        torch.nn.Module.__init__(ref)
        ref.scale_input_to_tgt_size = False
        ref.scale_tgt_to_input_size = False

        class _Dec:
            @staticmethod
            def decode(z):
                return tdec(tpq(z))

        ref.decoder = _Dec()
        ref.perceptual_loss = oracle["refs"]["hinge"].perceptual_loss
        ref.perceptual_weight = 1.0
        ref.latent_weight = 0.7
        ref.perceptual_weight_on_inputs = 0.5

        g = torch.Generator().manual_seed(68)
        lat_in = torch.randn(2, 4, 16, 16, generator=g) * 0.3
        lat_pred = lat_in + torch.randn(2, 4, 16, 16, generator=g) * 0.1
        with torch.no_grad():
            ref_loss, ref_log = ref(lat_in, lat_pred, oracle["x"])

        g = self.GEOM
        ll = LatentLPIPS(AutoencoderKL(embed_dim=4, **g),
                         perceptual_weight=1.0, latent_weight=0.7,
                         perceptual_weight_on_inputs=0.5)
        loss, log = ll(
            {"decoder": ours["params"]["ae"],
             "lpips": ours["params"]["lpips"]},
            jnp.asarray(lat_in.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(lat_pred.numpy().transpose(0, 2, 3, 1)),
            image_inputs=ours["x"])
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=2e-3, atol=1e-6)
        for ours_k, ref_k in [("latent_l2_loss", "train/latent_l2_loss"),
                              ("perceptual_loss", "train/perceptual_loss"),
                              ("perceptual_loss_on_inputs",
                               "train/perceptual_loss_on_inputs")]:
            np.testing.assert_allclose(float(log[ours_k]),
                                       float(ref_log[ref_k]),
                                       rtol=2e-3, atol=1e-6, err_msg=ours_k)
