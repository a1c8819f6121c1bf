"""GeneralConditioner ASSEMBLY parity: the reference's own forward /
get_unconditional_conditioning (sgm/modules/encoders/modules.py:132-204) is
executed with deterministic stub embedders, and our Conditioner must produce
the same routing (input_key overrides + ndim fallback), the same concat
ORDER on shared keys (KEY2CATDIM: vector d1 / crossattn d2 / concat d1 — all
the feature axis, == -1 channels-last), force-zero semantics, and the
ucg_rate=1.0 zeroing edge."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import install_reference  # noqa: E402


@pytest.fixture(scope="module")
def sgm():
    return install_reference()


def _make_ref_conditioner(sgm, specs):
    """specs: list of (input_key, fn, ucg_rate). fn: tensor -> tensor."""
    from sgm.modules.encoders.modules import (
        AbstractEmbModel,
        GeneralConditioner,
    )

    class StubEmb(AbstractEmbModel):
        def __init__(self, fn):
            super().__init__()
            self.fn = fn
            self.legacy_ucg_val = None

        def forward(self, x):
            return self.fn(x)

    embs = []
    for key, fn, ucg in specs:
        e = StubEmb(fn)
        e.input_key = key
        e.ucg_rate = ucg
        e.is_trainable = False
        embs.append(e)

    cond = GeneralConditioner.__new__(GeneralConditioner)
    torch.nn.Module.__init__(cond)
    cond.embedders = torch.nn.ModuleList(embs)
    return cond


def _make_our_conditioner(specs):
    """Matching channels-last stubs for ccedit_tpu.conditioning.Conditioner."""
    from ccedit_tpu.conditioning.conditioner import Conditioner, EmbedderSpec

    class StubEmb:
        wants_rng = False

        def __init__(self, fn):
            self.fn = fn

        def prepare(self, val):
            return val

        def init_params(self, rng, prepared):
            return {}

        def embed(self, params, x):
            return self.fn(x)

    return Conditioner([
        EmbedderSpec(embedder=StubEmb(fn), input_key=key, ucg_rate=ucg)
        for key, fn, ucg in specs
    ])


# channel-position helpers: torch stubs see channels-first, ours channels-last
def _t(x):  # np (B, ..., C) -> torch (B, C, ...)
    perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    return torch.from_numpy(np.ascontiguousarray(x.transpose(perm)))


def _to_ours_layout(t):  # torch (B, C, ...) -> np (B, ..., C)
    x = t.detach().numpy()
    perm = (0,) + tuple(range(2, x.ndim)) + (1,)
    return x.transpose(perm)


class TestConditionerAssemblyParity:
    @pytest.fixture(scope="class")
    def batch(self):
        rng = np.random.default_rng(42)
        return {
            # 2D -> vector; two embedders share the key space via outputs
            "cls_vec": rng.standard_normal((2, 8)).astype(np.float32),
            # 3D -> crossattn; TWO crossattn embedders pin concat order (d2)
            "txt_feats": rng.standard_normal((2, 5, 16)).astype(np.float32),
            "txt_feats2": rng.standard_normal((2, 5, 8)).astype(np.float32),
            # 4D -> concat; two embedders pin channel-concat order (d1);
            # arrays are channels-LAST here, transposed for the torch side
            "concat_a": rng.standard_normal((2, 6, 6, 4)).astype(np.float32),
            "concat_b": rng.standard_normal((2, 6, 6, 2)).astype(np.float32),
            # input_key override routing
            "control_hint": rng.standard_normal((2, 4, 6, 6, 3)).astype(np.float32),
        }

    # (input_key, torch fn, our fn, ucg)
    SPEC_TABLE = [
        ("cls_vec", lambda x: 2.0 * x, lambda x: 2.0 * x, 0.0),
        ("txt_feats", lambda x: x + 1.0, lambda x: x + 1.0, 0.0),
        ("txt_feats2", lambda x: 0.5 * x, lambda x: 0.5 * x, 0.0),
        ("concat_a", lambda x: x - 0.25, lambda x: x - 0.25, 0.0),
        ("concat_b", lambda x: x * -1.0, lambda x: x * -1.0, 0.0),
        ("control_hint", lambda x: x, lambda x: x, 0.0),
    ]

    def _build(self, sgm, ucg_overrides=None):
        ucg = dict(ucg_overrides or {})
        ref_specs, our_specs = [], []
        for key, tfn, jfn, rate in self.SPEC_TABLE:
            rate = ucg.get(key, rate)
            ref_specs.append((key, tfn, rate))
            our_specs.append((key, jfn, rate))
        return _make_ref_conditioner(sgm, ref_specs), _make_our_conditioner(our_specs)

    def _torch_batch(self, batch):
        tb = {}
        for k, v in batch.items():
            # txt feats are (B, L, D) on BOTH sides (crossattn layout);
            # vector is (B, D); spatial keys go channels-first for torch
            if v.ndim <= 3:
                tb[k] = torch.from_numpy(v)
            else:
                tb[k] = _t(v)
        return tb

    def _compare(self, ref_out, our_out):
        import jax.numpy as jnp  # noqa: F401

        assert set(ref_out) == set(our_out), (set(ref_out), set(our_out))
        for key, rv in ref_out.items():
            ov = np.asarray(our_out[key])
            if rv.dim() <= 3:
                np.testing.assert_allclose(ov, rv.detach().numpy(),
                                           rtol=1e-6, atol=1e-7,
                                           err_msg=key)
            else:
                np.testing.assert_allclose(ov, _to_ours_layout(rv),
                                           rtol=1e-6, atol=1e-7,
                                           err_msg=key)

    def test_routing_and_concat_order(self, sgm, batch):
        ref, ours = self._build(sgm)
        ref_out = ref(self._torch_batch(batch))
        # routing: vector + crossattn(16+8 on feature axis) + concat(4+2 ch)
        assert ref_out["crossattn"].shape == (2, 5, 24)
        assert ref_out["concat"].shape == (2, 6, 6, 6)
        our_out = ours({}, dict(batch))
        self._compare(ref_out, our_out)

    def test_unconditional_pair_with_force_zero(self, sgm, batch):
        ref, ours = self._build(sgm)
        batch_uc = dict(batch)
        batch_uc["txt_feats"] = np.zeros_like(batch["txt_feats"]) + 0.1
        c_ref, uc_ref = ref.get_unconditional_conditioning(
            self._torch_batch(batch), self._torch_batch(batch_uc),
            force_uc_zero_embeddings=["txt_feats2", "concat_a"])
        c_ours, uc_ours = ours.get_unconditional_conditioning(
            {}, dict(batch), dict(batch_uc),
            force_uc_zero_keys=["txt_feats2", "concat_a"])
        self._compare(c_ref, c_ours)
        self._compare(uc_ref, uc_ours)
        # the zeroed slice sits at the RIGHT position in the concat
        assert np.allclose(np.asarray(uc_ours["crossattn"])[..., 16:], 0.0)
        assert not np.allclose(np.asarray(uc_ours["crossattn"])[..., :16], 0.0)

    def test_ucg_rate_one_zeroes(self, sgm, batch):
        """ucg_rate=1.0 -> bernoulli(0) -> deterministic zeroing on both
        sides (the probabilistic middle can't be pinned across RNGs)."""
        import jax

        ref, ours = self._build(sgm, ucg_overrides={"cls_vec": 1.0})
        ref_out = ref(self._torch_batch(batch))
        our_out = ours.embed({}, ours.prepare(dict(batch)),
                             rng=jax.random.PRNGKey(0), apply_ucg=True)
        assert np.allclose(ref_out["vector"].numpy(), 0.0)
        assert np.allclose(np.asarray(our_out["vector"]), 0.0)
        # the other keys are untouched
        self._compare({k: v for k, v in ref_out.items() if k != "vector"},
                      {k: v for k, v in our_out.items() if k != "vector"})


class TestLowScaleEncoderParity:
    """LowScaleEncoder (modules.py:849-941) oracle-pinned: the reference's
    real register_schedule/q_sample/forward run with an identity first-stage
    model, injected timesteps + noise, integer-ratio nearest upsample."""

    def test_qsample_and_resize(self, sgm):
        from unittest import mock

        import torch as _torch

        from sgm.modules.encoders.modules import LowScaleEncoder as RefLSE

        from ccedit_tpu.conditioning.embedders import LowScaleEncoder

        ref = RefLSE.__new__(RefLSE)
        torch.nn.Module.__init__(ref)
        ref.max_noise_level = 250

        class _IdentityModel:
            @staticmethod
            def encode(x):
                return x

        ref.model = _IdentityModel()
        # The reference's register_schedule (modules.py:877-883) passes
        # cosine_s to its own make_beta_schedule, whose signature
        # (diffusionmodules/util.py:24-28) does not accept it — a latent
        # reference bug (LowScaleEncoder is unused in the shipped configs;
        # the linear schedule ignores cosine_s anyway).  Shim it off.
        import sgm.modules.encoders.modules as _ref_mod
        from sgm.modules.diffusionmodules.util import make_beta_schedule as _mbs

        with mock.patch.object(
                _ref_mod, "make_beta_schedule",
                lambda schedule, n, cosine_s=None, **k: _mbs(schedule, n, **k)):
            ref.register_schedule(timesteps=1000, linear_start=0.00085,
                                  linear_end=0.0120)
        ref.out_size = 16
        ref.scale_factor = 0.18215

        rng = np.random.default_rng(31)
        x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        noise = rng.standard_normal(x.shape).astype(np.float32)
        t = np.array([17, 201], dtype=np.int64)

        with mock.patch.object(
                _torch, "randint",
                lambda *a, **k: torch.from_numpy(t)), \
             mock.patch.object(
                _torch, "randn_like",
                lambda *a, **k: torch.from_numpy(noise)):
            z_ref, lvl_ref = ref(torch.from_numpy(x))

        ours = LowScaleEncoder(max_noise_level=250, out_size=16,
                               scale_factor=0.18215)
        prepared = ours.prepare(x.transpose(0, 2, 3, 1),
                                noise_override=noise.transpose(0, 2, 3, 1),
                                t_override=t)
        out = np.asarray(ours.embed(None, prepared))
        np.testing.assert_allclose(out.transpose(0, 3, 1, 2),
                                   z_ref.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(ours.last_noise_level,
                                      lvl_ref.numpy().astype(np.int32))


class TestSmallEmbedderParity:
    """The small embedder zoo oracle-pinned against the reference classes
    (modules.py): ClassEmbedder lookup, ConcatTimestepEmbedderND Fourier
    concat, SpatialRescaler interpolate semantics (torch never antialiases;
    legacy nearest is floor-indexed), CustomIdentityEncoder(+DownCond)
    down-blur augmentation, Inpainting/Outpainting band masks, and the
    GaussianEncoder VAE posterior with converted weights + injected noise."""

    def test_class_embedder(self, sgm):
        from sgm.modules.encoders.modules import ClassEmbedder as RefCE

        from ccedit_tpu.conditioning.embedders import ClassEmbedder

        ref = RefCE(embed_dim=16, n_classes=10, add_sequence_dim=True)
        idx = np.array([0, 3, 9], dtype=np.int64)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(idx)).numpy()

        ours = ClassEmbedder(16, n_classes=10, add_sequence_dim=True)
        params = {"embedding": ref.embedding.weight.detach().numpy()}
        out = np.asarray(ours.embed(params, idx))
        np.testing.assert_allclose(out, out_ref, rtol=1e-6, atol=1e-7)
        # ucg class is n_classes - 1 (modules.py:253-260)
        assert (ours.get_unconditional_conditioning(4) == 9).all()

    def test_concat_timestep_embedder(self, sgm):
        from sgm.modules.encoders.modules import (
            ConcatTimestepEmbedderND as RefCT,
        )

        from ccedit_tpu.conditioning.embedders import ConcatTimestepEmbedderND

        ref = RefCT(outdim=32)
        x = np.array([[512.0, 768.0], [0.0, 3.5]], dtype=np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x)).numpy()
        out = np.asarray(ConcatTimestepEmbedderND(32).embed(None, x))
        np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("method,mult,stages", [
        ("bilinear", 0.5, 1),
        ("bilinear", 0.5, 2),
        ("bilinear", 0.75, 1),   # non-integer ratio: half-pixel, no antialias
        ("nearest", 0.5, 1),     # torch legacy nearest = floor indexing
        ("area", 0.5, 1),        # adaptive mean pool at integer ratio
    ])
    def test_spatial_rescaler_methods(self, sgm, method, mult, stages):
        from sgm.modules.encoders.modules import SpatialRescaler as RefSR

        from ccedit_tpu.conditioning.embedders import SpatialRescaler

        ref = RefSR(n_stages=stages, method=method, multiplier=mult)
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(_t(x))
        ours = SpatialRescaler(mult, method, n_stages=stages)
        out = np.asarray(ours.embed(None, x))
        np.testing.assert_allclose(
            out, _to_ours_layout(out_ref), rtol=1e-5, atol=1e-6)

    def test_spatial_rescaler_channel_mapper(self, sgm):
        from sgm.modules.encoders.modules import SpatialRescaler as RefSR

        from ccedit_tpu.conditioning.embedders import SpatialRescaler

        ref = RefSR(n_stages=1, method="bilinear", multiplier=0.5,
                    in_channels=3, out_channels=5, bias=True, kernel_size=3)
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(_t(x))
        ours = SpatialRescaler(0.5, "bilinear", n_stages=1, out_channels=5,
                               kernel_size=3, bias=True)
        params = {
            "kernel": ref.channel_mapper.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": ref.channel_mapper.bias.detach().numpy(),
        }
        out = np.asarray(ours.embed(params, x))
        np.testing.assert_allclose(
            out, _to_ours_layout(out_ref), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("video", [False, True])
    def test_custom_identity_down_blur(self, sgm, video):
        from omegaconf.listconfig import ListConfig as LC

        from sgm.modules.encoders.modules import CustomIdentityEncoder as RefCI

        from ccedit_tpu.conditioning.embedders import CustomIdentityEncoder

        ref = RefCI(down_blur_factor=LC([2.0]))  # single factor: choice is det.
        rng = np.random.default_rng(7)
        if video:
            x = rng.standard_normal((2, 5, 16, 16, 3)).astype(np.float32)
            xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # B C T H W
        else:
            x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
            xt = _t(x)
        with torch.no_grad():
            out_ref = ref(xt).numpy()
        out_ref = (out_ref.transpose(0, 2, 3, 4, 1) if video
                   else out_ref.transpose(0, 2, 3, 1))

        ours = CustomIdentityEncoder(down_blur_factor=[2.0])
        out = np.asarray(ours.embed(None, x))
        np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)

    def test_custom_identity_down_cond(self, sgm):
        from omegaconf.listconfig import ListConfig as LC

        from sgm.modules.encoders.modules import (
            CustomIdentityDownCondEncoder as RefDC,
        )

        from ccedit_tpu.conditioning.embedders import (
            CustomIdentityDownCondEncoder,
        )

        ref = RefDC(outdim=8, down_blur_factor=LC([2.0]))
        rng = np.random.default_rng(8)
        x = rng.standard_normal((2, 5, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

        ours = CustomIdentityDownCondEncoder(outdim=8, down_blur_factor=[2.0])
        out = np.asarray(ours.embed(None, x))
        np.testing.assert_allclose(
            out, out_ref.transpose(0, 2, 3, 4, 1), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("kind", ["inpaint", "outpaint"])
    def test_paint_encoders(self, sgm, kind):
        from unittest import mock

        from sgm.modules.encoders.modules import (
            InpaintingEncoder as RefIn,
            OutpaintingEncoder as RefOut,
        )

        from ccedit_tpu.conditioning.embedders import (
            InpaintingEncoder,
            OutpaintingEncoder,
        )

        draws = np.array([0.12, 0.77, 0.33, 0.91], dtype=np.float32)
        seq = [torch.tensor([float(v)]) for v in draws]
        ref = RefIn() if kind == "inpaint" else RefOut()
        ours = (InpaintingEncoder() if kind == "inpaint"
                else OutpaintingEncoder())

        rng = np.random.default_rng(9)
        x = rng.uniform(-1, 1, (2, 3, 16, 20, 3)).astype(np.float32)
        with mock.patch.object(torch, "rand", side_effect=seq):
            out_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

        out = ours.prepare(x, rand_override=draws)
        np.testing.assert_allclose(
            out, out_ref.transpose(0, 2, 3, 4, 1), rtol=1e-6, atol=1e-7)

    def test_gaussian_encoder(self, sgm):
        from unittest import mock

        from reference_compat import randomize_state_dict

        from sgm.modules.encoders.modules import GaussianEncoder as RefGE

        from ccedit_tpu.conditioning.embedders import GaussianEncoder
        from ccedit_tpu.io.torch_convert import convert_vae

        dd = dict(double_z=True, z_channels=4, resolution=16, in_channels=3,
                  out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                  attn_resolutions=[], dropout=0.0)
        ref = RefGE(weight=1.0, flatten_output=True, **dd).eval()
        randomize_state_dict(ref, seed=21)

        rng = np.random.default_rng(22)
        x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
        noise = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        with torch.no_grad(), mock.patch.object(
                torch, "randn", lambda *a, **k: torch.from_numpy(noise)):
            log_ref, z_ref = ref(_t(x))

        sd = {f"first_stage_model.encoder.{k}": v.detach().numpy()
              for k, v in ref.state_dict().items()}
        params = convert_vae(sd, ch_mult=(1, 2), num_res_blocks=1,
                             strict=False)["encoder"]

        ours = GaussianEncoder(weight=1.0, flatten_output=True, ch=32,
                               ch_mult=(1, 2), num_res_blocks=1,
                               attn_resolutions=(), in_channels=3,
                               z_channels=4, double_z=True, resolution=16)
        z, kl = ours.embed_with_kl(
            params, x, noise_override=noise.transpose(0, 2, 3, 1))
        z = np.asarray(z)
        # ref z: (B, HW, C) already (flatten_output rearranges b c h w)
        np.testing.assert_allclose(z, z_ref.numpy(), rtol=1e-4, atol=2e-4)
        kl_ref = float(log_ref["kl_loss"])
        kl_ours = float(np.sum(np.asarray(kl)) / z.shape[0])
        np.testing.assert_allclose(kl_ours, kl_ref, rtol=1e-4, atol=1e-4)
