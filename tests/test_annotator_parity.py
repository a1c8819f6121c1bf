"""Parity tests for the vendored annotator CNNs (lineart Generator, HED)
against the reference torch implementations with converted random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import install_reference, randomize_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def sgm():
    return install_reference()


class TestLineartGeneratorParity:
    def test_forward_matches(self, sgm):
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.annotators.lineart_model import (
            LineartGenerator,
            convert_lineart,
        )
        from sgm.modules.diffusionmodules.util import Generator as TorchGen

        tm = TorchGen(3, 1, 3).eval()
        randomize_state_dict(tm, seed=40, scale=0.1)

        x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(41))
        with torch.no_grad():
            ref = tm(x).numpy()

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = convert_lineart(sd)
        jm = LineartGenerator(n_residual_blocks=3)
        out = jm.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=1e-3
        )


class TestHEDParity:
    def test_forward_matches(self, sgm):
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.annotators.hed import HEDNetwork, convert_hed
        from sgm.modules.encoders.modules import ControlNetHED_Apache2

        tm = ControlNetHED_Apache2().eval()
        randomize_state_dict(tm, seed=42, scale=0.05)

        x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(43))
        with torch.no_grad():
            refs = [p.numpy() for p in tm(x)]

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = convert_hed(sd)
        jm = HEDNetwork()
        outs = jm.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        assert len(outs) == 5
        for ours, theirs in zip(outs, refs):
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=5e-4, rtol=1e-3
            )


# ---------------------------------------------------------------------------
# PiDiNet: torch oracle runs the RUNTIME pixel-difference convolutions
# (hellozhuo/pidinet model.py semantics, vendored by the reference as
# src.controlnet11.annotator.pidinet); the flax model runs load-time-CONVERTED
# plain convs — so this pins both the architecture and the conversion algebra.
# ---------------------------------------------------------------------------

def _make_pdc(op):
    import torch.nn.functional as F

    if op == "cv":
        def func(x, w, bias, padding, groups):
            return F.conv2d(x, w, bias, padding=padding, groups=groups)
    elif op == "cd":
        def func(x, w, bias, padding, groups):
            wc = w.sum(dim=[2, 3], keepdim=True)
            yc = F.conv2d(x, wc, stride=1, padding=0, groups=groups)
            y = F.conv2d(x, w, bias, padding=padding, groups=groups)
            return y - yc
    elif op == "ad":
        def func(x, w, bias, padding, groups):
            shape = w.shape
            w = w.view(shape[0], shape[1], -1)
            wconv = (w - w[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).view(shape)
            return F.conv2d(x, wconv, bias, padding=padding, groups=groups)
    elif op == "rd":
        def func(x, w, bias, padding, groups):
            shape = w.shape
            buf = torch.zeros(shape[0], shape[1], 25)
            w = w.view(shape[0], shape[1], -1)
            buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = w[:, :, 1:]
            buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -w[:, :, 1:]
            return F.conv2d(x, buf.view(shape[0], shape[1], 5, 5), bias,
                            padding=2, groups=groups)
    return func


class _TorchPDCConv(torch.nn.Module):
    def __init__(self, op, inp, out, groups=1):
        super().__init__()
        self.op, self.groups = op, groups
        self.weight = torch.nn.Parameter(torch.randn(out, inp // groups, 3, 3))
        self.fn = _make_pdc(op)

    def forward(self, x):
        return self.fn(x, self.weight, None, 1, self.groups)


class _TorchPDCBlock(torch.nn.Module):
    def __init__(self, op, inp, out, stride=1):
        super().__init__()
        self.stride = stride
        self.conv1 = _TorchPDCConv(op, inp, inp, groups=inp)
        self.conv2 = torch.nn.Conv2d(inp, out, 1, bias=False)
        if stride > 1:
            self.shortcut = torch.nn.Conv2d(inp, out, 1)

    def forward(self, x):
        import torch.nn.functional as F

        if self.stride > 1:
            x = F.max_pool2d(x, 2, 2)
        y = self.conv2(F.relu(self.conv1(x)))
        if self.stride > 1:
            x = self.shortcut(x)
        return y + x


class _TorchCDCM(torch.nn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inp, out, 1)
        for i, d in enumerate((5, 7, 9, 11)):
            setattr(self, f"conv2_{i + 1}",
                    torch.nn.Conv2d(out, out, 3, dilation=d, padding=d, bias=False))

    def forward(self, x):
        import torch.nn.functional as F

        x = self.conv1(F.relu(x))
        return sum(getattr(self, f"conv2_{i}")(x) for i in range(1, 5))


class _TorchCSAM(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(ch, 4, 1)
        self.conv2 = torch.nn.Conv2d(4, 1, 3, padding=1, bias=False)

    def forward(self, x):
        import torch.nn.functional as F

        y = self.conv2(self.conv1(F.relu(x)))
        return x * torch.sigmoid(y)


class _TorchMapReduce(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = torch.nn.Conv2d(ch, 1, 1)

    def forward(self, x):
        return self.conv(x)


class _TorchPiDiNet(torch.nn.Module):
    """pidinet() == PiDiNet(60, carv4, dil=24, sa=True) with runtime PDC ops."""

    def __init__(self, inplane=12, dil=8):
        super().__init__()
        from ccedit_tpu.conditioning.annotators.pidinet import CARV4

        pdcs = CARV4
        self.init_block = _TorchPDCConv(pdcs[0], 3, inplane)
        c = inplane
        names = (["block1_1", "block1_2", "block1_3"]
                 + [f"block2_{i}" for i in range(1, 5)]
                 + [f"block3_{i}" for i in range(1, 5)]
                 + [f"block4_{i}" for i in range(1, 5)])
        chans = [(c, c), (c, c), (c, c),
                 (c, 2 * c), (2 * c, 2 * c), (2 * c, 2 * c), (2 * c, 2 * c),
                 (2 * c, 4 * c), (4 * c, 4 * c), (4 * c, 4 * c), (4 * c, 4 * c),
                 (4 * c, 4 * c), (4 * c, 4 * c), (4 * c, 4 * c), (4 * c, 4 * c)]
        strides = [1, 1, 1, 2, 1, 1, 1, 2, 1, 1, 1, 2, 1, 1, 1]
        for name, (i_c, o_c), s, op in zip(names, chans, strides, pdcs[1:]):
            setattr(self, name, _TorchPDCBlock(op, i_c, o_c, stride=s))
        fuse = [c, 2 * c, 4 * c, 4 * c]
        self.dilations = torch.nn.ModuleList([_TorchCDCM(f, dil) for f in fuse])
        self.attentions = torch.nn.ModuleList([_TorchCSAM(dil) for _ in fuse])
        self.conv_reduces = torch.nn.ModuleList([_TorchMapReduce(dil) for _ in fuse])
        self.classifier = torch.nn.Conv2d(4, 1, 1)

    def forward(self, x):
        import torch.nn.functional as F

        H, W = x.shape[2:]
        x = self.init_block(x)
        x1 = self.block1_3(self.block1_2(self.block1_1(x)))
        x2 = self.block2_4(self.block2_3(self.block2_2(self.block2_1(x1))))
        x3 = self.block3_4(self.block3_3(self.block3_2(self.block3_1(x2))))
        x4 = self.block4_4(self.block4_3(self.block4_2(self.block4_1(x3))))
        edges = []
        for i, xi in enumerate((x1, x2, x3, x4)):
            y = self.conv_reduces[i](self.attentions[i](self.dilations[i](xi)))
            edges.append(F.interpolate(y, (H, W), mode="bilinear",
                                       align_corners=False))
        fused = self.classifier(torch.cat(edges, dim=1))
        return [torch.sigmoid(e) for e in edges] + [torch.sigmoid(fused)]


class TestPiDiNetParity:
    def test_forward_matches(self):
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.annotators.pidinet import (
            PiDiNet,
            convert_pidinet,
        )

        tm = _TorchPiDiNet(inplane=12, dil=8).eval()
        randomize_state_dict(tm, seed=50, scale=0.12)

        x = torch.rand(2, 3, 32, 48, generator=torch.Generator().manual_seed(51))
        with torch.no_grad():
            refs = [r.numpy() for r in tm(x)]

        # the oracle's state_dict layout matches the table5_pidinet checkpoint
        # (init_block.weight, blockN_M.conv{1,2}.weight, dilations.N.*,
        # attentions.N.*, conv_reduces.N.conv.*, classifier.*)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = convert_pidinet(sd)
        jm = PiDiNet(inplane=12, dil=8)
        outs = jm.apply({"params": params},
                        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        assert len(outs) == 5
        for ours, theirs in zip(outs, refs):
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 3, 1, 2), theirs,
                atol=5e-4, rtol=1e-3,
            )


# ---------------------------------------------------------------------------
# OpenPose body CNN: torch oracle is the classic CPM bodypose_model (vendored
# by the reference as src.controlnet11.annotator.openpose.model), rebuilt here
# from its public layer table; flax model must match with converted weights.
# ---------------------------------------------------------------------------

class _TorchBodyPose(torch.nn.Module):
    def __init__(self):
        super().__init__()
        from collections import OrderedDict

        def block(defn, no_relu):
            layers = []
            for name, cfg in defn.items():
                if "pool" in name:
                    layers.append((name, torch.nn.MaxPool2d(cfg[0], cfg[1], cfg[2])))
                else:
                    layers.append((name, torch.nn.Conv2d(cfg[0], cfg[1], cfg[2],
                                                         cfg[3], cfg[4])))
                    if name not in no_relu:
                        layers.append((f"relu_{name}", torch.nn.ReLU()))
            return torch.nn.Sequential(OrderedDict(layers))

        no_relu = {"conv5_5_CPM_L1", "conv5_5_CPM_L2"} | {
            f"Mconv7_stage{s}_{b}" for s in range(2, 7) for b in ("L1", "L2")}
        trunk = OrderedDict([
            ("conv1_1", [3, 64, 3, 1, 1]), ("conv1_2", [64, 64, 3, 1, 1]),
            ("pool1_stage1", [2, 2, 0]),
            ("conv2_1", [64, 128, 3, 1, 1]), ("conv2_2", [128, 128, 3, 1, 1]),
            ("pool2_stage1", [2, 2, 0]),
            ("conv3_1", [128, 256, 3, 1, 1]), ("conv3_2", [256, 256, 3, 1, 1]),
            ("conv3_3", [256, 256, 3, 1, 1]), ("conv3_4", [256, 256, 3, 1, 1]),
            ("pool3_stage1", [2, 2, 0]),
            ("conv4_1", [256, 512, 3, 1, 1]), ("conv4_2", [512, 512, 3, 1, 1]),
            ("conv4_3_CPM", [512, 256, 3, 1, 1]),
            ("conv4_4_CPM", [256, 128, 3, 1, 1]),
        ])
        self.model0 = block(trunk, no_relu)

        def stage1(br, out):
            return block(OrderedDict([
                (f"conv5_1_CPM_{br}", [128, 128, 3, 1, 1]),
                (f"conv5_2_CPM_{br}", [128, 128, 3, 1, 1]),
                (f"conv5_3_CPM_{br}", [128, 128, 3, 1, 1]),
                (f"conv5_4_CPM_{br}", [128, 512, 1, 1, 0]),
                (f"conv5_5_CPM_{br}", [512, out, 1, 1, 0]),
            ]), no_relu)

        def stageN(s, br, out):
            return block(OrderedDict(
                [(f"Mconv{i}_stage{s}_{br}", [185 if i == 1 else 128, 128,
                                              7, 1, 3]) for i in range(1, 6)]
                + [(f"Mconv6_stage{s}_{br}", [128, 128, 1, 1, 0]),
                   (f"Mconv7_stage{s}_{br}", [128, out, 1, 1, 0])]), no_relu)

        self.model1_1 = stage1("L1", 38)
        self.model1_2 = stage1("L2", 19)
        for s in range(2, 7):
            setattr(self, f"model{s}_1", stageN(s, "L1", 38))
            setattr(self, f"model{s}_2", stageN(s, "L2", 19))

    def forward(self, x):
        out1 = self.model0(x)
        paf = self.model1_1(out1)
        heat = self.model1_2(out1)
        for s in range(2, 7):
            cat = torch.cat([paf, heat, out1], 1)
            paf = getattr(self, f"model{s}_1")(cat)
            heat = getattr(self, f"model{s}_2")(cat)
        return paf, heat


class TestBodyPoseParity:
    def test_forward_matches(self):
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.annotators.openpose import (
            BodyPoseModel,
            convert_bodypose,
        )

        tm = _TorchBodyPose().eval()
        randomize_state_dict(tm, seed=60, scale=0.02)

        x = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(61))
        with torch.no_grad():
            paf_ref, heat_ref = (r.numpy() for r in tm(x))

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = convert_bodypose(sd)
        jm = BodyPoseModel()
        paf, heat = jm.apply({"params": params},
                             jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(paf).transpose(0, 3, 1, 2),
                                   paf_ref, atol=1e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(heat).transpose(0, 3, 1, 2),
                                   heat_ref, atol=1e-3, rtol=1e-2)


class TestScribblePostParity:
    """The scribble post chain vs the reference's own ``nms``
    (sgm/modules/encoders/modules.py:1631-1647) and the
    ScribblePidiNetEncoder binarize recipe (:1678-1690)."""

    def test_nms_matches(self, sgm):
        from sgm.modules.encoders.modules import nms as ref_nms

        from ccedit_tpu.conditioning.annotators.scribble import nms

        rng = np.random.default_rng(50)
        x = rng.integers(0, 256, (40, 48), dtype=np.uint8)
        np.testing.assert_array_equal(nms(x, 127, 3.0), ref_nms(x, 127, 3.0))

    def test_full_post_chain_matches(self, sgm):
        import cv2

        from sgm.modules.encoders.modules import nms as ref_nms

        from ccedit_tpu.conditioning.annotators.scribble import (
            scribble_postprocess,
        )

        rng = np.random.default_rng(51)
        # synthetic sigmoid edge maps with real-ish structure (soft ridges)
        yy, xx = np.mgrid[0:40, 0:48].astype(np.float32)
        e0 = np.exp(-((yy - 20) ** 2) / 18.0)
        e1 = np.exp(-((xx - 24) ** 2) / 18.0)
        edges01 = np.stack([e0, e1]) + rng.uniform(0, 0.1, (2, 40, 48))
        edges01 = np.clip(edges01, 0.0, 1.0).astype(np.float32)

        # reference chain, modules.py:1686-1697 (executed with its own nms)
        want = []
        for e in np.clip(edges01 * 255.0, 0, 255).astype(np.uint8):
            e = ref_nms(e, 127, 3.0)
            e = cv2.GaussianBlur(e, (0, 0), 3.0)
            e[e > 4] = 255
            e[e < 255] = 0
            want.append(e)
        want = np.stack(want).astype(np.float32) / 255.0

        got = scribble_postprocess(edges01)
        np.testing.assert_array_equal(got, want)
        assert set(np.unique(got)) <= {0.0, 1.0}
