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
