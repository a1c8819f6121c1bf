"""LR schedulers and training sigma samplers, oracle-pinned against the
reference's own classes (sgm/lr_scheduler.py, sgm/modules/diffusionmodules/
sigma_sampling.py) over step sweeps that cross every branch: warmup edge,
cosine/linear decay, cycle boundaries, t-clamp tail, and injected-rand
sigma draws."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import install_reference  # noqa: E402

LEGACY = {
    "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization",
    "params": {},
}


@pytest.fixture(scope="module")
def sgm():
    return install_reference()


class TestLRScheduleParity:
    CYCLES = dict(
        warm_up_steps=[10, 5],
        f_min=[0.1, 0.05],
        f_max=[1.0, 0.8],
        f_start=[1e-3, 1e-2],
        cycle_lengths=[50, 100],
    )

    def test_warmup_cosine(self, sgm):
        from sgm.lr_scheduler import LambdaWarmUpCosineScheduler as Ref

        from ccedit_tpu.train.lr_schedule import LambdaWarmUpCosineScheduler

        kw = dict(warm_up_steps=10, lr_min=0.01, lr_max=1.0, lr_start=1e-4,
                  max_decay_steps=100)
        ref, ours = Ref(**kw), LambdaWarmUpCosineScheduler(**kw)
        for n in range(0, 130):  # includes the t>1 clamp tail past step 100
            np.testing.assert_allclose(ours(n), ref(n), rtol=1e-12,
                                       err_msg=f"step {n}")

    @pytest.mark.parametrize("cls", ["LambdaWarmUpCosineScheduler2",
                                     "LambdaLinearScheduler"])
    def test_cycled_schedulers(self, sgm, cls):
        import sgm.lr_scheduler as ref_mod

        import ccedit_tpu.train.lr_schedule as our_mod

        ref = getattr(ref_mod, cls)(**self.CYCLES)
        ours = getattr(our_mod, cls)(**self.CYCLES)
        # sweep both cycles incl. boundaries (cum_cycles = [0, 50, 150])
        for n in range(0, 150):
            np.testing.assert_allclose(ours(n), ref(n), rtol=1e-12,
                                       err_msg=f"{cls} step {n}")

    def test_tabulated_matches_host_schedule(self):
        import jax.numpy as jnp

        from ccedit_tpu.train.lr_schedule import (
            LambdaLinearScheduler,
            tabulate_schedule,
        )

        sched = LambdaLinearScheduler(**self.CYCLES)
        fn = tabulate_schedule(sched, 149, base_lr=2.0)
        for n in [0, 9, 10, 49, 50, 55, 149]:
            np.testing.assert_allclose(float(fn(jnp.asarray(n))),
                                       2.0 * sched(n), rtol=1e-6)


class TestSigmaSamplerParity:
    def test_edm_lognormal_injected_rand(self, sgm):
        from sgm.modules.diffusionmodules.sigma_sampling import (
            EDMSampling as RefEDM,
        )

        rand = torch.from_numpy(
            np.random.default_rng(5).standard_normal(64).astype(np.float32))
        ref = RefEDM(p_mean=-1.2, p_std=1.2)(64, rand=rand).numpy()

        # ours computes exp(p_mean + p_std * normal(rng)); pin the formula by
        # replaying the same injected normals
        from ccedit_tpu.diffusion.sigma_sampling import EDMSampling

        ours = EDMSampling(p_mean=-1.2, p_std=1.2)
        out = np.exp(ours.p_mean + ours.p_std * rand.numpy())
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    @pytest.mark.parametrize("flip", [True, False])
    @pytest.mark.parametrize("append_zero", [False, True])
    def test_discrete_sigma_table(self, sgm, flip, append_zero):
        """The full sigma table (every index) across flip/do_append_zero —
        idx_to_sigma is then table lookup on both sides."""
        from sgm.modules.diffusionmodules.sigma_sampling import (
            DiscreteSampling as RefDS,
        )

        from ccedit_tpu.diffusion.sigma_sampling import DiscreteSampling

        ref = RefDS(LEGACY, num_idx=1000, do_append_zero=append_zero,
                    flip=flip)
        ours = DiscreteSampling(num_idx=1000, do_append_zero=append_zero,
                                flip=flip)
        np.testing.assert_allclose(np.asarray(ours.sigmas),
                                   ref.sigmas.numpy(), rtol=1e-5, atol=1e-7)
        idx = torch.from_numpy(np.array([0, 1, 500, 999]))
        np.testing.assert_allclose(
            np.asarray(ours.idx_to_sigma(idx.numpy())),
            ref.idx_to_sigma(idx).numpy(), rtol=1e-5, atol=1e-7)


class TestScalingWeightingParity:
    SIGMAS = np.logspace(-3, 2, 41).astype(np.float32)

    @pytest.mark.parametrize("name,kw", [("eps", {}), ("v", {}),
                                         ("edm", {"sigma_data": 0.5}),
                                         ("edm", {"sigma_data": 1.3})])
    def test_scalings(self, sgm, name, kw):
        import sgm.modules.diffusionmodules.denoiser_scaling as ref_mod

        from ccedit_tpu.diffusion import make_scaling

        cls = {"eps": "EpsScaling", "v": "VScaling", "edm": "EDMScaling"}[name]
        ref = getattr(ref_mod, cls)(**kw)
        ours = make_scaling(name, **kw)
        sig = torch.from_numpy(self.SIGMAS)
        for r, o, label in zip(ref(sig), ours(self.SIGMAS),
                               ("c_skip", "c_out", "c_in", "c_noise")):
            np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-6,
                                       err_msg=f"{name} {label}")

    @pytest.mark.parametrize("name,kw", [("unit", {}), ("eps", {}),
                                         ("v", {}),
                                         ("edm", {"sigma_data": 0.5})])
    def test_weightings(self, sgm, name, kw):
        import sgm.modules.diffusionmodules.denoiser_weighting as ref_mod

        from ccedit_tpu.diffusion import make_weighting

        cls = {"unit": "UnitWeighting", "eps": "EpsWeighting",
               "v": "VWeighting", "edm": "EDMWeighting"}[name]
        ref = getattr(ref_mod, cls)(**kw)
        ours = make_weighting(name, **kw)
        np.testing.assert_allclose(np.asarray(ours(self.SIGMAS)),
                                   ref(torch.from_numpy(self.SIGMAS)).numpy(),
                                   rtol=1e-6)


class TestEmaParity:
    """Our EmaState vs the reference's LitEma (sgm/modules/ema.py:5-53) over
    an update trajectory that crosses the warmup ramp's min() crossover
    ((1+n)/(10+n) vs decay=0.6 flips at n=12.5)."""

    @pytest.mark.parametrize("use_num_updates", [True, False])
    def test_shadow_trajectory(self, sgm, use_num_updates):
        import jax
        import jax.numpy as jnp

        from sgm.modules.ema import LitEma

        from ccedit_tpu.train.ema import EmaState

        tm = torch.nn.Linear(4, 3)
        ema = LitEma(tm, decay=0.6, use_num_upates=use_num_updates)
        ours = EmaState.create(
            {"w": jnp.asarray(tm.weight.detach().numpy()),
             "b": jnp.asarray(tm.bias.detach().numpy())},
            decay=0.6, use_num_updates=use_num_updates)

        g = torch.Generator().manual_seed(9)
        for step in range(16):
            with torch.no_grad():
                tm.weight += torch.randn(tm.weight.shape, generator=g) * 0.1
                tm.bias += torch.randn(tm.bias.shape, generator=g) * 0.1
            ema(tm)
            ours = jax.jit(EmaState.update)(
                ours, {"w": jnp.asarray(tm.weight.detach().numpy()),
                       "b": jnp.asarray(tm.bias.detach().numpy())})
            shadows = dict(ema.named_buffers())
            np.testing.assert_allclose(
                np.asarray(ours.shadow["w"]), shadows["weight"].numpy(),
                rtol=1e-5, atol=1e-7, err_msg=f"step {step}")
            np.testing.assert_allclose(
                np.asarray(ours.shadow["b"]), shadows["bias"].numpy(),
                rtol=1e-5, atol=1e-7, err_msg=f"step {step}")
