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
