"""Unit tests for the L4 diffusion-math layer against closed-form values.

The reference ships no tests (SURVEY.md §4); expected values here are computed
independently from the published formulas (DDPM/EDM papers, k-diffusion math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccedit_tpu.diffusion import (
    DiscreteDenoiser,
    DiscreteSampling,
    EDMDiscretization,
    EDMScaling,
    EpsScaling,
    EpsWeighting,
    LegacyDDPMDiscretization,
    UnitWeighting,
    VanillaCFG,
    VScaling,
)
from ccedit_tpu.diffusion.discretization import (
    Img2ImgDiscretizationWrapper,
    generate_roughly_equally_spaced_steps,
    make_ddpm_alphas_cumprod,
)
from ccedit_tpu.diffusion.samplers import get_ancestral_step, linear_multistep_coeff


class TestDiscretization:
    def test_ddpm_alphas_cumprod_endpoints(self):
        abar = make_ddpm_alphas_cumprod(1000, 0.00085, 0.0120)
        # first entry = 1 - beta_0 where beta_0 = 0.00085
        assert abar[0] == pytest.approx(1.0 - 0.00085, rel=1e-12)
        assert abar.shape == (1000,)
        assert np.all(np.diff(abar) < 0)  # strictly decreasing
        # known value for SD schedule: final abar ~ 0.00466
        assert abar[-1] == pytest.approx(0.0046582, rel=1e-3)

    def test_legacy_ddpm_sigmas(self):
        disc = LegacyDDPMDiscretization()
        sigmas = disc(1000, do_append_zero=False)
        abar = make_ddpm_alphas_cumprod()
        # descending; sigma_t = sqrt((1-abar_t)/abar_t) with t descending
        assert sigmas[0] == pytest.approx(np.sqrt((1 - abar[-1]) / abar[-1]))
        assert sigmas[-1] == pytest.approx(np.sqrt((1 - abar[0]) / abar[0]))
        assert np.all(np.diff(sigmas) < 0)

    def test_append_zero_and_flip(self):
        disc = LegacyDDPMDiscretization()
        s = disc(10)
        assert len(s) == 11 and s[-1] == 0.0
        s_flipped = disc(10, flip=True)
        np.testing.assert_allclose(s_flipped, s[::-1])

    def test_subsampling_indices(self):
        idx = generate_roughly_equally_spaced_steps(10, 1000)
        assert len(idx) == 10
        assert idx[-1] == 999
        assert np.all(np.diff(idx) > 0)

    def test_edm_discretization(self):
        disc = EDMDiscretization(sigma_min=0.02, sigma_max=80.0, rho=7.0)
        s = disc(20, do_append_zero=False)
        assert s[0] == pytest.approx(80.0)
        assert s[-1] == pytest.approx(0.02)
        assert np.all(np.diff(s) < 0)

    def test_img2img_wrapper_prunes_low_sigmas(self):
        base = LegacyDDPMDiscretization()
        wrapped = Img2ImgDiscretizationWrapper(discretization=base, strength=0.5)
        full = base(20)
        pruned = wrapped(20)
        assert len(pruned) == max(int(0.5 * len(full)), 1)
        # keeps the *lowest* sigmas (the tail of the descending schedule)
        np.testing.assert_allclose(pruned, full[-len(pruned):])


class TestScalings:
    def test_eps_scaling(self):
        sigma = jnp.array([0.5, 1.0, 2.0])
        c_skip, c_out, c_in, c_noise = EpsScaling()(sigma)
        np.testing.assert_allclose(c_skip, np.ones(3))
        np.testing.assert_allclose(c_out, -np.array([0.5, 1.0, 2.0]))
        np.testing.assert_allclose(c_in, 1 / np.sqrt(np.array([0.5, 1.0, 2.0]) ** 2 + 1), rtol=1e-6)
        np.testing.assert_allclose(c_noise, sigma)

    def test_v_scaling(self):
        sigma = jnp.array([1.0])
        c_skip, c_out, c_in, _ = VScaling()(sigma)
        assert c_skip[0] == pytest.approx(0.5)
        assert c_out[0] == pytest.approx(-1 / np.sqrt(2), rel=1e-6)
        assert c_in[0] == pytest.approx(1 / np.sqrt(2), rel=1e-6)

    def test_edm_scaling_identity_at_low_sigma(self):
        sigma = jnp.array([1e-8])
        c_skip, c_out, c_in, _ = EDMScaling(sigma_data=0.5)(sigma)
        assert c_skip[0] == pytest.approx(1.0, abs=1e-6)
        assert c_out[0] == pytest.approx(0.0, abs=1e-6)

    def test_weightings(self):
        sigma = jnp.array([2.0])
        assert UnitWeighting()(sigma)[0] == 1.0
        assert EpsWeighting()(sigma)[0] == pytest.approx(0.25)


class TestDenoiser:
    def test_discrete_denoiser_quantization_roundtrip(self):
        den = DiscreteDenoiser(scaling="eps", weighting="eps", num_idx=1000)
        # any table value must map to itself
        sig = den.sigmas[jnp.array([0, 499, 999])]
        np.testing.assert_allclose(den.possibly_quantize_sigma(sig), sig, rtol=1e-6)
        # c_noise quantization gives the index
        idx = den.sigma_to_idx(sig)
        np.testing.assert_array_equal(np.asarray(idx), [0, 499, 999])

    def test_denoiser_eps_formula(self):
        """denoised = net(x*c_in, t, cond)*(-sigma) + x for eps scaling."""
        den = DiscreteDenoiser(scaling="eps", weighting="eps", num_idx=1000)
        x = jnp.ones((2, 3, 4, 4, 1))
        sigma = jnp.asarray(den.sigmas[jnp.array([100, 700])])

        def fake_net(xin, c_noise, cond):
            assert c_noise.shape == (2,)
            return jnp.ones_like(xin) * 0.1

        out = den(fake_net, x, sigma, None)
        expected = 0.1 * -sigma[:, None, None, None, None] + x
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestGuidance:
    def test_cfg_combine(self):
        g = VanillaCFG(scale=7.5)
        uc = jnp.zeros((1, 4))
        c = jnp.ones((1, 4))
        out = g.combine(jnp.concatenate([uc, c], axis=0), None)
        np.testing.assert_allclose(out, 7.5 * jnp.ones((1, 4)))

    def test_cfg_prepare_doubles_known_keys(self):
        g = VanillaCFG(scale=5.0)
        cond = {"crossattn": jnp.ones((1, 7, 8)), "other": jnp.zeros((1, 2))}
        uc = {"crossattn": jnp.zeros((1, 7, 8)), "other": jnp.zeros((1, 2))}
        cat = g.prepare_cond(cond, uc)
        assert cat["crossattn"].shape == (2, 7, 8)
        assert cat["other"].shape == (1, 2)

    def test_cfg_expand(self):
        g = VanillaCFG()
        x = jnp.arange(8.0).reshape(2, 4)
        s = jnp.ones((2,))
        x2, s2 = g.expand(x, s)
        assert x2.shape == (4, 4) and s2.shape == (4,)
        np.testing.assert_allclose(x2[:2], x)


class TestSamplerMath:
    def test_ancestral_step_eta1(self):
        down, up = get_ancestral_step(np.array([2.0]), np.array([1.0]), eta=1.0)
        expected_up = min(1.0, np.sqrt(1.0 * (4.0 - 1.0) / 4.0))
        assert up[0] == pytest.approx(expected_up)
        assert down[0] == pytest.approx(np.sqrt(1.0 - expected_up**2))

    def test_ancestral_step_eta0(self):
        down, up = get_ancestral_step(np.array([2.0]), np.array([1.0]), eta=0.0)
        assert down[0] == 1.0 and up[0] == 0.0

    def test_lms_coeff_order1_is_step_size(self):
        # order-1 AB coefficient is just the integral of 1 = t_{i+1} - t_i
        t = np.array([5.0, 4.0, 3.0, 2.0])
        c = linear_multistep_coeff(1, t, 1, 0)
        assert c == pytest.approx(t[2] - t[1])

    def test_lms_coeff_order2_closed_form(self):
        # order-2: integral of (tau - t_{i-1})/(t_i - t_{i-1}) over [t_i, t_{i+1}]
        t = np.array([3.0, 2.0, 1.0])
        i = 1
        a, b = t[i], t[i + 1]
        expected_j0 = ((b - t[0]) ** 2 - (a - t[0]) ** 2) / (2 * (t[1] - t[0]))
        assert linear_multistep_coeff(2, t, i, 0) == pytest.approx(expected_j0, rel=1e-9)


class TestSigmaSampling:
    def test_discrete_sampling_values_in_table(self, rng):
        ss = DiscreteSampling(num_idx=1000)
        sig = ss(rng, 512)
        table = np.asarray(ss.sigmas)
        assert np.all(np.isin(np.asarray(sig), table))

    def test_discrete_table_matches_denoiser(self):
        ss = DiscreteSampling(num_idx=1000)
        den = DiscreteDenoiser(scaling="eps", num_idx=1000)
        np.testing.assert_allclose(np.asarray(ss.sigmas), np.asarray(den.sigmas))
