"""k-diffusion-family samplers as single compiled ``lax.scan`` programs.

Behavioural parity targets (studied, not copied):
  * base loop + prepare     — sgm/modules/diffusionmodules/sampling.py:24-86
  * Euler/Heun EDM (churn)  — sampling.py:88-165,334-356
  * EulerAncestral          — sampling.py:360-367
  * DPM++ 2S Ancestral      — sampling.py:370-407  (the CCEdit default)
  * DPM++ 2M                — sampling.py:410-485
  * Linear multistep (LMS)  — sampling.py:296-331
  * inpainting / blending / sdedit modes — sampling.py:138-165,207-293
  * ancestral step math     — sampling_utils.py:27-48

TPU-first redesign
------------------
The reference runs an eager Python loop with a CUDA dispatch per op.  Here the
entire sigma schedule and every per-step scalar (sigma_down/up, DPM++ mults,
LMS coefficients) are precomputed host-side in float64 numpy, stacked into
per-step constant arrays, and the loop becomes one ``jax.lax.scan`` — a single
XLA program per (shape, num_steps).  Steps whose math degenerates at
``next_sigma == 0`` (Heun's correction, DPM++ 2S's midpoint) are peeled into an
epilogue so no network evaluation is wasted — matching the reference's
"save a network evaluation" branches exactly, but resolved at trace time.

``denoise_fn(x, sigma_vec) -> denoised`` is any callable that already includes
classifier-free guidance (see engine); samplers never inspect conditioning.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import append_dims

Array = jnp.ndarray
DenoiseFn = Callable[[Array, Array], Array]


# --------------------------------------------------------------------------
# host-side schedule math (float64 numpy)
# --------------------------------------------------------------------------

def get_ancestral_step(
    sigma_from: np.ndarray, sigma_to: np.ndarray, eta: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """(sigma_down, sigma_up) split — sampling_utils.py:27-36."""
    if not eta:
        return sigma_to, np.zeros_like(sigma_to)
    sigma_up = np.minimum(
        sigma_to,
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


def linear_multistep_coeff(order: int, t: np.ndarray, i: int, j: int) -> float:
    """Adams-Bashforth coefficient: integral over [t_i, t_{i+1}] of the
    Lagrange basis polynomial prod_{k!=j} (tau - t_{i-k}) / (t_{i-j} - t_{i-k}).

    The reference evaluates this with scipy.integrate.quad
    (sampling_utils.py:12-24); the integrand is an exact polynomial, so we
    integrate it exactly with numpy.polynomial instead — faster and exact.
    """
    if order - 1 > i:
        raise ValueError(f"order {order} too high for step {i}")
    poly = np.polynomial.Polynomial([1.0])
    for k in range(order):
        if j == k:
            continue
        poly = poly * np.polynomial.Polynomial(
            [-t[i - k] / (t[i - j] - t[i - k]), 1.0 / (t[i - j] - t[i - k])]
        )
    integ = poly.integ()
    return float(integ(t[i + 1]) - integ(t[i]))


def _to_neg_log_sigma(s):
    return -np.log(s)


def _to_sigma(nls):
    return np.exp(-nls)


# --------------------------------------------------------------------------
# device-side helpers
# --------------------------------------------------------------------------

def _to_d(x: Array, sigma: Array, denoised: Array) -> Array:
    return (x - denoised) / append_dims(sigma, x.ndim)


def _bcast(v, x: Array) -> Array:
    """Per-step scalar -> broadcastable over x."""
    return jnp.asarray(v, dtype=x.dtype)


# --------------------------------------------------------------------------
# pre-step hooks: inpainting / blending (sampling.py:207-268)
# --------------------------------------------------------------------------

def _make_pre_fn(mode: Optional[str], x0: Optional[Array], mask: Optional[Array]):
    """Returns fn(x, sigma_scalar, rng, noise=None) applied before each
    sampler step; ``noise`` (parity harness) replaces the jax.random draw.

    * ``inpaint``: x = x*mask + ((x0 + n*sigma)/sqrt(1+sigma^2))*(1-mask)
    * ``blend``:   first half of the clip is re-seeded from the noised x0's
                   second half each step (frame-interpolation seeding,
                   sampling.py:235-268; time axis = axis 1 in our BTHWC layout)
    """
    if mode is None:
        return lambda x, sigma, rng, noise=None: x
    if mode == "inpaint":
        def fn(x, sigma, rng, noise=None):
            if noise is None:
                noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
            img_orig = (x0 + noise * sigma) / jnp.sqrt(1.0 + sigma**2)
            return x * mask + img_orig * (1.0 - mask)
        return fn
    if mode == "blend":
        def fn(x, sigma, rng, noise=None):
            if noise is None:
                noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
            img_orig = (x0 + noise * sigma) / jnp.sqrt(1.0 + sigma**2)
            t = x.shape[1]
            return x.at[:, : t // 2].set(img_orig[:, t // 2 + 1 :])
        return fn
    raise ValueError(f"unknown pre-step mode {mode!r}")


# --------------------------------------------------------------------------
# sampler classes
# --------------------------------------------------------------------------

@dataclasses.dataclass
class BaseSampler:
    discretization: object = None  # ccedit_tpu.diffusion.Discretization
    num_steps: Optional[int] = None
    s_noise: float = 1.0

    # ---- schedule -------------------------------------------------------
    def get_sigmas(self, num_steps: Optional[int] = None) -> np.ndarray:
        n = num_steps if num_steps is not None else self.num_steps
        if n is None:
            raise ValueError("num_steps not set")
        return np.asarray(self.discretization(n, do_append_zero=True), dtype=np.float64)

    def prepare_x(self, x: Array, sigmas: np.ndarray) -> Array:
        # x *= sqrt(1 + sigma_0^2)  — sampling.py:50
        return x * jnp.asarray(np.sqrt(1.0 + sigmas[0] ** 2), dtype=x.dtype)

    # ---- public entry points -------------------------------------------
    def __call__(
        self,
        denoise_fn: DenoiseFn,
        x: Array,
        rng: jax.Array,
        num_steps: Optional[int] = None,
        noise_override: Optional[Array] = None,
    ) -> Array:
        """``noise_override``: optional externally supplied per-step noise of
        shape ``(num_steps, *x.shape)`` consumed instead of ``jax.random``
        draws inside the loop (ancestral sigma_up noise).  This is the parity
        harness committed to in SURVEY §7.1: inject the reference's torch
        noise stream here (plus the init noise via the caller) to compare the
        full sampling chain bit-for-bit.  Samplers that draw no loop noise
        reject a non-None override."""
        sigmas = self.get_sigmas(num_steps)
        x = self.prepare_x(x, sigmas)
        return self._run(denoise_fn, x, rng, sigmas, start_step=0, pre_fn=None,
                         noise_override=noise_override)

    def sdedit(
        self,
        denoise_steps: int,
        denoise_fn: DenoiseFn,
        x: Array,
        rng: jax.Array,
        num_steps: Optional[int] = None,
        noise_override: Optional[Array] = None,
    ) -> Array:
        """Skip the first (num_steps - denoise_steps) iterations
        (sampling.py:270-293).  x must already be the noised input.
        ``noise_override`` rows (if given) cover only the EXECUTED steps —
        the reference's noise_sampler is likewise only consulted inside the
        iterations that run."""
        sigmas = self.get_sigmas(num_steps)
        x = self.prepare_x(x, sigmas)
        start = len(sigmas) - 1 - denoise_steps
        return self._run(denoise_fn, x, rng, sigmas, start_step=start,
                         pre_fn=None, noise_override=noise_override)

    def sample_inpainting(
        self, denoise_fn, x, rng, x0, mask, num_steps: Optional[int] = None,
        noise_override=None,
    ) -> Array:
        sigmas = self.get_sigmas(num_steps)
        x = self.prepare_x(x, sigmas)
        pre = _make_pre_fn("inpaint", x0, mask)
        return self._run(denoise_fn, x, rng, sigmas, start_step=0, pre_fn=pre,
                         noise_override=noise_override)

    def sampling_blending(
        self, denoise_fn, x, rng, x0, num_steps: Optional[int] = None,
        noise_override=None,
    ) -> Array:
        sigmas = self.get_sigmas(num_steps)
        x = self.prepare_x(x, sigmas)
        pre = _make_pre_fn("blend", x0, None)
        return self._run(denoise_fn, x, rng, sigmas, start_step=0, pre_fn=pre,
                         noise_override=noise_override)

    # ---- to implement ---------------------------------------------------
    def _run(self, denoise_fn, x, rng, sigmas, start_step, pre_fn,
             noise_override=None) -> Array:
        raise NotImplementedError

    @staticmethod
    def _reject_noise_override(noise_override):
        if noise_override is not None:
            raise NotImplementedError(
                "noise_override is only supported by samplers that draw loop "
                "noise (the ancestral family, and the EDM family at s_churn>0)")

    def _check_noise_override(self, noise_override, n_steps, x):
        noise = jnp.asarray(noise_override, dtype=x.dtype)
        if noise.shape != (n_steps,) + tuple(x.shape):
            raise ValueError(
                f"noise_override shape {noise.shape} != "
                f"{(n_steps,) + tuple(x.shape)} (one row per sampler step)")
        return noise


def _scan_steps(body, x, rng, step_consts, pre_fn, sigma_for_pre):
    """Run ``body(x, consts, rng)`` over stacked per-step constants via scan.

    ``sigma_for_pre``: per-step sigma array aligned with step_consts, used by
    the optional pre-step hook.
    """
    n = len(sigma_for_pre)
    if n == 0:
        return x, rng

    consts = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=jnp.float32), step_consts)
    sig_pre = jnp.asarray(sigma_for_pre, dtype=jnp.float32)

    def scan_body(carry, per_step):
        x, rng = carry
        consts_i, sig_i = per_step
        rng, k_pre, k_step = jax.random.split(rng, 3)
        if pre_fn is not None:
            x = pre_fn(x, sig_i, k_pre)
        x = body(x, consts_i, k_step)
        return (x, rng), None

    (x, rng), _ = jax.lax.scan(scan_body, (x, rng), (consts, sig_pre))
    return x, rng


# ---------------------------------------------------------------------------
# EDM family (Euler / Heun with churn)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EulerEDMSampler(BaseSampler):
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")

    _heun: bool = dataclasses.field(default=False, init=False)

    def _gammas(self, sigmas: np.ndarray) -> np.ndarray:
        num_sigmas = len(sigmas)
        gammas = np.zeros(num_sigmas - 1)
        for i in range(num_sigmas - 1):
            if self.s_tmin <= sigmas[i] <= self.s_tmax:
                gammas[i] = min(self.s_churn / (num_sigmas - 1), 2**0.5 - 1)
        return gammas

    def _run(self, denoise_fn, x, rng, sigmas, start_step, pre_fn,
             noise_override=None):
        gammas = self._gammas(sigmas)
        idx = np.arange(start_step, len(sigmas) - 1)
        sig, nxt, gam = sigmas[idx], sigmas[idx + 1], gammas[idx]
        sig_hat = sig * (gam + 1.0)
        churn_std = np.sqrt(np.maximum(sig_hat**2 - sig**2, 0.0)) * self.s_noise

        churn_rows = pre_rows = None
        if noise_override is not None:
            # Parity-harness path (mirrors the ancestral samplers).  The
            # reference draws churn eps ONLY when gamma > 0 (sampling.py:
            # 101-104), so we require churn active at every executed step —
            # one injected row per step then aligns 1:1 with the torch
            # queue.  Dict form {"loop": churn rows, "pre": img_orig rows}
            # additionally injects the inpaint/blend pre-step draw, which
            # the reference makes BEFORE sampler_step (sampling.py:138-165).
            if not np.all(gam > 0.0):
                raise NotImplementedError(
                    "noise_override on the EDM samplers requires gamma > 0 at "
                    "every executed step (s_churn > 0 with s_tmin/s_tmax "
                    "covering the schedule) so the injected rows align with "
                    "the reference's per-step draws")
            if isinstance(noise_override, dict):
                assert pre_fn is not None, "dict noise_override needs a pre-step hook"
                pre_rows = self._check_noise_override(
                    noise_override["pre"], len(sig), x)
                churn_rows = self._check_noise_override(
                    noise_override["loop"], len(sig), x)
            else:
                assert pre_fn is None, "array noise_override + pre-step hooks unsupported"
                churn_rows = self._check_noise_override(noise_override, len(sig), x)

        heun = self._heun
        # Heun's correction is skipped when next_sigma == 0 (sampling.py:344-356)
        use_corr = nxt > 1e-14 if heun else np.zeros_like(nxt, dtype=bool)

        if not heun:
            if churn_rows is not None:
                consts = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(a, dtype=jnp.float32),
                    (sig_hat, nxt, churn_std, sig))

                def inj_body(x, per):
                    if pre_rows is not None:
                        (sigma_hat, next_sigma, churn, sig_i), eps_i, pre_i = per
                        x = pre_fn(x, sig_i, None, noise=pre_i)
                    else:
                        (sigma_hat, next_sigma, churn, sig_i), eps_i = per
                    x = x + eps_i * churn
                    denoised = denoise_fn(x, sigma_hat)
                    d = _to_d(x, sigma_hat, denoised)
                    return x + (next_sigma - sigma_hat) * d, None

                xs = ((consts, churn_rows, pre_rows) if pre_rows is not None
                      else (consts, churn_rows))
                x, _ = jax.lax.scan(inj_body, x, xs)
                return x

            def body(x, consts, rng_i):
                sigma_hat, next_sigma, churn = consts
                eps = jax.random.normal(rng_i, x.shape, dtype=x.dtype)
                x = x + eps * churn
                denoised = denoise_fn(x, sigma_hat)
                d = _to_d(x, sigma_hat, denoised)
                return x + (next_sigma - sigma_hat) * d

            x, rng = _scan_steps(body, x, rng, (sig_hat, nxt, churn_std), pre_fn, sig)
            return x

        # Heun: ONE scan over half-steps with a single denoise call site
        # (see DPMPP2SAncestralSampler compile-size note).
        # row: (q, phase0, phase1, sigma_hat, next_sigma, churn, do_pre, sig_for_pre)
        rows = []
        for i in range(len(idx)):
            base = dict(sigma_hat=sig_hat[i], next_sigma=nxt[i], churn=churn_std[i],
                        sig_pre=sig[i], step=i)
            if use_corr[i]:
                rows.append(dict(base, q=sig_hat[i], phase=0, do_pre=1.0))
                rows.append(dict(base, q=nxt[i], phase=1, do_pre=0.0))
            else:
                rows.append(dict(base, q=sig_hat[i], phase=2, do_pre=1.0))

        def col(key):
            return np.asarray([r[key] for r in rows], dtype=np.float64)

        phases = np.asarray([r["phase"] for r in rows])
        consts = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype=jnp.float32),
            (
                col("q"),
                (phases == 0).astype(np.float32),
                (phases == 1).astype(np.float32),
                (phases == 2).astype(np.float32),
                col("sigma_hat"), col("next_sigma"), col("churn"),
                col("do_pre"), col("sig_pre"),
            ),
        )

        inject = churn_rows is not None
        if inject:
            # Expand per-STEP injected rows to per-half-step rows; phase-1
            # rows carry their step's row but consume nothing (churn is
            # masked by p0+p2, pre by do_pre) — consumption stays one draw
            # per step, matching the reference.
            step_of_row = np.asarray([r["step"] for r in rows])
            row_eps = churn_rows[step_of_row]
            row_pre = pre_rows[step_of_row] if pre_rows is not None else None

        def scan_body(carry, per):
            x_base, x_query, d_saved, rng = carry
            if inject:
                if row_pre is not None:
                    scalars, eps, pre_i = per
                else:
                    scalars, eps = per
                    pre_i = None
                k_pre = k_noise = None
            else:
                scalars = per
                rng, k_pre, k_noise = jax.random.split(rng, 3)
                eps = pre_i = None
            (q, p0, p1, p2, sigma_hat, next_sigma, churn, do_pre, sig_pre) = scalars
            if pre_fn is not None:
                x_pre = pre_fn(x_query, sig_pre, k_pre, noise=pre_i)
                x_query = jnp.where(do_pre > 0, x_pre, x_query)
                x_base = jnp.where(do_pre > 0, x_pre, x_base)
            # churn noise only on fresh-step rows (phase 0/2)
            if eps is None:
                eps = jax.random.normal(k_noise, x_query.shape, dtype=x_query.dtype)
            churn_add = eps * churn * (p0 + p2)
            x_query = x_query + churn_add
            x_base = x_base + churn_add

            denoised = denoise_fn(x_query, q)  # single call site

            dt = next_sigma - sigma_hat
            d = (x_query - denoised) / q
            euler = x_base + dt * d  # valid on phase 0/2 (x_query==x_base)
            corrected = x_base + dt * 0.5 * (d_saved + d)  # phase 1

            new_base = p0 * x_base + (p1 + p2) * jnp.where(p1 > 0, corrected, euler)
            new_query = p0 * euler + (p1 + p2) * jnp.where(p1 > 0, corrected, euler)
            new_d = p0 * d + (p1 + p2) * d_saved  # keep d from the base eval
            return (new_base, new_query, new_d, rng), None

        if inject:
            xs = ((consts, row_eps, row_pre) if row_pre is not None
                  else (consts, row_eps))
        else:
            xs = consts
        (x_base, x_query, _, rng), _ = jax.lax.scan(
            scan_body, (x, x, jnp.zeros_like(x), rng), xs
        )
        return x_query


@dataclasses.dataclass
class HeunEDMSampler(EulerEDMSampler):
    def __post_init__(self):
        self._heun = True


# ---------------------------------------------------------------------------
# Ancestral family
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AncestralSampler(BaseSampler):
    eta: float = 1.0

    def _ancestral_tables(self, sigmas: np.ndarray, start_step: int):
        idx = np.arange(start_step, len(sigmas) - 1)
        sig, nxt = sigmas[idx], sigmas[idx + 1]
        down, up = get_ancestral_step(sig, nxt, eta=self.eta)
        return sig, nxt, down, up

    def _ancestral_noise(self, x, rng_i, next_sigma, sigma_up, noise=None):
        if noise is None:
            noise = jax.random.normal(rng_i, x.shape, dtype=x.dtype)
        return jnp.where(next_sigma > 0.0, x + noise * (self.s_noise * sigma_up), x)

@dataclasses.dataclass
class EulerAncestralSampler(AncestralSampler):
    def _run(self, denoise_fn, x, rng, sigmas, start_step, pre_fn,
             noise_override=None):
        sig, nxt, down, up = self._ancestral_tables(sigmas, start_step)

        if noise_override is not None:
            # Parity-harness path.  noise_override is either an (n, *shape)
            # array (ancestral loop noise; requires pre_fn None) or a dict
            # {"loop": rows, "pre": rows} that ALSO injects the pre-step
            # hook's noise (inpaint/blend img_orig draw) — the reference's
            # sample_inpainting draws torch.randn_like for the blend and
            # noise_sampler for the ancestral step, in that order
            # (sampling.py:207-232).
            if isinstance(noise_override, dict):
                assert pre_fn is not None, "dict noise_override needs a pre-step hook"
                pre_rows = self._check_noise_override(
                    noise_override["pre"], len(sig), x)
                loop_rows = self._check_noise_override(
                    noise_override["loop"], len(sig), x)
            else:
                assert pre_fn is None, "array noise_override + pre-step hooks unsupported"
                pre_rows = None
                loop_rows = self._check_noise_override(noise_override, len(sig), x)
            consts = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype=jnp.float32), (sig, nxt, down, up))

            def inj_body(x, per):
                if pre_rows is not None:
                    (sigma, next_sigma, sigma_down, sigma_up), noise_i, pre_i = per
                    x = pre_fn(x, sigma, None, noise=pre_i)
                else:
                    (sigma, next_sigma, sigma_down, sigma_up), noise_i = per
                denoised = denoise_fn(x, sigma)
                d = _to_d(x, sigma, denoised)
                x = x + (sigma_down - sigma) * d
                return self._ancestral_noise(x, None, next_sigma, sigma_up,
                                             noise=noise_i), None

            xs = ((consts, loop_rows, pre_rows) if pre_rows is not None
                  else (consts, loop_rows))
            x, _ = jax.lax.scan(inj_body, x, xs)
            return x

        def body(x, consts, rng_i):
            sigma, next_sigma, sigma_down, sigma_up = consts
            denoised = denoise_fn(x, sigma)
            d = _to_d(x, sigma, denoised)
            x = x + (sigma_down - sigma) * d
            return self._ancestral_noise(x, rng_i, next_sigma, sigma_up)

        x, rng = _scan_steps(body, x, rng, (sig, nxt, down, up), pre_fn, sig)
        return x


@dataclasses.dataclass
class DPMPP2SAncestralSampler(AncestralSampler):
    """DPM-Solver++(2S) with ancestral noise — CCEdit's shipped sampler.

    Per-step mults (sampling.py:371-383) are precomputed host-side:
      t = -log(sigma), t_down = -log(sigma_down), h = t_down - t, s = t + h/2
      mult1 = sigma(s)/sigma(t); mult2 = expm1(-h/2)
      mult3 = sigma(t_down)/sigma(t); mult4 = expm1(-h)
    The final step (sigma_down == 0) degenerates to the plain ancestral Euler
    step, saving its midpoint network eval (sampling.py:390-392).

    Compile-size note: the whole run is ONE lax.scan over *half-steps* with a
    single ``denoise_fn`` call site — each iteration does one network eval
    and phase-selected cheap math (phase 0 = first half, 1 = midpoint half,
    2 = degenerate euler; all-zero phases = identity padding row).  A naive
    body would inline the multi-GB UNet HLO 2-3x, which overwhelmed the TPU
    remote-compile service at SD scale.

    ``segment_size`` (>0): run the scan in chunks of ``segment_size`` rows
    plus a ragged tail, each its own device execution (two compiles serve
    all chunks).  Needed on infrastructures with per-execution RPC timeouts — a
    full 30-step SD-scale clip is a ~3 min single call otherwise.  Only
    meaningful when the sampler is invoked eagerly (not under an outer jit).

    Execution-path note (round-3 forensics, docs/PERF_r3.md): repeat calls
    MUST NOT re-trace — tracing the SD-scale network costs tens of host
    seconds and made round-1/2 headlines ~45% slower and transport-noisy.
    The jitted runner and the device-resident const rows are cached on the
    instance, keyed by call structure; everything dynamic (params, cond,
    state, rng) enters as jit arguments.
    """

    segment_size: int = 0
    _exec_cache: dict = dataclasses.field(
        default_factory=dict, init=False, repr=False)

    def _run(self, denoise_fn, x, rng, sigmas, start_step, pre_fn,
             noise_override=None):
        sig, nxt, down, up = self._ancestral_tables(sigmas, start_step)
        n = len(sig)
        if n == 0:
            return x

        use_mid = down >= 1e-14
        with np.errstate(divide="ignore", invalid="ignore"):
            t = _to_neg_log_sigma(sig)
            t_next = _to_neg_log_sigma(np.where(down > 0, down, 1.0))
            h = t_next - t
            s = t + 0.5 * h
            sig_mid = _to_sigma(s)
            mult1 = sig_mid / sig
            mult2 = np.expm1(-0.5 * h)
            mult3 = np.where(down > 0, down, 0.0) / sig
            mult4 = np.expm1(-h)
        for arr in (sig_mid, mult1, mult2, mult3, mult4):
            np.nan_to_num(arr, copy=False)

        # ---- build per-half-step constant rows ------------------------
        # row: (sigma_query, phase0, phase1, phase2, sigma, next_sigma,
        #       sigma_down, sigma_up, m1, m2, m3, m4, do_pre)
        rows = []
        for i in range(n):
            base = dict(sigma=sig[i], next_sigma=nxt[i], sigma_down=down[i],
                        sigma_up=up[i], m1=mult1[i], m2=mult2[i],
                        m3=mult3[i], m4=mult4[i])
            if use_mid[i]:
                rows.append(dict(base, q=sig[i], phase=0, do_pre=1.0))
                rows.append(dict(base, q=sig_mid[i], phase=1, do_pre=0.0))
            else:
                rows.append(dict(base, q=sig[i], phase=2, do_pre=1.0))

        # Segment boundaries: a ragged final chunk instead of identity
        # padding rows — a padding row still runs the full network eval
        # (~0.95 s at SD scale) with its result multiplied by zero.  The
        # ragged tail costs one extra trace+compile of the scan program
        # (persistently cached), and each distinct chunk length is one jit
        # specialization, so all tail lengths share the two programs.
        seg = self.segment_size

        def col(key):
            return np.asarray([r[key] for r in rows], dtype=np.float64)

        phases = np.asarray([r["phase"] for r in rows])
        consts_np = jax.tree_util.tree_map(
            lambda a: np.asarray(a, dtype=np.float32),
            (
                col("q"),
                (phases == 0).astype(np.float32),
                (phases == 1).astype(np.float32),
                (phases == 2).astype(np.float32),
                col("sigma"), col("next_sigma"), col("sigma_down"),
                col("sigma_up"), col("m1"), col("m2"), col("m3"), col("m4"),
                col("do_pre"),
            ),
        )

        # ``denoise_fn`` may be a (fn, ctx) pair with fn(ctx, x, sigma): ctx
        # (params/conditioning) must flow through jit ARGUMENTS — a closure
        # would bake the weights into the HLO.
        if isinstance(denoise_fn, tuple):
            call_fn, call_ctx = denoise_fn
        else:
            call_fn, call_ctx = (lambda _ctx, xx, s: denoise_fn(xx, s)), None

        if noise_override is not None:
            # Parity-harness path: external per-step noise, no exec cache /
            # segmenting (test-scale geometry; re-tracing is acceptable).
            # Each step's noise lands on its step-completing row (phase 1 or
            # 2); midpoint-query rows (phase 0) draw no ancestral noise —
            # matching the reference's one noise_sampler call per
            # sampler_step (sampling.py:403-406).
            assert pre_fn is None, "noise injection + pre-step hooks unsupported"
            noise_steps = self._check_noise_override(noise_override, n, x)
            row_of_step = []
            r = 0
            for i in range(n):
                if use_mid[i]:
                    r += 1  # skip the phase-0 midpoint-query row
                row_of_step.append(r)
                r += 1
            noise_rows = jnp.zeros((len(rows),) + tuple(x.shape), dtype=x.dtype)
            noise_rows = noise_rows.at[jnp.asarray(row_of_step)].set(noise_steps)

            def inj_body(carry, per):
                x_base, x_query = carry
                ((q, p0, p1, p2, sigma, next_sigma, sigma_down, sigma_up,
                  m1, m2, m3, m4, do_pre), noise_i) = per
                denoised = call_fn(call_ctx, x_query, q)
                x_q_p0 = m1 * x_base - m2 * denoised
                x_p1 = m3 * x_base - m4 * denoised
                x_p1 = self._ancestral_noise(x_p1, None, next_sigma, sigma_up,
                                             noise=noise_i)
                d = (x_query - denoised) / sigma
                x_p2 = x_query + (sigma_down - sigma) * d
                x_p2 = self._ancestral_noise(x_p2, None, next_sigma, sigma_up,
                                             noise=noise_i)
                p_id = 1.0 - p0 - p1 - p2
                new_base = p0 * x_base + p1 * x_p1 + p2 * x_p2 + p_id * x_base
                new_query = p0 * x_q_p0 + p1 * x_p1 + p2 * x_p2 + p_id * x_query
                return (new_base, new_query), None

            consts_dev = jax.tree_util.tree_map(jnp.asarray, consts_np)
            (x_base, x_query), _ = jax.lax.scan(
                inj_body, (x, x), (consts_dev, noise_rows))
            return x_query

        def make_body(call):
            def scan_body(carry, per):
                x_base, x_query, rng = carry
                (q, p0, p1, p2, sigma, next_sigma, sigma_down, sigma_up,
                 m1, m2, m3, m4, do_pre) = per
                rng, k_pre, k_step = jax.random.split(rng, 3)
                if pre_fn is not None:
                    x_pre = pre_fn(x_query, sigma, k_pre)
                    x_query = jnp.where(do_pre > 0, x_pre, x_query)
                    x_base = jnp.where(do_pre > 0, x_pre, x_base)

                denoised = call(x_query, q)  # the single network call site

                # phase 0: midpoint query; x_base unchanged
                x_q_p0 = m1 * x_base - m2 * denoised
                # phase 1: full DPM++2S update from x_base + ancestral noise
                x_p1 = m3 * x_base - m4 * denoised
                x_p1 = self._ancestral_noise(x_p1, k_step, next_sigma, sigma_up)
                # phase 2: ancestral euler (degenerate final step)
                d = (x_query - denoised) / sigma
                x_p2 = x_query + (sigma_down - sigma) * d
                x_p2 = self._ancestral_noise(x_p2, k_step, next_sigma, sigma_up)

                p_id = 1.0 - p0 - p1 - p2  # padding row: identity
                new_base = p0 * x_base + p1 * x_p1 + p2 * x_p2 + p_id * x_base
                new_query = p0 * x_q_p0 + p1 * x_p1 + p2 * x_p2 + p_id * x_query
                return (new_base, new_query, rng), None

            return scan_body

        # one cache entry per call structure: re-tracing the SD-scale network
        # on every sample costs tens of host seconds (round-3 forensics)
        cache_key = (
            id(call_fn), None if pre_fn is None else id(pre_fn),
            tuple(x.shape), str(x.dtype), int(seg or 0),
            hash(b"".join(a.tobytes() for a in consts_np)),
        )
        entry = self._exec_cache.get(cache_key)
        if entry is None:
            if seg and seg > 0:
                starts = range(0, len(rows), seg)
                consts_dev = [
                    jax.tree_util.tree_map(
                        lambda a: jnp.asarray(a[s: s + seg]), consts_np)
                    for s in starts
                ]
            else:
                consts_dev = jax.tree_util.tree_map(jnp.asarray, consts_np)

            @jax.jit
            def run_scan(ctx, carry, chunk):
                body = make_body(lambda xx, q: call_fn(ctx, xx, q))
                return jax.lax.scan(body, carry, chunk)

            # pin call_fn/pre_fn so their id()s in the key can't be recycled
            entry = (consts_dev, run_scan, call_fn, pre_fn)
            self._exec_cache[cache_key] = entry
        consts_dev, run_scan = entry[0], entry[1]

        carry = (x, x, rng)
        if seg and seg > 0:
            for chunk in consts_dev:
                carry, _ = run_scan(call_ctx, carry, chunk)
        else:
            carry, _ = run_scan(call_ctx, carry, consts_dev)
        x_base, x_query, rng = carry
        return x_query


# ---------------------------------------------------------------------------
# DPM++ 2M (multistep, 1 eval/step)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DPMPP2MSampler(BaseSampler):
    def _run(self, denoise_fn, x, rng, sigmas, start_step, pre_fn,
             noise_override=None):
        # DPM++ 2M draws no loop noise at all (sampling.py:410-485) — the
        # init noise is the only stochastic input, injected by the caller.
        self._reject_noise_override(noise_override)
        idx = np.arange(start_step, len(sigmas) - 1)
        sig, nxt = sigmas[idx], sigmas[idx + 1]
        prev = np.concatenate([[np.nan], sig[:-1]])

        with np.errstate(divide="ignore", invalid="ignore"):
            t = _to_neg_log_sigma(sig)
            t_next = _to_neg_log_sigma(np.where(nxt > 0, nxt, 1.0))
            h = t_next - t
            h_last = t - _to_neg_log_sigma(prev)
            r = h_last / h
            mult1 = np.where(nxt > 0, nxt, 0.0) / sig
            mult2 = np.expm1(-h)
            mult3 = 1.0 + 1.0 / (2.0 * r)
            mult4 = 1.0 / (2.0 * r)
        # advanced (2nd-order) update applies when not first step and nxt>0
        use_adv = np.ones_like(sig, dtype=bool)
        use_adv[0] = False
        use_adv &= nxt > 1e-14
        mult3 = np.nan_to_num(mult3)
        mult4 = np.nan_to_num(mult4)
        # mult1/mult2 with nxt==0: mult1=0, mult2=expm1(-inf)=-1
        mult1 = np.nan_to_num(mult1)
        mult2 = np.where(nxt > 0, mult2, -1.0)

        consts = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype=jnp.float32),
            (sig, nxt, mult1, mult2, mult3, mult4, use_adv.astype(np.float32)),
        )

        def scan_body(carry, per_step):
            x, old_denoised, rng = carry
            (sigma, next_sigma, m1, m2, m3, m4, adv), sig_i = per_step
            rng, k_pre = jax.random.split(rng)
            if pre_fn is not None:
                x = pre_fn(x, sig_i, k_pre)
            denoised = denoise_fn(x, sigma)
            x_standard = m1 * x - m2 * denoised
            denoised_d = m3 * denoised - m4 * old_denoised
            x_advanced = m1 * x - m2 * denoised_d
            x = jnp.where(adv > 0, x_advanced, x_standard)
            return (x, denoised, rng), None

        sig_dev = jnp.asarray(sig, dtype=jnp.float32)
        (x, _, rng), _ = jax.lax.scan(
            scan_body, (x, jnp.zeros_like(x), rng), (consts, sig_dev)
        )
        return x


# ---------------------------------------------------------------------------
# Linear multistep (LMS)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LinearMultistepSampler(BaseSampler):
    order: int = 4

    def _run(self, denoise_fn, x, rng, sigmas, start_step, pre_fn,
             noise_override=None):
        self._reject_noise_override(noise_override)
        idx = np.arange(start_step, len(sigmas) - 1)
        sig = sigmas[idx]
        n = len(sig)
        # per-step Adams-Bashforth coefficients, zero-padded to `order`;
        # coeffs[i, j] multiplies d from step i-j (reference iterates
        # reversed(ds) with ds capped at `order` — sampling.py:313-327)
        coeffs = np.zeros((n, self.order))
        for i_rel, i_abs in enumerate(idx):
            cur_order = min(i_rel + 1, self.order)
            for j in range(cur_order):
                coeffs[i_rel, j] = linear_multistep_coeff(cur_order, sigmas, i_abs, j)

        consts = (
            jnp.asarray(sig, dtype=jnp.float32),
            jnp.asarray(coeffs, dtype=jnp.float32),
        )

        def scan_body(carry, per_step):
            x, ds_buf, rng = carry  # ds_buf: (order, *x.shape), ds_buf[0] = newest
            sigma, cf = per_step
            rng, k_pre = jax.random.split(rng)
            if pre_fn is not None:
                x = pre_fn(x, sigma, k_pre)
            denoised = denoise_fn(x, sigma)
            d = _to_d(x, sigma, denoised)
            ds_buf = jnp.concatenate([d[None], ds_buf[:-1]], axis=0)
            x = x + jnp.tensordot(cf, ds_buf, axes=1)
            return (x, ds_buf, rng), None

        ds0 = jnp.zeros((self.order,) + x.shape, dtype=x.dtype)
        (x, _, rng), _ = jax.lax.scan(scan_body, (x, ds0, rng), consts)
        return x


# ---------------------------------------------------------------------------

_SAMPLERS = {
    "euler": EulerEDMSampler,
    "heun": HeunEDMSampler,
    "euler_ancestral": EulerAncestralSampler,
    "dpmpp_2s_ancestral": DPMPP2SAncestralSampler,
    "dpmpp_2m": DPMPP2MSampler,
    "lms": LinearMultistepSampler,
}


def make_sampler(name: str, **kwargs) -> BaseSampler:
    return _SAMPLERS[name](**kwargs)
