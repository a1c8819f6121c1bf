"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This gives every test deterministic CPU execution plus the ability to exercise
multi-chip sharding (something the PyTorch reference cannot test at all —
SURVEY.md §4).
"""

import os

# NOTE: this image preimports jax at interpreter startup AND its axon TPU
# plugin overrides JAX_PLATFORMS, so env vars alone don't stick.  XLA_FLAGS is
# read lazily at backend init; the platform is forced via jax.config below.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

# Deregister the axon TPU plugin BEFORE any backend query: jax initializes
# every registered platform (not just jax_platform_name), and the axon
# client's make_c_api_client blocks forever when the RPC tunnel is wedged —
# which took down whole test runs.  Tests are CPU-only by contract, so the
# factory must never run.  (Equivalent: invoke pytest with
# `env -u PALLAS_AXON_POOL_IPS`, which stops sitecustomize registering it.)
try:  # noqa: SIM105
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # the image env pins JAX_PLATFORMS=axon; with the factory gone that
    # name would be an init error — pin the config to cpu instead
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on virtual CPU devices, got {jax.devices()}"
)

jax.config.update("jax_default_matmul_precision", "highest")
# single-core container: persistent compile cache is a 10x on warm test runs.
# The dir is keyed by the host CPU's feature fingerprint: XLA:CPU AOT cache
# entries abort (SIGILL-class 'Fatal Python error') when loaded on a host
# with different features, and a cache volume can outlive a container
# migration between heterogeneous hosts (see utils/jax_cache.py).
from ccedit_tpu.utils.jax_cache import cpu_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/root/.cache/jax_cc_cpu_{cpu_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >30s on the 1-CPU container (full parity chains, full-network "
        "quant, real-CLI training). Fast default run: -m 'not slow'")


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def tiny_grid(monkeypatch):
    """Shrink the bucket envelope so end-to-end bucket/precompile tests run
    at toy scale (shared by test_buckets.py and test_precompile.py so the
    two suites always exercise the same policy knobs)."""
    from ccedit_tpu.utils import buckets

    monkeypatch.setattr(buckets, "HW_MIN", 32)
    monkeypatch.setattr(buckets, "HW_STEP", 32)
    monkeypatch.setattr(buckets, "T_GRID", (1, 4))
    monkeypatch.setattr(buckets, "STEPS_GRID", (1, 2, 4))
    monkeypatch.setattr(buckets, "TOKEN_MULTIPLE", 1)  # SD-scale rule off
