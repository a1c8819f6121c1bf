"""Multi-device batched sampling (BASELINE.json config 5: data-parallel
sampling sweep) on the 8-virtual-device CPU mesh: the batch axis of the
sampling program is sharded over the mesh's data axis; XLA partitions the
whole denoising scan with no code changes."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ccedit_tpu.parallel.mesh import make_mesh
from test_engine import example_batch, make_tiny_engine


class TestDataParallelSampling:
    def test_batched_sampling_shards_over_mesh(self):
        assert len(jax.devices()) == 8
        engine = make_tiny_engine()
        params = engine.init_params(jax.random.PRNGKey(0), example_batch())
        plan = make_mesh(jax.devices(), data=8, model=1)

        B = 8
        batch = example_batch(b=B)
        c, uc = engine.conditioner.get_unconditional_conditioning(
            params["conditioner"], batch, batch
        )
        repl = NamedSharding(plan.mesh, P())
        bshard = lambda nd: NamedSharding(plan.mesh, P("data", *([None] * (nd - 1))))

        z_shape = (B, 2, 8, 8, 4)
        cond_shardings = {k: bshard(v.ndim) for k, v in c.items()}

        @jax.jit
        def sample(p, cc, ucc, key):
            return engine.sample(p, cc, ucc, z_shape, key)

        p_dev = jax.device_put(params, repl)
        c_dev = {k: jax.device_put(v, cond_shardings[k]) for k, v in c.items()}
        uc_dev = {k: jax.device_put(v, cond_shardings[k]) for k, v in uc.items()}
        out = sample(p_dev, c_dev, uc_dev, jax.random.PRNGKey(1))
        assert out.shape == z_shape
        assert bool(jnp.isfinite(out).all())
        # output really is sharded over the data axis
        shard_devices = {s.device for s in out.addressable_shards}
        assert len(shard_devices) == 8

    def test_sharded_matches_single_device(self):
        """Per-sample results are identical whether the batch is sharded or
        replicated (pure data parallelism, no cross-sample coupling)."""
        engine = make_tiny_engine()
        params = engine.init_params(jax.random.PRNGKey(0), example_batch())
        B = 8
        batch = example_batch(b=B)
        c, uc = engine.conditioner.get_unconditional_conditioning(
            params["conditioner"], batch, batch
        )
        z_shape = (B, 2, 8, 8, 4)

        plain = engine.sample(params, c, uc, z_shape, jax.random.PRNGKey(1))

        plan = make_mesh(jax.devices(), data=8, model=1)
        repl = NamedSharding(plan.mesh, P())
        bshard = lambda nd: NamedSharding(plan.mesh, P("data", *([None] * (nd - 1))))
        sharded = jax.jit(
            lambda p, cc, ucc, key: engine.sample(p, cc, ucc, z_shape, key),
            in_shardings=(
                repl,
                {k: bshard(v.ndim) for k, v in c.items()},
                {k: bshard(v.ndim) for k, v in uc.items()},
                repl,
            ),
        )(params, c, uc, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(sharded), rtol=2e-4, atol=2e-4
        )
