"""Multi-device batched sampling (BASELINE.json config 5: data-parallel
sampling sweep) on the 8-virtual-device CPU mesh: the batch axis of the
sampling program is sharded over the mesh's data axis; XLA partitions the
whole denoising scan with no code changes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ccedit_tpu.parallel.mesh import make_mesh
from test_engine import example_batch, make_tiny_engine


class TestDataParallelSampling:
    @pytest.mark.slow
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

    @pytest.mark.slow
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


class TestMeshContextAttention:
    """The Pallas flash kernel can't be partitioned by GSPMD; under clip
    sharding it runs inside shard_map.  Verify the shard_map routing returns
    bit-identical results to the plain kernel (CPU mesh exercises the
    routing; the flash kernel itself is TPU-gated)."""

    def test_batch_sharded_matches_plain(self):
        from ccedit_tpu.ops.attention import dot_product_attention, mesh_context

        plan = make_mesh(jax.devices(), data=8, model=1)
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(8, 2, 512, 16).astype(np.float32))
        k = jnp.asarray(rs.randn(8, 2, 512, 16).astype(np.float32))
        v = jnp.asarray(rs.randn(8, 2, 512, 16).astype(np.float32))
        plain = dot_product_attention(q, k, v)
        with mesh_context(plan.mesh):
            sharded = jax.jit(dot_product_attention)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(sharded), rtol=1e-5, atol=1e-5
        )

    def test_token_sharded_matches_plain(self):
        from ccedit_tpu.ops.attention import dot_product_attention, mesh_context

        plan = make_mesh(jax.devices(), data=8, model=1)
        rs = np.random.RandomState(1)
        q = jnp.asarray(rs.randn(3, 2, 1024, 16).astype(np.float32))
        k = jnp.asarray(rs.randn(3, 2, 1024, 16).astype(np.float32))
        v = jnp.asarray(rs.randn(3, 2, 1024, 16).astype(np.float32))
        plain = dot_product_attention(q, k, v)
        with mesh_context(plan.mesh):
            sharded = jax.jit(dot_product_attention)(q, k, v)
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(sharded), rtol=1e-5, atol=1e-5
        )


class TestSingleClipFrameSharding:
    """SURVEY §2.7/§5: ONE clip sharded across 8 devices by splitting its
    frame axis — the spatial ops are frame-independent so only the temporal
    ops (1D convs, T-token attention) cost collectives.  The torch reference
    cannot parallelize a single clip at all."""

    def _setup(self, t):
        engine = make_tiny_engine()
        params = engine.init_params(jax.random.PRNGKey(0), example_batch())
        batch = example_batch(b=1, t=t)
        c, uc = engine.conditioner.get_unconditional_conditioning(
            params["conditioner"], batch, batch
        )
        return engine, params, c, uc

    @pytest.mark.slow
    def test_frame_sharded_matches_single_device(self):
        from ccedit_tpu.parallel.sampling import make_frame_sharded_sample

        t = 16  # divides the 8-device mesh evenly
        engine, params, c, uc = self._setup(t)
        z_shape = (1, t, 8, 8, 4)
        plain = engine.sample(params, c, uc, z_shape, jax.random.PRNGKey(3))

        plan = make_mesh(jax.devices(), data=8, model=1)
        fn = make_frame_sharded_sample(engine, plan, z_shape, num_steps=None)
        sharded = fn(params, c, uc, jax.random.PRNGKey(3))
        assert sharded.shape == z_shape
        # the clip really is split across all 8 devices
        shard_devices = {s.device for s in sharded.addressable_shards}
        assert len(shard_devices) == 8
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(sharded), rtol=2e-4, atol=2e-4
        )

    @pytest.mark.slow
    def test_frame_sharded_uneven_frames(self):
        """T=17 (the production clip length) does not divide 8, so
        pick_clip_axis falls through to the HEIGHT axis (axis 2) — the same
        axis the v5e-8 <10 s projection rides on (PERF_r3.md §7).  Results
        must match the single-device program."""
        from ccedit_tpu.parallel.sampling import make_frame_sharded_sample

        from ccedit_tpu.parallel.sampling import pick_clip_axis

        t = 17
        engine, params, c, uc = self._setup(t)
        z_shape = (1, t, 8, 8, 4)
        plain = engine.sample(params, c, uc, z_shape, jax.random.PRNGKey(4))

        plan = make_mesh(jax.devices(), data=8, model=1)
        assert pick_clip_axis(plan, z_shape) == 2  # height, as in production
        fn = make_frame_sharded_sample(engine, plan, z_shape, num_steps=None)
        sharded = fn(params, c, uc, jax.random.PRNGKey(4))
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(sharded), rtol=2e-4, atol=2e-4
        )

    def test_frame_sharded_sample_enters_mesh_context(self, monkeypatch):
        """GSPMD cannot partition a pallas_call, so the library entry point
        must trace under ops.attention.mesh_context — otherwise on real TPU
        the flash kernels lower unpartitioned and XLA replicates their
        operands, silently forfeiting the clip sharding."""
        from ccedit_tpu.ops import attention
        from ccedit_tpu.parallel.sampling import make_frame_sharded_sample

        entered = []
        real_ctx = attention.mesh_context

        class SpyCtx(real_ctx):
            def __enter__(self):
                entered.append((self.mesh, self.axis))
                return super().__enter__()

        monkeypatch.setattr(attention, "mesh_context", SpyCtx)

        t = 16
        engine, params, c, uc = self._setup(t)
        z_shape = (1, t, 8, 8, 4)
        plan = make_mesh(jax.devices(), data=8, model=1)
        fn = make_frame_sharded_sample(engine, plan, z_shape, num_steps=None)
        fn(params, c, uc, jax.random.PRNGKey(5))
        assert entered, "make_frame_sharded_sample never entered mesh_context"
        assert entered[0] == (plan.mesh, plan.data_axis)
