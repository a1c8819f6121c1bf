"""Multi-chip collective-census regression guards (VERDICT r3 Next #3a).

The v5e-8 <10 s projection (docs/PERF_r3.md §7) rests on two compiled-HLO
properties of the height-sharded sampling program:

  1. the temporal fold (`tokens_to_temporal`) is h-major, so a
     height-sharded clip stays uniformly sharded through every
     spatial<->temporal layout change — ZERO collectives at fold
     boundaries.  (The b-major layout this replaced made GSPMD
     materialize full fp32 activation all-gathers at every temporal
     boundary: +5.1 GB/row, 9.07 vs 7.24 GB/row at SD scale.)
  2. the only all-gathers in the program are the inherent
     spatial-attention k/v gathers (q stays token-sharded, k/v gather —
     ring attention would move the same bytes), plus conv halo permutes
     and norm-stat all-reduces.

Both are pinned here at tiny geometry on the 8-device CPU mesh; a layout
regression reproduces at any scale because it is structural.  SD-scale
numbers live in scripts/audit_collectives.py (same parser:
ccedit_tpu.parallel.audit).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ccedit_tpu.parallel.audit import census, max_bytes, total_bytes
from ccedit_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def plan():
    assert len(jax.devices()) == 8
    return make_mesh(jax.devices(), data=8, model=1)


class TestTemporalFoldSharding:
    """The h-major fold keeps a height-sharded clip local through
    spatial<->temporal layout changes — the exact one-line regression the
    <10 s projection is most exposed to."""

    def test_fold_roundtrip_with_temporal_op_has_zero_collectives(self, plan):
        from ccedit_tpu.ops.video import temporal_to_tokens, tokens_to_temporal

        B, T, H, W, C = 2, 17, 8, 8, 32
        x = jnp.zeros((B * T, H, W, C), jnp.float32)
        sh = NamedSharding(plan.mesh, P(None, "data", None, None))  # H-sharded

        def fn(xx):
            rows = tokens_to_temporal(xx, B)          # (H*B*W, T, C)
            rows = jnp.cumsum(rows, axis=1)            # a real temporal op
            return temporal_to_tokens(rows, B, H, W)

        compiled = (
            jax.jit(fn, in_shardings=sh, out_shardings=sh)
            .lower(jax.device_put(x, sh))
            .compile()
        )
        cols = census(compiled)
        assert cols == [], (
            "temporal fold of a height-sharded clip must be collective-free "
            f"(h-major layout, ops/video.py); got {cols}"
        )

    def test_bmajor_fold_would_fail_this_guard(self, plan):
        """Sanity: the guard actually detects the regression — an
        intentionally b-major fold of the same height-sharded tensor DOES
        make GSPMD insert collectives."""
        B, T, H, W, C = 2, 17, 8, 8, 32
        x = jnp.zeros((B * T, H, W, C), jnp.float32)
        sh = NamedSharding(plan.mesh, P(None, "data", None, None))

        def bmajor(xx):
            r = xx.reshape(B, T, H, W, C)
            r = jnp.transpose(r, (0, 2, 3, 1, 4)).reshape(B * H * W, T, C)
            r = jnp.cumsum(r, axis=1)
            r = r.reshape(B, H, W, T, C)
            return jnp.transpose(r, (0, 3, 1, 2, 4)).reshape(B * T, H, W, C)

        compiled = (
            jax.jit(bmajor, in_shardings=sh, out_shardings=sh)
            .lower(jax.device_put(x, sh))
            .compile()
        )
        assert census(compiled), "b-major fold should need collectives"


def _tiny_sharded_sampling_compiled(plan):
    """Compile the height-sharded single-clip sampling program (T=17, the
    production uneven-frames path) at tiny geometry — structurally identical
    to scripts/audit_collectives.py's SD-scale program."""
    from ccedit_tpu.diffusion import (
        DiscreteDenoiser, LegacyDDPMDiscretization, make_sampler,
    )
    from ccedit_tpu.diffusion.guidance import VanillaCFG
    from ccedit_tpu.modules.controlnet import CCEditNetwork, ControlNet2D
    from ccedit_tpu.modules.unet import UNetModel
    from ccedit_tpu.ops.attention import mesh_context
    from ccedit_tpu.parallel.sampling import clip_sharding, pick_clip_axis

    tiny = dict(in_channels=4, model_channels=32, out_channels=4,
                num_res_blocks=1, attention_resolutions=(2, 1),
                channel_mult=(1, 2), num_heads=2, transformer_depth=1,
                context_dim=16)
    net = CCEditNetwork(
        unet=UNetModel(unet_type="pseudo-3d", disable_temporal_text_ca=True,
                       **tiny),
        controlnet=ControlNet2D(hint_channels=3, **tiny),
    )

    T, Hl, Wl = 17, 8, 8
    shape = (1, T, Hl, Wl, 4)
    axis = pick_clip_axis(plan, shape)
    assert axis == 2  # height, as in production (T=17 does not divide 8)
    out_sh = clip_sharding(plan, len(shape), axis)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros(shape, jnp.float32)
    tt = jnp.array([500.0])
    cond = {"crossattn": jnp.zeros((1, 7, 16)),
            "control_hint": jnp.zeros((1, T, Hl * 8, Wl * 8, 3))}
    p_shapes = jax.eval_shape(net.init, rng, x, tt, cond)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), p_shapes)

    den = DiscreteDenoiser(scaling="eps", weighting="eps")
    guider = VanillaCFG(scale=7.5)
    uc = {**cond, "crossattn": jnp.ones_like(cond["crossattn"])}
    cond_cat = guider.prepare_cond(cond, uc)
    sampler = make_sampler("dpmpp_2s_ancestral",
                           discretization=LegacyDDPMDiscretization(),
                           num_steps=2)

    def denoise(p, cc, xx, sigma):
        sv = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (xx.shape[0],))
        x2, s2 = guider.expand(xx, sv)
        out = den(lambda a, b, c: net.apply(p, a, b, c), x2, s2, cc)
        return guider.combine(out, sv)

    def sample_fn(p, cc, x0, key):
        return sampler(lambda xx, s: denoise(p, cc, xx, s), x0, key)

    repl = plan.replicated()
    cc = {k: jax.device_put(v, clip_sharding(plan, v.ndim, axis)
                            if k == "control_hint" else repl)
          for k, v in cond_cat.items()}
    params = jax.device_put(params, repl)
    x0 = jax.device_put(x, out_sh)

    jitted = jax.jit(sample_fn, out_shardings=out_sh)
    with mesh_context(plan.mesh):
        return jitted.lower(params, cc, x0, jax.random.PRNGKey(1)).compile()


class TestSamplingProgramCensus:
    """Byte/count budget on the whole height-sharded sampling program.

    Golden census at this geometry (2-step DPM++2S, 3 scan rows; the scan
    body appears once in HLO so counts are per program):
      20 all-gathers (attention k/v only: 8x l0 f32[34,2,64,16] + 12x l1
      f32[34,2,16,32]), 3.90 MB; 85 conv-halo collective-permutes; 35
      norm-stat all-reduces; 9.05 MB total.  A b-major fold regression
      adds full-activation all-gathers at every temporal boundary (dozens
      of sites, ~278 KB each at this geometry) and blows every budget
      below; budgets carry ~15% slack for compiler-version drift.
    """

    def test_height_sharded_census_within_budget(self, plan):
        compiled = _tiny_sharded_sampling_compiled(plan)
        cols = census(compiled)
        ag = [c for c in cols if c.op == "all-gather"]

        assert len(ag) <= 24, f"all-gather count regressed: {ag}"
        assert total_bytes(cols, "all-gather") <= int(3.9e6 * 1.15), (
            f"all-gather bytes regressed: {total_bytes(cols, 'all-gather')}"
        )
        # every all-gather must be k/v-shaped: (B*T_cfg, heads, tokens, d)
        # with heads == 2 — a gathered activation would be (34, H, W, C)
        # with dim1 == 8 (full H) or a 3-D/5-D fold-boundary layout
        for c in ag:
            dims = [int(d) for d in
                    c.shape.split("[")[1].split("]")[0].split(",")]
            assert len(dims) == 4 and dims[0] == 34 and dims[1] == 2, (
                f"non-k/v all-gather (fold-boundary regression?): {c}"
            )
        assert total_bytes(cols) <= int(9.05e6 * 1.15), (
            f"total collective bytes regressed: {total_bytes(cols)}"
        )
        assert max_bytes(cols) <= 278528, (
            "a collective larger than the l0 k/v gather appeared: "
            f"{max_bytes(cols)}"
        )


class TestParseCollectives:
    def test_async_start_counts_result_element_only(self):
        """TPU HLO emits async collectives whose result is an
        (operand, result[, contexts]) tuple — summing every typed leaf
        would double-count (~2x for all-reduce, operand+gathered for
        all-gather)."""
        from ccedit_tpu.parallel.audit import parse_collectives

        hlo = """
  %ag = (bf16[2,8,768,40], bf16[2,8,6144,40]) all-gather-start(%x), dimensions={2}
  %ar = (f32[128,64], f32[128,64]) all-reduce-start(%y), to_apply=%add
  %sync = bf16[2,8,6144,40] all-gather(%z), dimensions={2}
"""
        cols = parse_collectives(hlo)
        assert [c.op for c in cols] == ["all-gather", "all-reduce",
                                        "all-gather"]
        kv = 2 * 8 * 6144 * 40 * 2
        assert cols[0].nbytes == kv            # result element only
        assert cols[1].nbytes == 128 * 64 * 4  # not doubled
        assert cols[2].nbytes == kv            # sync form: the single leaf


class TestMeshPlanEdges:
    def test_shard_batch_replicates_scalar_leaves(self):
        """A batch pytree may carry scalar metadata (frame counts, flags):
        batch_spec(0) must be P() — a rank-1 spec on a rank-0 value is a
        device_put rank mismatch."""
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from ccedit_tpu.parallel.mesh import make_mesh, shard_batch

        plan = make_mesh(jax.devices(), data=8, model=1)
        assert plan.batch_spec(0) == P()
        out = shard_batch(plan, {"video": jnp.zeros((8, 4, 8, 8, 3)),
                                 "num_frames": jnp.asarray(17)})
        assert out["num_frames"].shape == ()
        assert int(out["num_frames"]) == 17

    def test_zero_shardings_respect_custom_axis_name(self):
        """MeshPlan.data_axis exists to make the axis name configurable —
        the ZeRO specs must use it, not a hardcoded 'data'."""
        import jax
        from jax.sharding import Mesh

        import numpy as np

        from ccedit_tpu.parallel.mesh import MeshPlan
        from ccedit_tpu.parallel.zero import zero_shardings

        mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
        plan = MeshPlan(mesh=mesh, data_axis="dp")
        specs = zero_shardings({"w": jax.numpy.ones((16, 8))}, plan)
        assert specs["w"].spec == jax.sharding.PartitionSpec("dp", None)
