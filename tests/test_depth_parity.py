"""Parity tests for the DPT-Hybrid (MiDaS) depth backbone against the
HuggingFace torch implementation (transformers DPTForDepthEstimation with
is_hybrid=True — the exact architecture of Intel/dpt-hybrid-midas, itself the
converted dpt_hybrid-midas-501f0c75.pt the reference's DepthMidasEncoder
loads).  Random converted weights, tiny replica config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import randomize_state_dict  # noqa: E402


def make_tiny_hf_dpt():
    from transformers import DPTConfig, DPTForDepthEstimation

    bit_cfg = dict(
        model_type="bit", embedding_size=16, hidden_sizes=[16, 32, 64],
        depths=[1, 1, 1], layer_type="bottleneck", num_groups=4,
        global_padding="SAME", embedding_dynamic_padding=True,
        out_features=["stage1", "stage2", "stage3"], num_channels=3,
    )
    cfg = DPTConfig(
        is_hybrid=True, backbone_config=bit_cfg,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, backbone_out_indices=[0, 1, 0, 1],
        neck_ignore_stages=[0, 1], neck_hidden_sizes=[16, 32, 32, 32],
        reassemble_factors=[4, 2, 1, 0.5], fusion_hidden_size=16,
        image_size=64, patch_size=16, readout_type="project",
        backbone_featmap_shape=[1, 64, 4, 4],
    )
    return DPTForDepthEstimation(cfg).eval()


def make_tiny_flax_dpt():
    from ccedit_tpu.conditioning.annotators.dpt_midas import DPTHybrid

    return DPTHybrid(
        embedding_size=16, bit_hidden=(16, 32, 64), bit_depths=(1, 1, 1),
        num_groups=4, hidden_size=32, num_layers=2, num_heads=2,
        mlp_dim=64, vit_taps=(0, 1), fusion_hidden=16, pos_grid=4,
    )


class TestDPTHybridParity:
    @pytest.mark.slow
    def test_forward_matches_hf(self):
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.annotators.dpt_midas import convert_dpt_midas

        tm = make_tiny_hf_dpt()
        randomize_state_dict(tm, seed=50, scale=0.08)

        x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(51))
        with torch.no_grad():
            ref = tm(x).predicted_depth.numpy()  # (2, 64, 64)

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = convert_dpt_midas(sd, bit_depths=(1, 1, 1), num_layers=2)
        jm = make_tiny_flax_dpt()
        out = jm.apply({"params": params},
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)

    def test_non_square_input(self):
        """MiDaS runs at arbitrary /32 sizes via pos-embed resize (the CCEdit
        512x768 case); check shape handling off the pretraining grid."""
        import jax
        import jax.numpy as jnp

        jm = make_tiny_flax_dpt()
        x = jnp.zeros((1, 64, 96, 3))
        params = jm.init(jax.random.PRNGKey(0), x)["params"]
        out = jm.apply({"params": params}, x)
        assert out.shape == (1, 64, 96)

    def test_midas_official_naming_roundtrip(self):
        """The production converter accepts the official MiDaS checkpoint
        naming (pretrained.model.* / scratch.*) and yields identical params
        to the HF-naming path."""
        import jax

        from ccedit_tpu.conditioning.annotators.dpt_midas import (
            _hf_to_midas_names, convert_dpt_midas,
        )

        tm = make_tiny_hf_dpt()
        randomize_state_dict(tm, seed=52, scale=0.08)
        sd_hf = {k: v.numpy() for k, v in tm.state_dict().items()}
        sd_midas = _hf_to_midas_names(sd_hf)
        p1 = convert_dpt_midas(sd_hf, bit_depths=(1, 1, 1), num_layers=2)
        p2 = convert_dpt_midas(sd_midas, bit_depths=(1, 1, 1), num_layers=2)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)


class TestBilinearResizeParity:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("shape", [(4, 4, 8, 8), (7, 5, 3, 9), (8, 8, 4, 4)])
    def test_matches_torch_interpolate(self, align, shape):
        import jax.numpy as jnp

        from ccedit_tpu.conditioning.annotators.dpt_midas import resize_bilinear

        h, w, h2, w2 = shape
        x = torch.randn(2, 3, h, w, generator=torch.Generator().manual_seed(1))
        ref = torch.nn.functional.interpolate(
            x, size=(h2, w2), mode="bilinear", align_corners=align
        ).numpy()
        out = resize_bilinear(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (h2, w2), align
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-6, rtol=1e-5
        )


class TestAnnotatorGating:
    def test_missing_backbone_raises_without_escape_hatch(self):
        import numpy as onp

        from ccedit_tpu.conditioning.annotators.base import AnnotatorEmbedder

        emb = AnnotatorEmbedder("depth_midas")
        video = onp.zeros((1, 2, 64, 64, 3), dtype=onp.float32)
        with pytest.raises(RuntimeError, match="fake_annotator"):
            emb.embed(None, video)
        emb_fake = AnnotatorEmbedder("depth_midas", allow_fake=True)
        out = emb_fake.embed(None, video)
        assert out.shape == (1, 2, 64, 64, 3)


class TestZoeDepthParity:
    """ZoeDepthN vs transformers' ZoeDepthForDepthEstimation (the public
    implementation of the ZoeD_M12_N family the reference's DepthZoeEncoder
    runs, modules.py:1289-1344) with a tiny random config."""

    def _tiny(self):
        from transformers import BeitConfig, ZoeDepthConfig, ZoeDepthForDepthEstimation

        backbone = BeitConfig(
            image_size=64, patch_size=16, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=128,
            use_relative_position_bias=True, use_mean_pooling=False,
            out_features=["stage1", "stage2", "stage3", "stage4"],
            reshape_hidden_states=False, layer_scale_init_value=0.1,
            drop_path_rate=0.0, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        cfg = ZoeDepthConfig(
            backbone_config=backbone, neck_hidden_sizes=[16, 24, 32, 32],
            fusion_hidden_size=32, bottleneck_features=32,
            bin_embedding_dim=16, num_attractors=[4, 2, 2, 1],
            num_relative_features=8,
            bin_configurations=[{"n_bins": 8, "min_depth": 1e-3,
                                 "max_depth": 10.0}],
        )
        return ZoeDepthForDepthEstimation(cfg).eval()

    def test_forward_matches_hf(self):
        import jax.numpy as jnp

        from reference_compat import randomize_state_dict

        from ccedit_tpu.conditioning.annotators.zoedepth import (
            ZoeDepthN,
            convert_zoedepth,
        )

        tm = self._tiny()
        randomize_state_dict(tm, seed=100, scale=0.05)
        x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(101))
        with torch.no_grad():
            ref = tm(pixel_values=x).predicted_depth.numpy()

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = convert_zoedepth(sd, layers=4)
        jm = ZoeDepthN(hidden=32, heads=4, layers=4, patch=16,
                       out_indices=(0, 1, 2, 3),
                       neck_hidden=(16, 24, 32, 32), fusion_ch=32, n_bins=8,
                       bin_embedding_dim=16, num_attractors=(4, 2, 2, 1),
                       num_relative_features=8)
        depth, rel = jm.apply({"params": params},
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(depth), ref, atol=5e-4, rtol=1e-2)

    def test_rel_bias_matrix_matches_hf(self):
        """The decomposed rel-position bias matrix — index layout (cls rows)
        AND arbitrary-window table interpolation — vs transformers'
        BeitRelativePositionBias.forward, exactly.  This is where the
        full-forward test was previously blind (a swapped cls row or a
        clamped gather drowns in a 0.05-scale end-to-end atol)."""
        from transformers import BeitConfig
        from transformers.models.beit.modeling_beit import (
            BeitRelativePositionBias,
        )

        from ccedit_tpu.conditioning.annotators.zoedepth import (
            beit_relative_position_index,
            interpolate_rel_bias_table,
        )

        cfg = BeitConfig(num_attention_heads=4)
        mod = BeitRelativePositionBias(cfg, window_size=(4, 4))
        g = torch.Generator().manual_seed(7)
        with torch.no_grad():
            mod.relative_position_bias_table.copy_(
                torch.randn(mod.relative_position_bias_table.shape,
                            generator=g))
        table = mod.relative_position_bias_table.detach().numpy()

        for window in [(4, 4), (6, 4), (3, 5)]:
            with torch.no_grad():
                ref = mod(window_size=window).detach().numpy()[0]  # (H, L, L)
            new_table = interpolate_rel_bias_table(table, window,
                                                   old_grid=(4, 4))
            index = beit_relative_position_index(*window)
            ours = new_table[index].transpose(2, 0, 1)
            np.testing.assert_allclose(ours, ref, atol=1e-5,
                                       err_msg=f"window={window}")

    def test_adapt_grid_matches_direct_conversion(self):
        """adapt_zoedepth_grid (the lazy runtime path in build_annotator)
        must equal convert_zoedepth(grid=...)."""
        from ccedit_tpu.conditioning.annotators.zoedepth import (
            adapt_zoedepth_grid,
            convert_zoedepth,
            zoedepth_grid_for,
        )

        from reference_compat import randomize_state_dict

        tm = self._tiny()
        randomize_state_dict(tm, seed=300, scale=0.5)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        base = convert_zoedepth(sd, layers=4)
        direct = convert_zoedepth(sd, layers=4, grid=(6, 4))
        lazy = adapt_zoedepth_grid(base, (6, 4))
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(lazy["backbone"][f"blocks_{i}"]["rel_bias"]),
                np.asarray(direct["backbone"][f"blocks_{i}"]["rel_bias"]),
                atol=1e-6)
        assert zoedepth_grid_for(96, 64) == (6, 4)
        assert zoedepth_grid_for(512, 768) == (32, 48)
