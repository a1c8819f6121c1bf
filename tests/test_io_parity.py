"""IO-layer parity vs the reference's own CLI utilities
(scripts/sampling/util.py, imported and executed as the oracle):

  * keyframe SELECTION math (get_keyframes :674-687 / the dir branch of
    load_video_keyframes :705-719): stride round(fps/target) from frame 0,
    truncate to num_keyframes, linspace fallback when the clip is short;
  * the frame-directory LOADER end-to-end (load_video_keyframes :705-721 via
    load_img :360-383): PIL-bicubic resize of the uint8 frame, then
    /255*2-1 — pixel-exact against our channels-last loader;
  * the kohya-LoRA MERGE (convert_load_lora :115-272): the kohya
    down/up/mid-block index maps and ff/proj/attn/te name grammar, pinned by
    running the reference merge on a torch SD-style state dict and comparing
    converted trees against merge_kohya_lora on the identical inputs.
"""

import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_compat import install_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref_util(tmp_path_factory):
    install_reference()
    return importlib.import_module("scripts.sampling.util")


class TestKeyframeSelectionParity:
    @pytest.mark.parametrize("fps,tfps,n,k", [
        (30, 6, 90, 17),    # stride 5
        (24, 6, 90, 17),    # stride 4
        (30, 30, 20, 17),   # stride 1
        (12, 5, 60, 17),    # non-integer ratio -> round
        (10, 4, 60, 17),    # 2.5 -> banker's rounding
        (30, 6, 40, 17),    # too short -> linspace fallback
        (30, 6, 17, 17),    # exactly num_keyframes frames
        (8, 6, 9, 8),       # tiny clip
        (30, 7, 100, 17),
    ])
    def test_index_math_matches(self, ref_util, fps, tfps, n, k):
        from ccedit_tpu.data.video import select_keyframe_indices

        ref = ref_util.get_keyframes(fps, tfps, np.arange(n), k)
        ours = select_keyframe_indices(n, fps, tfps, k)
        np.testing.assert_array_equal(np.asarray(ours), ref)

    @pytest.mark.parametrize("fps,tfps,k", [(12, 6, 4), (12, 4, 7)])
    def test_frame_dir_loader_matches(self, ref_util, tmp_path, fps, tfps, k):
        """End-to-end dir loader: both sides read the same PNGs, resize
        PIL-bicubic to (H, W) and scale to [-1, 1].  (12, 4, 7) forces the
        linspace fallback (ceil(10/3)=4 < 7)."""
        from PIL import Image

        from ccedit_tpu.data.video import load_video_keyframes

        rng = np.random.default_rng(3)
        d = tmp_path / "frames"
        d.mkdir()
        for i in range(10):
            Image.fromarray(
                rng.integers(0, 256, (20, 26, 3), dtype=np.uint8)
            ).save(d / f"{i:05d}.png")

        ref = ref_util.load_video_keyframes(str(d), fps, tfps, k, size=(16, 20))
        ours = load_video_keyframes(str(d), origin_fps=fps, target_fps=tfps,
                                    num_keyframes=k, size_hw=(16, 20))
        assert ours.shape == (k, 16, 20, 3)
        np.testing.assert_allclose(
            ours, ref.numpy().transpose(0, 2, 3, 1), atol=2e-6)


# the kohya-key zoo: every grammar branch of convert_load_lora
# (down/up proj|to_out|ff|attn, mid proj|to_out|ff|attn, te attn|mlp)
_C = {0: 8, 1: 16, 2: 32}     # per-level channel width (model_channels=8)
_CTX = 24                     # crossattn context dim
_TE = 16                      # text-encoder hidden

_UNET_CASES = [
    # (kohya name fragment, torch weight shape)
    ("down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q", (_C[0], _C[0])),
    ("down_blocks_0_attentions_1_proj_in", (_C[0], _C[0], 1, 1)),
    ("down_blocks_1_attentions_0_transformer_blocks_0_attn2_to_k", (_C[1], _CTX)),
    ("down_blocks_1_attentions_1_transformer_blocks_0_attn1_to_out_0", (_C[1], _C[1])),
    ("down_blocks_2_attentions_0_transformer_blocks_0_ff_net_0_proj", (2 * _C[2], _C[2])),
    ("down_blocks_2_attentions_1_transformer_blocks_0_ff_net_2", (_C[2], 2 * _C[2])),
    ("up_blocks_1_attentions_0_transformer_blocks_0_attn1_to_v", (_C[2], _C[2])),
    ("up_blocks_2_attentions_1_transformer_blocks_0_attn2_to_out_0", (_C[1], _C[1])),
    ("up_blocks_3_attentions_2_proj_out", (_C[0], _C[0], 1, 1)),
    ("mid_block_attentions_0_transformer_blocks_0_attn1_to_q", (_C[2], _C[2])),
    ("mid_block_attentions_0_proj_out", (_C[2], _C[2], 1, 1)),
    ("mid_block_attentions_0_transformer_blocks_0_ff_net_0_proj", (2 * _C[2], _C[2])),
]
_TE_CASES = [
    ("text_model_encoder_layers_0_self_attn_q_proj", (_TE, _TE)),
    ("text_model_encoder_layers_1_self_attn_out_proj", (_TE, _TE)),
    ("text_model_encoder_layers_0_mlp_fc1", (2 * _TE, _TE)),
    ("text_model_encoder_layers_1_mlp_fc2", (_TE, 2 * _TE)),
]
_RANK = 4
_ALPHA = 0.6


def _make_kohya_sd(seed=11):
    """kohya pairs for every case (4D for conv layers, no .alpha keys so the
    reference's 'alpha set beforehand' convention == our strength)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for prefix, cases in (("lora_unet_", _UNET_CASES), ("lora_te_", _TE_CASES)):
        for frag, shape in cases:
            out_c, in_c = shape[0], shape[1]
            if len(shape) == 4:
                down = torch.randn(_RANK, in_c, 1, 1, generator=g)
                up = torch.randn(out_c, _RANK, 1, 1, generator=g)
            else:
                down = torch.randn(_RANK, in_c, generator=g)
                up = torch.randn(out_c, _RANK, generator=g)
            sd[f"{prefix}{frag}.lora_down.weight"] = down * 0.1
            sd[f"{prefix}{frag}.lora_up.weight"] = up * 0.1
    return sd


def _kohya_to_sgm_name(frag: str, prefix: str) -> str:
    """Independent kohya->SD-checkpoint translation used only to BUILD the
    base state dict (the mapping under test is exercised inside the reference
    function itself; any slip here shows up as its KeyError, not a pass)."""
    if prefix == "lora_te_":
        i = frag.split("_")[4]
        if "self_attn" in frag:
            tail = f"{i}.self_attn.{frag.split('_')[-2]}_proj"
        else:
            tail = f"{i}.mlp.{frag.split('_')[-1]}"
        return ("conditioner.embedders.0.transformer.text_model.encoder."
                f"layers.{tail}.weight")
    in_map = {(0, 0): 1, (0, 1): 2, (1, 0): 4, (1, 1): 5, (2, 0): 7, (2, 1): 8}
    out_map = {(1, 0): 3, (1, 1): 4, (1, 2): 5, (2, 0): 6, (2, 1): 7,
               (2, 2): 8, (3, 0): 9, (3, 1): 10, (3, 2): 11}
    p = frag.split("_")
    if frag.startswith("mid_block"):
        base = "model.diffusion_model.middle_block.1"
        rest = frag[len("mid_block_attentions_0_"):]
    else:
        which = in_map if p[0] == "down" else out_map
        blocks = "input_blocks" if p[0] == "down" else "output_blocks"
        base = f"model.diffusion_model.{blocks}.{which[(int(p[2]), int(p[4]))]}.1"
        rest = "_".join(p[5:])
    if rest.startswith("proj_"):
        return f"{base}.{rest}.weight"
    q = rest.split("_")  # transformer_blocks_0_<attn1_to_q | ff_net_...>
    d = q[2]
    if q[3].startswith("attn"):
        tail = "to_out.0" if q[4:] == ["to", "out", "0"] else "_".join(q[4:])
        return f"{base}.transformer_blocks.{d}.{q[3]}.{tail}.weight"
    return f"{base}.transformer_blocks.{d}.ff.net.{'.'.join(q[5:])}.weight"


class TestKohyaLoraParity:
    def test_merge_matches_reference(self, ref_util):
        """Run the reference convert_load_lora on a synthetic SD state dict,
        convert pre- and post-merge through the (independently forward-pinned)
        torch converters, and require merge_kohya_lora to reproduce the
        post-merge tree exactly — pins the kohya block-index maps, the
        ff/proj/to_out grammar, the conv-1x1 squeeze, and the te path."""
        import flax

        from ccedit_tpu.io.lora import merge_kohya_lora
        from ccedit_tpu.io.torch_convert import convert_clip, convert_unet

        kohya = _make_kohya_sd()

        g = torch.Generator().manual_seed(12)
        sd = {}
        for prefix, cases in (("lora_unet_", _UNET_CASES),
                              ("lora_te_", _TE_CASES)):
            for frag, shape in cases:
                sd[_kohya_to_sgm_name(frag, prefix)] = torch.randn(
                    *shape, generator=g)
        assert len(sd) == len(_UNET_CASES) + len(_TE_CASES)

        sd_post = {k: v.clone() for k, v in sd.items()}
        ref_util.convert_load_lora(sd_post, kohya, alpha=_ALPHA)
        changed = [k for k in sd if not torch.equal(sd[k], sd_post[k])]
        assert len(changed) == len(sd), f"reference left {set(sd)-set(changed)}"

        def to_tree(t_sd):
            np_sd = {k: v.numpy() for k, v in t_sd.items()}
            return {
                "network": {"unet": convert_unet(
                    np_sd, model_channels=8, strict=False)},
                "conditioner": {"embedder_0": convert_clip(
                    np_sd, prefix="conditioner.embedders.0.transformer.",
                    layers=2, strict=False)},
            }

        kohya_np = {k: v.numpy() for k, v in kohya.items()}
        ours = merge_kohya_lora(to_tree(sd), kohya_np, strength=_ALPHA)
        want = to_tree(sd_post)

        flat_ours = flax.traverse_util.flatten_dict(ours)
        flat_want = flax.traverse_util.flatten_dict(want)
        assert set(flat_ours) == set(flat_want)
        assert len(flat_ours) == len(sd)
        for path, w in flat_want.items():
            np.testing.assert_allclose(
                flat_ours[path], w, rtol=1e-5, atol=1e-6,
                err_msg="/".join(path))
