"""TV2V inference CLI (text + video -> video).

Flag-compatible with the reference's scripts/sampling/sampling_tv2v.py.

    python -m ccedit_tpu.cli.sampling_tv2v \
        --config_path configs/inference_ccedit/keyframe_no2ndca_depthmidas.yaml \
        --ckpt_path ckpt.ckpt --video_path clip.mp4 --prompt "a robot bear"
"""

from .pipeline import base_parser, run_pipeline


def main():
    args = base_parser().parse_args()
    run_pipeline(args, reference_mode=False)


if __name__ == "__main__":
    main()
