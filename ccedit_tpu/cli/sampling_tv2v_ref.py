"""TVI2V inference CLI (text + video + edited reference frame -> video).

Flag-compatible with the reference's scripts/sampling/sampling_tv2v_ref.py
(adds --reference_path and --prior_type on top of the tv2v surface).
"""

from .pipeline import base_parser, run_pipeline


def main():
    p = base_parser()
    p.add_argument("--reference_path", type=str, default="",
                   help="edited center/reference frame image")
    p.add_argument("--prior_type", type=str, default="ref",
                   choices=["video", "ref", "video_ref"])
    args = p.parse_args()
    run_pipeline(args, reference_mode=True)


if __name__ == "__main__":
    main()
