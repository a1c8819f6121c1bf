from .video import load_video_keyframes, save_video_frames, load_image  # noqa: F401
