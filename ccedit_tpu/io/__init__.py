from .torch_convert import (  # noqa: F401
    convert_sd_checkpoint,
    convert_unet,
    convert_vae,
    convert_clip,
    load_torch_state_dict,
)
