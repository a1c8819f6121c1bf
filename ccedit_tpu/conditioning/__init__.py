from .conditioner import Conditioner, EmbedderSpec  # noqa: F401
