from .engine import CCEditEngine, TrainState  # noqa: F401
