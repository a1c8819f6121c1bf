from .lr_schedule import LambdaLinearScheduler, LambdaWarmUpCosineScheduler, LambdaWarmUpCosineScheduler2  # noqa: F401
from .ema import EmaState  # noqa: F401
from .freeze import freeze_mask, FREEZE_POLICIES  # noqa: F401
