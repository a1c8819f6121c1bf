from .attention import dot_product_attention  # noqa: F401
from .video import (  # noqa: F401
    fold_time,
    unfold_time,
    tokens_to_temporal,
    temporal_to_tokens,
)
