from .misc import append_dims, expand_dims_like, default, exists  # noqa: F401
