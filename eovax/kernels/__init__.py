from eovax.kernels.attention import flash_attention  # noqa: F401
