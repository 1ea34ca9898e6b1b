from eovax.losses.consistency import EOConsistencyLoss  # noqa: F401
from eovax.losses.ffl import focal_frequency_loss  # noqa: F401
from eovax.losses.msssim import multiscale_ssim  # noqa: F401
