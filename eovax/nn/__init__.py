from eovax.nn.blocks import (  # noqa: F401
    AttnBlock,
    Downsample,
    ResnetBlock,
    Upsample,
    WavelengthConditioner,
    swish,
)
from eovax.nn.distributions import DiagonalGaussian, normal_kl  # noqa: F401
from eovax.nn.dynamic_conv import (  # noqa: F401
    DynamicConv,
    DynamicConvDecoder,
    FCResLayer,
    sincos_wavelength_embed,
)
from eovax.nn.latent import LatentBatchNorm, patch_shuffle, patch_unshuffle  # noqa: F401
from eovax.nn.embeddings import (  # noqa: F401
    LearnedPositionalEmbedding,
    RelativePositionBias,
    TimestepEmbedding,
    Timesteps,
    get_timestep_embedding,
)
