"""eovax — TPU-native multi-sensor Earth-Observation VAE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
nilsleh/eo-vae reference (PyTorch/Lightning). Compute is NHWC and
MXU-friendly; parallelism is expressed via `jax.sharding` meshes; the
reference's public inference contract (`EOFluxVAE.from_pretrained`,
`reconstruct`, `encode_spatial_normalized`, ...) is preserved.

Subpackages
-----------
- ``eovax.nn``       core neural ops (blocks, dynamic conv hypernetworks,
                     distributions, latent shuffle/BN)
- ``eovax.models``   model architectures (EO-Flux VAE, SR diffusion UNet)
- ``eovax.losses``   consistency / frequency / GAN losses
- ``eovax.data``     streaming data pipelines (TerraMesh, Sen2NAIP)
- ``eovax.train``    training loops (stage 1 distill, stage 2 finetune,
                     stage 3 super-resolution)
- ``eovax.parallel`` device mesh + sharding rules
- ``eovax.kernels``  Pallas TPU kernels for hot ops + int8 serving convs
- ``eovax.serving``  StableHLO export / model-code-free serving
- ``eovax.utils``    checkpoint converters, metrics, logging, tiled
                     large-scene inference
"""

__version__ = "0.1.0"

from eovax.models.eo_flux_vae import EOFluxVAE  # noqa: F401

__all__ = ["EOFluxVAE", "__version__"]
