"""Minimal usage example (reference: example.py — which is stale there;
this one runs).

Builds the flagship EO-VAE from a config dict, reconstructs a random S2RGB
patch, and round-trips the normalized spatial latent.
"""

import os
import sys

import numpy as np

if __package__ in (None, ""):  # `python examples/example.py` from anywhere
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eovax import EOFluxVAE
from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
from eovax.data.wavelengths import wavelengths_for


def main() -> None:
    stem = StemConfig(num_layers=4, wv_planes=256)
    config = VAEConfig(
        encoder=EncoderConfig(stem=stem),   # shipped eo-vae.yaml architecture
        decoder=DecoderConfig(stem=stem),
    )
    model = EOFluxVAE(config)  # random init; use .from_pretrained / .from_config for weights
    print(f"parameters: {model.param_count():,}")

    wvs = wavelengths_for("S2RGB")
    x = np.random.default_rng(0).standard_normal((1, 3, 256, 256)).astype(np.float32)

    recon = model.reconstruct(x, wvs)
    print("reconstruction:", recon.shape)

    latent = model.encode_spatial_normalized(x, wvs)
    print("spatial latent:", latent.shape)  # [1, 32, 32, 32]

    back = model.decode_spatial_normalized(latent, wvs)
    print("decoded:", back.shape)


if __name__ == "__main__":
    main()
