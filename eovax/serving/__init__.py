"""TPU-native model export / serving (`jax.export` + StableHLO).

The reference has no deployment story beyond pickled Lightning
checkpoints; serving its model requires the full Python stack
(torch + eo_vae + config plumbing). The TPU-native equivalent here
serializes the inference surface itself: each public function
(`reconstruct`, `encode_spatial_normalized`, `decode_spatial_normalized`)
is exported as a **StableHLO artifact** with a symbolic batch dimension,
alongside one msgpack weights file. A server (or another process, or a
future jax version — StableHLO carries compatibility guarantees) reloads
the artifact and runs it on TPU without the model code:

    from eovax.serving import export_model, ServedModel
    export_model(model, "artifact/", modalities=("S2L2A", "S2RGB"))
    served = ServedModel.load("artifact/")
    recon = served.reconstruct(x_nchw, modality="S2L2A")   # any batch size

Design notes:
- Functions are exported taking ``(params, x)`` so the ~380 MB of weights
  live once in ``params.msgpack`` instead of being baked into every
  serialized function; the loader device_puts them once and shares them.
- One function set per modality: the wavelength vector is a per-modality
  constant and the channel count changes the input signature anyway.
- The batch dimension is exported symbolically (`jax.export
  symbolic_shape`); H and W are fixed per artifact (conv padding stays
  static) — export multiple resolutions if needed.
- The public NCHW contract is preserved: the transpose rides inside the
  exported function.
"""

from eovax.serving.export import (  # noqa: F401
    ServedModel,
    calibrate_activations,
    export_model,
    export_sr_pipeline,
)
from eovax.serving.batching import MicroBatcher  # noqa: F401
from eovax.serving.server import make_server, warmup  # noqa: F401
