from eovax.models.backbone import Decoder, Encoder, EOVAECore  # noqa: F401
from eovax.models.eo_flux_vae import EOFluxVAE  # noqa: F401
