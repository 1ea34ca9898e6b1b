from eovax.data.wavelengths import WAVELENGTHS, BAND_WAVELENGTHS  # noqa: F401
from eovax.data.normalize import (  # noqa: F401
    NORM_STATS_LEGACY,
    Normalizer,
    make_normalizer,
    normalize_image,
    unnormalize_image,
)
from eovax.data.collate import (  # noqa: F401
    apply_batch_augmentations,
    deterministic_modality_collate,
    single_modality_collate,
)
from eovax.data.synthetic import synthetic_terramesh_batches  # noqa: F401
