"""SeasoNet datamodule (legacy path; reference: /root/reference/datamodule.py).

The reference's early torchgeo-based alternative to TerraMesh: the SeasoNet
dataset with a fixed 12-band Sentinel-2 wavelength vector attached to every
sample, plus D4 augmentation. Unused by the main training flow
(SURVEY.md §2.2); kept for config compatibility and gated on torchgeo.
"""

from __future__ import annotations

import numpy as np

#: Sentinel-2 band centers for the SeasoNet band stack
#: (datamodule.py:21-24).
SEASONET_WVS = np.asarray(
    [0.66, 0.56, 0.49, 0.842, 0.705, 0.74, 0.783, 0.865, 1.61, 2.19, 0.945, 1.375],
    np.float32,
)


def make_seasonet_datamodule(root: str, batch_size: int = 8, **kwargs):
    """Build the torchgeo SeasoNet pipeline with wvs attached
    (datamodule.py:14-107). Requires torchgeo + kornia (not part of the TPU
    image); raises a clear error otherwise."""
    try:
        from torchgeo.datasets import SeasoNet  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "SeasoNet support needs torchgeo (and kornia for augmentation) — "
            "legacy path only; use the TerraMesh pipeline on TPU hosts."
        ) from exc

    from torchgeo.datasets import SeasoNet as _SeasoNet

    class SeasoNetWithWaves(_SeasoNet):
        def __getitem__(self, index):
            sample = super().__getitem__(index)
            sample["wvs"] = SEASONET_WVS.copy()
            return sample

    dataset = SeasoNetWithWaves(root=root, **kwargs)

    def batches():
        from eovax.data.collate import apply_batch_augmentations

        buf = []
        for i in range(len(dataset)):
            s = dataset[i]
            img = np.asarray(s["image"], np.float32)
            buf.append(np.transpose(img, (1, 2, 0)))
            if len(buf) == batch_size:
                images = apply_batch_augmentations(np.stack(buf))
                yield {"image": images, "wvs": SEASONET_WVS, "modality": "SeasoNet"}
                buf = []

    return batches
