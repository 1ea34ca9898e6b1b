"""Batch collation: modality selection, normalization, resize, D4 augment.

Re-design of single_modality_collate_fn / deterministic_modality_collate_fn
(/root/reference/eo_vae/datasets/terramesh_datamodule.py:418-577). Runs on
the host in numpy; every batch is homogeneous in modality (so ``wvs`` is a
single [C] vector) while the modality varies batch-to-batch — keeping the
device-side step shape-static per modality (at most 4 compiled variants).

Layout: emits **NHWC** — the TPU-native layout the train step consumes.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Mapping

import numpy as np

from eovax.data.normalize import make_normalizer
from eovax.data.wavelengths import WAVELENGTHS
from eovax.utils.resize import resize_nhwc


def apply_batch_augmentations(
    images: np.ndarray, rng: random.Random | None = None
) -> np.ndarray:
    """Random D4 transforms on an NHWC batch (terramesh_datamodule.py:347-369):
    H-flip, V-flip, rot90×k — one shared draw per batch."""
    r = rng or random
    if r.random() > 0.5:
        images = images[:, :, ::-1]  # horizontal (W) flip
    if r.random() > 0.5:
        images = images[:, ::-1]  # vertical (H) flip
    k = r.randint(0, 3)
    if k:
        images = np.rot90(images, k, axes=(1, 2))
    return np.ascontiguousarray(images)


def _prepare(
    images: np.ndarray,
    modality: str,
    *,
    normalize: bool,
    norm_scheme: str,
    target_size: tuple[int, int] | None,
    train: bool,
    rng: random.Random | None,
) -> dict[str, Any]:
    x = np.asarray(images, np.float32)
    if x.ndim == 3:
        x = x[None]
    if normalize:
        x = make_normalizer(modality, norm_scheme)(x)
    if target_size is not None and x.shape[1:3] != tuple(target_size):
        x = resize_nhwc(x, tuple(target_size), mode="bilinear")
    if train:
        x = apply_batch_augmentations(x, rng)
    return {
        "image": x,
        "wvs": np.asarray(WAVELENGTHS[modality], np.float32),
        "modality": modality,
    }


def single_modality_collate(
    modalities: list[str],
    *,
    normalize: bool = True,
    norm_scheme: str = "legacy",
    target_size: tuple[int, int] | None = (224, 224),
    mode: str = "train",
    return_metadata: bool = False,
    seed: int | None = None,
) -> Callable[[Mapping[str, Any]], dict[str, Any]]:
    """Pick ONE random modality per batch and prepare it."""
    rng = random.Random(seed) if seed is not None else random

    def collate(batch: Mapping[str, Any]) -> dict[str, Any]:
        if len(modalities) == 1:
            selected = modalities[0]
            images = batch["image"] if "image" in batch else batch[selected]
        else:
            available = [m for m in modalities if m in batch]
            if not available:
                raise ValueError(
                    f"None of {modalities} found in batch keys {list(batch.keys())}"
                )
            selected = rng.choice(available)
            images = batch[selected]
        out = _prepare(
            images, selected,
            normalize=normalize, norm_scheme=norm_scheme,
            target_size=target_size, train=(mode == "train"),
            rng=rng if isinstance(rng, random.Random) else None,
        )
        if return_metadata:
            for key in ("time", "lat", "lon", "crs", "grid_id", "center_lat", "center_lon"):
                if key in batch:
                    out[key] = batch[key]
        return out

    return collate


def deterministic_modality_collate(
    modality: str,
    *,
    normalize: bool = True,
    norm_scheme: str = "legacy",
    target_size: tuple[int, int] | None = (224, 224),
    mode: str = "train",
    return_metadata: bool = False,
    seed: int | None = None,
) -> Callable[[Mapping[str, Any]], dict[str, Any]]:
    """Always the same modality (validation path)."""
    rng = random.Random(seed) if seed is not None else None

    def collate(batch: Mapping[str, Any]) -> dict[str, Any]:
        images = batch[modality] if modality in batch else batch["image"]
        out = _prepare(
            images, modality,
            normalize=normalize, norm_scheme=norm_scheme,
            target_size=target_size, train=(mode == "train"), rng=rng,
        )
        if return_metadata:
            for key in ("time", "lat", "lon", "crs", "grid_id", "center_lat", "center_lon"):
                if key in batch:
                    out[key] = batch[key]
        return out

    return collate
