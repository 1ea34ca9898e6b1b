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


def _roll_d4(rng: random.Random | None, square: bool) -> np.ndarray:
    """One (flip_h, flip_v, rot_k) draw — SAME rng consumption order as
    apply_batch_augmentations so host and device paths share the stream."""
    r = rng or random
    fh = int(r.random() > 0.5)
    fv = int(r.random() > 0.5)
    k = r.randint(0, 3)
    return np.asarray([fh, fv, k if square else 0], np.int32)


def _prepare(
    images: np.ndarray,
    modality: str,
    *,
    normalize: bool,
    norm_scheme: str,
    target_size: tuple[int, int] | None,
    train: bool,
    rng: random.Random | None,
    device_prep: bool = False,
) -> dict[str, Any]:
    x = np.asarray(images)
    if x.ndim == 3:
        x = x[None]
    if device_prep:
        # Emit the raw decoded batch + tiny descriptors; normalize and D4
        # run on-device (eovax.data.device_prep — measured 11 ms/img of
        # single-core numpy moved to ~100 µs of HBM traffic per batch).
        if target_size is not None and x.shape[1:3] != tuple(target_size):
            x = resize_nhwc(
                np.asarray(x, np.float32), tuple(target_size), mode="bilinear"
            )
        n = make_normalizer(modality, norm_scheme)
        clip = n.clip if n.clip is not None else (-np.inf, np.inf)
        if not normalize:
            mean = np.zeros(x.shape[-1], np.float32)
            std = np.ones(x.shape[-1], np.float32)
            clip = (-np.inf, np.inf)
        else:
            mean, std = n.mean, n.std + n.eps
        square = x.shape[1] == x.shape[2]
        return {
            "image": x,
            "wvs": np.asarray(WAVELENGTHS[modality], np.float32),
            "modality": modality,
            "norm_mean": np.asarray(mean, np.float32),
            "norm_std": np.asarray(std, np.float32),
            "norm_clip": np.asarray(clip, np.float32),
            "d4": _roll_d4(rng, square) if train else np.zeros(3, np.int32),
        }
    x = np.asarray(x, np.float32)
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
    device_prep: bool = False,
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
            device_prep=device_prep,
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
    device_prep: bool = False,
) -> Callable[[Mapping[str, Any]], dict[str, Any]]:
    """Always the same modality (validation path)."""
    rng = random.Random(seed) if seed is not None else None

    def collate(batch: Mapping[str, Any]) -> dict[str, Any]:
        images = batch[modality] if modality in batch else batch["image"]
        out = _prepare(
            images, modality,
            normalize=normalize, norm_scheme=norm_scheme,
            target_size=target_size, train=(mode == "train"), rng=rng,
            device_prep=device_prep,
        )
        if return_metadata:
            for key in ("time", "lat", "lon", "crs", "grid_id", "center_lat", "center_lon"):
                if key in batch:
                    out[key] = batch[key]
        return out

    return collate
