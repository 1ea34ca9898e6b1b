"""Functional image metrics (PSNR / SSIM / RMSE / SAM).

Replaces the torchmetrics functional calls in the reference's eval scripts
(/root/reference/eval_metric_super_res.py:10-15, 193-210). NHWC, fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rmse(pred: jax.Array, target: jax.Array) -> jax.Array:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(d * d))


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(mse(pred, target))


def spectral_angle(pred: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean spectral angle (radians) over the channel axis — torchmetrics
    SpectralAngleMapper convention."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    dot = jnp.sum(pred * target, axis=-1)
    norm = jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1)
    cos = jnp.clip(dot / (norm + eps), -1.0, 1.0)
    return jnp.mean(jnp.arccos(cos))


def ssim(
    pred: jax.Array,
    target: jax.Array,
    *,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Single-scale SSIM (gaussian window, torchmetrics algorithm).

    Eval metric, not a training loss — the gaussian blurs pin
    ``Precision.HIGHEST`` (bit-faithful fp32) so reported quality numbers
    are independent of the training-loss blur precision default
    (``eovax.losses.msssim.DEFAULT_BLUR_PRECISION``)."""
    from eovax.losses.msssim import _ssim_and_cs

    sim, _ = _ssim_and_cs(
        pred.astype(jnp.float32), target.astype(jnp.float32),
        data_range, kernel_size, sigma, k1, k2,
        precision=jax.lax.Precision.HIGHEST,
    )
    return sim.mean()
