"""Focal Frequency Loss (fp32 FFT island).

Re-design of the vendored torch implementation
(/root/reference/eo_vae/models/modules/ffl.py:17-102): patch-unfold →
orthonormal 2-D FFT in forced fp32 → log-scaled, batch-max-normalized
spectrum-distance weight matrix (stop-gradient) × squared frequency
distance. NaN/inf guards preserved.

On TPU the FFT runs in fp32 regardless of the surrounding compute policy
(bf16 FFT is unsupported/inaccurate); XLA fuses the elementwise tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_patch_freq(x: jax.Array, patch_factor: int) -> jax.Array:
    """[B,H,W,C] → fp32 FFT stack [B, P, C, h, w, 2] (real/imag last)."""
    x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    ph, pw = h // patch_factor, w // patch_factor
    # Unfold into patch_factor² non-overlapping patches (ffl.py:45-48).
    x = x.reshape(b, patch_factor, ph, patch_factor, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, pf, pf, C, ph, pw]
    x = x.reshape(b, patch_factor * patch_factor, c, ph, pw)
    freq = jnp.fft.fft2(x, norm="ortho")
    freq = jnp.stack([freq.real, freq.imag], axis=-1)
    return jnp.nan_to_num(freq, nan=0.0, posinf=1e6, neginf=-1e6)


def focal_frequency_loss(
    pred: jax.Array,
    target: jax.Array,
    *,
    loss_weight: float = 1.0,
    alpha: float = 1.0,
    patch_factor: int = 1,
    ave_spectrum: bool = False,
    log_matrix: bool = False,
    batch_matrix: bool = False,
    matrix: jax.Array | None = None,
) -> jax.Array:
    """Focal frequency loss over NHWC batches → scalar."""
    pred_freq = _to_patch_freq(pred, patch_factor)
    target_freq = _to_patch_freq(target, patch_factor)

    if ave_spectrum:
        pred_freq = pred_freq.mean(axis=0, keepdims=True)
        target_freq = target_freq.mean(axis=0, keepdims=True)

    diff_sq = (pred_freq - target_freq) ** 2
    freq_distance = diff_sq[..., 0] + diff_sq[..., 1]

    if matrix is not None:
        weight_matrix = jax.lax.stop_gradient(matrix)
    else:
        m = jnp.sqrt(freq_distance + 1e-8) ** alpha
        if log_matrix:
            m = jnp.log1p(m)
        if batch_matrix:
            max_val = m.max()
        else:
            max_val = m.reshape(*m.shape[:3], -1).max(axis=-1)[..., None, None]
        max_val = jnp.where(jnp.isfinite(max_val) & (max_val > 0), max_val, 1.0)
        weight_matrix = jax.lax.stop_gradient(jnp.clip(m / max_val, 0.0, 1.0))

    return jnp.mean(weight_matrix * freq_distance) * loss_weight
