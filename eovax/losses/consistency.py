"""EO consistency loss — the stage-2 training objective.

Re-design of EOConsistencyLoss
(/root/reference/eo_vae/models/modules/consistency_loss.py:329-483):
weighted sum of pixel (L1/Charbonnier), spectral-angle (SAM), gradient
difference, focal-frequency (with 1000-step linear warm-in), MS-SSIM, and
optional DOFA feature terms, each gated by a per-term start step.

Shipped config: Charbonnier + MS-SSIM (start step 2000)
(/root/reference/configs/eo-vae.yaml:26-31). No KL term — the "VAE" trains
as a regularized AE (SURVEY.md §2.1).

Functional: a frozen dataclass whose ``__call__(inputs, wvs, recon,
global_step)`` returns (scalar, logs). ``global_step`` is a traced scalar,
so one compiled train step serves every step — start-step gates are
``jnp.where`` masks, not Python branches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from eovax.losses.ffl import focal_frequency_loss
from eovax.losses.msssim import msssim_loss


def charbonnier_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-3) -> jax.Array:
    """sqrt(diff² + eps²) mean (consistency_loss.py:12-21)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def sam_loss(pred: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """1 − spectral cosine similarity over the channel axis
    (consistency_loss.py:186-209). NHWC: channel is last."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    dot = jnp.sum(pred * target, axis=-1)
    norm = jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1)
    return jnp.mean(1.0 - dot / (norm + eps))


def gradient_difference_loss(
    pred: jax.Array, target: jax.Array, alpha: float = 1.0
) -> jax.Array:
    """|∇pred| vs |∇target| magnitude matching (consistency_loss.py:243-269).
    NHWC: H is axis 1, W is axis 2."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    p_dy = jnp.abs(pred[:, 1:] - pred[:, :-1])
    t_dy = jnp.abs(target[:, 1:] - target[:, :-1])
    p_dx = jnp.abs(pred[:, :, 1:] - pred[:, :, :-1])
    t_dx = jnp.abs(target[:, :, 1:] - target[:, :, :-1])
    loss_y = jnp.abs(p_dy - t_dy) ** alpha
    loss_x = jnp.abs(p_dx - t_dx) ** alpha
    return loss_x.mean() + loss_y.mean()


def berhu_loss(pred: jax.Array, target: jax.Array, threshold: float = 0.2) -> jax.Array:
    """Reverse-Huber: L1 below the threshold, smooth L2 above
    (consistency_loss.py:212-240)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    l2 = (diff * diff + threshold * threshold) / (2.0 * threshold)
    return jnp.mean(jnp.where(diff <= threshold, diff, l2))


_SOBEL_X = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = jnp.asarray([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)


def spatial_gradient_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Sobel edge L1 (consistency_loss.py:272-301)."""

    def grads(x):
        x = x.astype(jnp.float32)
        c = x.shape[-1]
        kx = jnp.tile(_SOBEL_X[:, :, None, None], (1, 1, 1, c))
        ky = jnp.tile(_SOBEL_Y[:, :, None, None], (1, 1, 1, c))
        dn = ("NHWC", "HWIO", "NHWC")
        hi = jax.lax.Precision.HIGHEST
        gx = jax.lax.conv_general_dilated(
            x, kx, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            feature_group_count=c, precision=hi,
        )
        gy = jax.lax.conv_general_dilated(
            x, ky, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            feature_group_count=c, precision=hi,
        )
        return gx, gy

    px, py = grads(pred)
    tx, ty = grads(target)
    return jnp.mean(jnp.abs(px - tx)) + jnp.mean(jnp.abs(py - ty))


@dataclasses.dataclass(frozen=True)
class EOConsistencyLoss:
    """Configurable multi-term reconstruction loss (NHWC inputs)."""

    pixel_weight: float = 1.0
    rec_loss_type: str = "l1"  # 'l1' | 'char'
    spectral_weight: float = 0.0
    spatial_weight: float = 0.0
    freq_weight: float = 0.0
    feature_weight: float = 0.0
    msssim_weight: float = 0.0
    spectral_start_step: int = 0
    spatial_start_step: int = 0
    freq_start_step: int = 0
    feature_start_step: int = 0
    msssim_start_step: int = 0
    patch_factor: int = 2
    ffl_alpha: float = 1.0
    freq_warmup_steps: int = 1000  # hard-coded 1000 in consistency_loss.py:447
    # Optional frozen feature net: fn(x, wvs) -> list of feature maps.
    dofa_features: Callable[[jax.Array, jax.Array], list[jax.Array]] | None = None

    def __call__(
        self,
        inputs: jax.Array,
        wvs: jax.Array,
        reconstructions: jax.Array,
        *,
        global_step: jax.Array | int = 0,
        split: str = "train",
    ) -> tuple[jax.Array, dict[str, Any]]:
        logs: dict[str, Any] = {}
        step = jnp.asarray(global_step, jnp.float32)
        total = jnp.asarray(0.0, jnp.float32)

        def gate(start: int) -> jax.Array:
            return (step >= start).astype(jnp.float32)

        if self.pixel_weight > 0:
            if self.rec_loss_type == "l1":
                l_rec = l1_loss(reconstructions, inputs)
            elif self.rec_loss_type == "char":
                l_rec = charbonnier_loss(reconstructions, inputs)
            else:
                raise ValueError("rec_loss_type must be 'l1' or 'char'")
            total = total + self.pixel_weight * l_rec
            logs[f"{split}/loss_rec"] = l_rec

        if self.spectral_weight > 0:
            l_sam = sam_loss(reconstructions, inputs)
            total = total + self.spectral_weight * gate(self.spectral_start_step) * l_sam
            logs[f"{split}/loss_spectral"] = l_sam

        if self.spatial_weight > 0:
            l_spat = gradient_difference_loss(reconstructions, inputs)
            total = total + self.spatial_weight * gate(self.spatial_start_step) * l_spat
            logs[f"{split}/loss_spatial"] = l_spat

        if self.freq_weight > 0:
            l_freq = focal_frequency_loss(
                reconstructions,
                inputs,
                alpha=self.ffl_alpha,
                patch_factor=self.patch_factor,
                ave_spectrum=False,
                batch_matrix=True,
                log_matrix=True,
            )
            # Linear warm-in over `freq_warmup_steps` after the start step
            # (consistency_loss.py:440-466).
            warm = jnp.clip((step - self.freq_start_step) / self.freq_warmup_steps, 0.0, 1.0)
            w = self.freq_weight * warm * gate(self.freq_start_step)
            total = total + w * l_freq
            logs[f"{split}/loss_freq_raw"] = l_freq
            logs[f"{split}/ffl_weight"] = w

        if self.msssim_weight > 0:
            l_ms = msssim_loss(reconstructions, inputs)
            total = total + self.msssim_weight * gate(self.msssim_start_step) * l_ms
            logs[f"{split}/loss_msssim"] = l_ms

        if self.feature_weight > 0:
            if self.dofa_features is None:
                raise ValueError("feature_weight > 0 requires a dofa_features fn")
            f_in = jax.lax.stop_gradient(self.dofa_features(inputs, wvs))
            f_rec = self.dofa_features(reconstructions, wvs)
            l_feat = jnp.asarray(0.0, jnp.float32)
            for fi, fr in zip(f_in, f_rec):
                # axis=1: the reference's F.cosine_similarity(fi, fr, dim=1)
                # normalizes over the TOKEN axis of [B, N, D] features
                # (consistency_loss.py:323-325), not the feature axis.
                num = jnp.sum(fi * fr, axis=1)
                den = jnp.linalg.norm(fi, axis=1) * jnp.linalg.norm(fr, axis=1) + 1e-8
                l_feat = l_feat + jnp.mean(1.0 - num / den)
            total = total + self.feature_weight * gate(self.feature_start_step) * l_feat
            logs[f"{split}/loss_feature"] = l_feat

        logs[f"{split}/loss_total"] = total
        return total, logs

    @classmethod
    def from_dict(cls, d: dict) -> "EOConsistencyLoss":
        d = dict(d)
        target = d.pop("_target_", None)
        if target is not None and not target.endswith("EOConsistencyLoss"):
            raise ValueError(f"Unknown loss _target_: {target}")
        return cls(**d)
