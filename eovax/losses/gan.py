"""Adversarial losses + discriminators (NHWC flax).

Re-design of the reference's GAN stack:
- hinge/vanilla d/g losses (loss_utils.py:14-30)
- DynamicPatchGAN — spectral-norm PatchGAN with a wavelength-dynamic input
  stem (consistency_loss.py:43-96)
- NLayerDiscriminator — Pix2Pix PatchGAN with DynamicConv input
  (loss_utils.py:180-269)
- EOPatchLoss — L1 + MS-SSIM + hinge GAN with adaptive weighting
  (consistency_loss.py:99-183)
- EOGenerativeLoss — L1 + FFL + LPIPS + GAN (loss_functions.py:13-169)

Adaptive weighting: the reference differentiates w.r.t. the decoder's
*generated* output kernel (a non-leaf tensor, consistency_loss.py:178-183).
Functionally: recon = conv(h_pre, kernel) + bias with h_pre the decoder
penultimate, so we re-express both losses as closures over the kernel and
take `jax.grad` (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.precision import FULL_PRECISION, Policy
from eovax.losses.msssim import msssim_loss
from eovax.nn.dynamic_conv import DynamicConv

# ---------------------------------------------------------------------------
# Basic GAN objectives
# ---------------------------------------------------------------------------


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def vanilla_g_loss(logits_fake: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.softplus(-logits_fake))


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


def _instance_norm(name: str):
    # torch InstanceNorm2d default: affine=False, eps=1e-5; == per-channel GN.
    return lambda x: nn.GroupNorm(
        num_groups=x.shape[-1], epsilon=1e-5, use_bias=False, use_scale=False,
        name=name, dtype=jnp.float32,
    )(x)


class DynamicPatchGAN(nn.Module):
    """Spectral-norm PatchGAN over a wavelength-dynamic input stem.

    The reference re-uses the VAE encoder's DynamicConv generator as the
    input stem (train.py:109-117 injects it); here the stem is an owned
    DynamicConv with the same hyperparameters — its weights can be seeded
    from the encoder stem via the checkpoint converter.
    """

    ndf: int = 128
    n_layers: int = 3
    wv_planes: int = 128
    stem_num_layers: int = 1
    stem_num_heads: int = 4
    stem_generator_type: str = "transformer"
    stem_rank_ratio: int = 4
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array, wvs: jax.Array, *, update_sn: bool = False) -> jax.Array:
        p = self.policy
        h = DynamicConv(
            wv_planes=self.wv_planes, embed_dim=self.ndf,
            num_layers=self.stem_num_layers, num_heads=self.stem_num_heads,
            generator_type=self.stem_generator_type,
            rank_ratio=self.stem_rank_ratio,
            policy=p, name="dynamic_input",
        )(x, wvs)

        def sn_conv(h, feats, stride, use_bias, name):
            conv = nn.Conv(
                feats, (4, 4), strides=(stride, stride), padding=((1, 1), (1, 1)),
                use_bias=use_bias, dtype=p.compute_dtype, param_dtype=p.param_dtype,
                precision=p.precision, name=name,
            )
            sn = nn.SpectralNorm(conv, collection_name="spectral_stats")
            return sn(h, update_stats=update_sn)

        h = sn_conv(h, self.ndf, 2, True, "block_0")
        h = jax.nn.leaky_relu(h, 0.2)
        curr = self.ndf
        for i in range(1, self.n_layers):
            curr = min(self.ndf * (2**i), 512)
            h = sn_conv(h, curr, 2, False, f"block_{i}")
            h = _instance_norm(f"inorm_{i}")(h).astype(p.compute_dtype)
            h = jax.nn.leaky_relu(h, 0.2)
        return sn_conv(h, 1, 1, True, "final")


class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN (kw=4) with a DynamicConv input stem mapping any
    channel count to ``input_nc`` (loss_utils.py:180-269)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        p = self.policy
        h = DynamicConv(
            wv_planes=128, embed_dim=self.input_nc, num_layers=1,
            policy=p, name="conv_in",
        )(x, wvs)

        def conv(h, feats, stride, use_bias, name):
            return nn.Conv(
                feats, (4, 4), strides=(stride, stride), padding=((1, 1), (1, 1)),
                use_bias=use_bias, dtype=p.compute_dtype,
                param_dtype=p.param_dtype, precision=p.precision, name=name,
            )(h)

        h = jax.nn.leaky_relu(conv(h, self.ndf, 2, True, "layer_0"), 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = conv(h, self.ndf * nf, 2, False, f"layer_{n}")
            h = _instance_norm(f"inorm_{n}")(h).astype(p.compute_dtype)
            h = jax.nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = conv(h, self.ndf * nf, 1, False, f"layer_{self.n_layers}")
        h = _instance_norm(f"inorm_{self.n_layers}")(h).astype(p.compute_dtype)
        h = jax.nn.leaky_relu(h, 0.2)
        return conv(h, 1, 1, True, "final")


# ---------------------------------------------------------------------------
# Adaptive weighting
# ---------------------------------------------------------------------------


def adaptive_weight(
    rec_loss_of_kernel, g_loss_of_kernel, kernel: jax.Array,
    *, eps: float = 1e-4, max_weight: float = 2.0,
) -> jax.Array:
    """‖∂rec/∂kernel‖ / (‖∂gan/∂kernel‖ + eps), clamped — the reference's
    calculate_adaptive_weight over the generated output kernel."""
    rec_g = jax.grad(rec_loss_of_kernel)(kernel)
    gan_g = jax.grad(g_loss_of_kernel)(kernel)
    w = jnp.linalg.norm(rec_g.reshape(-1)) / (jnp.linalg.norm(gan_g.reshape(-1)) + eps)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, max_weight))


def robust_normalize(x: jax.Array, clip_val: float = 3.0) -> jax.Array:
    """Clamp ±clip then map to [-1, 1] (loss_functions.py:70-76)."""
    return jnp.clip(x, -clip_val, clip_val) / clip_val


# ---------------------------------------------------------------------------
# Composite adversarial losses
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EOPatchLoss:
    """L1 + MS-SSIM + hinge GAN with adaptive weighting
    (consistency_loss.py:99-183). Functional: discriminator apply fns and
    params are passed in; reconstruction closures enable kernel-space
    adaptive weighting."""

    disc_apply: Any  # fn(disc_vars, x, wvs) -> logits
    disc_start: int = 10000
    disc_weight: float = 0.5
    ssim_weight: float = 0.2

    def generator_loss(
        self,
        disc_vars,
        inputs: jax.Array,
        wvs: jax.Array,
        reconstructions: jax.Array,
        *,
        global_step,
        kernel_closure=None,  # (recon_fn(kernel), kernel) for adaptive weight
        split: str = "train",
    ):
        recon = jnp.clip(reconstructions, -2.5, 5.0)
        rec_loss = jnp.mean(jnp.abs(recon - inputs))
        ssim = (
            msssim_loss(recon, inputs)
            if self.ssim_weight > 0
            else jnp.asarray(0.0)
        )

        use_gan = (jnp.asarray(global_step) >= self.disc_start).astype(jnp.float32)
        logits_fake = self.disc_apply(disc_vars, recon, wvs)
        g_loss = -jnp.mean(logits_fake)

        weight = jnp.asarray(1.0)
        if kernel_closure is not None:
            recon_fn, kernel = kernel_closure
            weight = adaptive_weight(
                lambda k: jnp.mean(jnp.abs(jnp.clip(recon_fn(k), -2.5, 5.0) - inputs)),
                lambda k: -jnp.mean(
                    self.disc_apply(disc_vars, jnp.clip(recon_fn(k), -2.5, 5.0), wvs)
                ),
                kernel,
                eps=1e-4,
                max_weight=2.0,
            )
        g_term = use_gan * weight * g_loss

        total = rec_loss + self.disc_weight * g_term + self.ssim_weight * ssim
        logs = {
            f"{split}/loss_rec": rec_loss,
            f"{split}/loss_g": g_term,
            f"{split}/disc_weight": use_gan * weight,
            f"{split}/loss_msssim": ssim,
            f"{split}/logits_fake_g": use_gan * jnp.mean(logits_fake),
        }
        return total, logs

    def discriminator_loss(
        self, disc_vars, inputs, wvs, reconstructions, *, split: str = "train"
    ):
        recon = jax.lax.stop_gradient(jnp.clip(reconstructions, -2.5, 5.0))
        logits_real = self.disc_apply(disc_vars, jax.lax.stop_gradient(inputs), wvs)
        logits_fake = self.disc_apply(disc_vars, recon, wvs)
        d_loss = hinge_d_loss(logits_real, logits_fake)
        return d_loss, {
            f"{split}/loss_disc": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake_d": jnp.mean(logits_fake),
        }


@dataclasses.dataclass(frozen=True)
class EOGenerativeLoss:
    """L1 + optional FFL + DOFA-LPIPS + GAN (loss_functions.py:13-169)."""

    disc_apply: Any  # fn(disc_vars, x, wvs) -> logits
    lpips_apply: Any | None = None  # fn(inputs, recon, wvs) -> scalar
    perceptual_weight: float = 1.0
    disc_weight: float = 0.75
    gan_start_step: int = 0
    disc_update_start_step: int = 0
    max_d_weight: float = 1e4
    disc_loss_type: str = "hinge"
    focal_loss_weight: float = 0.0
    focal_loss_alpha: float = 0.0

    def generator_loss(
        self, disc_vars, inputs, wvs, reconstructions, *, global_step,
        kernel_closure=None, split: str = "train",
    ):
        from eovax.losses.ffl import focal_frequency_loss

        rec_loss = jnp.mean(jnp.abs(reconstructions - inputs))
        if self.focal_loss_weight > 0.0:
            rec_loss = rec_loss + focal_frequency_loss(
                reconstructions, inputs,
                loss_weight=self.focal_loss_weight, alpha=self.focal_loss_alpha,
            )
        p_loss = jnp.asarray(0.0)
        if self.perceptual_weight > 0.0 and self.lpips_apply is not None:
            p_loss = self.lpips_apply(inputs, reconstructions, wvs)
            rec_loss = rec_loss + self.perceptual_weight * p_loss

        use_gan = (
            (jnp.asarray(global_step) >= self.gan_start_step).astype(jnp.float32)
            * float(self.disc_weight > 0.0)
        )
        normed = robust_normalize(reconstructions)
        logits_fake = self.disc_apply(disc_vars, normed, wvs)
        g_loss = vanilla_g_loss(logits_fake)

        d_weight = jnp.asarray(1.0)
        if kernel_closure is not None:
            recon_fn, kernel = kernel_closure

            def rec_closure(k):
                # The reference's d_weight differentiates the FULL rec
                # loss — L1 + FFL + weighted LPIPS (loss_functions.py:
                # 100-125) — not L1 alone; LPIPS typically dominates the
                # gradient norm, so omitting it skews the GAN balance.
                r = recon_fn(k)
                loss = jnp.mean(jnp.abs(r - inputs))
                if self.focal_loss_weight > 0.0:
                    loss = loss + focal_frequency_loss(
                        r, inputs, loss_weight=self.focal_loss_weight,
                        alpha=self.focal_loss_alpha,
                    )
                if self.perceptual_weight > 0.0 and self.lpips_apply is not None:
                    loss = loss + self.perceptual_weight * self.lpips_apply(
                        inputs, r, wvs
                    )
                return loss

            d_weight = adaptive_weight(
                rec_closure,
                lambda k: vanilla_g_loss(
                    self.disc_apply(disc_vars, robust_normalize(recon_fn(k)), wvs)
                ),
                kernel,
                eps=1e-6,
                max_weight=self.max_d_weight,
            )
        total = rec_loss + use_gan * d_weight * self.disc_weight * g_loss
        return total, {
            f"{split}/loss_total": total,
            f"{split}/loss_rec": rec_loss,
            f"{split}/loss_lpips": p_loss,
            f"{split}/loss_gan": use_gan * g_loss,
            f"{split}/d_weight": use_gan * d_weight,
        }

    def discriminator_loss(
        self, disc_vars, inputs, wvs, reconstructions, *, split: str = "train"
    ):
        fn = hinge_d_loss if self.disc_loss_type == "hinge" else vanilla_d_loss
        # Reference quirk, replicated deliberately: the discriminator
        # branch feeds RAW detached recon + raw inputs
        # (loss_functions.py:150-153), while the GENERATOR branch
        # robust-normalizes recon before the disc (:120-121) — the disc
        # trains on a different input distribution than the one the
        # generator's adversarial term is scored on. Asymmetric, but it
        # is the reference's behavior and the composed golden
        # (tests/test_gan_golden.py) pins it.
        fake = jax.lax.stop_gradient(reconstructions)
        real = jax.lax.stop_gradient(inputs)
        logits_fake = self.disc_apply(disc_vars, fake, wvs)
        logits_real = self.disc_apply(disc_vars, real, wvs)
        d_loss = fn(logits_real, logits_fake)
        return d_loss, {
            f"{split}/loss_disc": d_loss,
            f"{split}/logits_real": jnp.mean(logits_real),
            f"{split}/logits_fake": jnp.mean(logits_fake),
        }
