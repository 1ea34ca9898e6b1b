"""Predecessor model classes kept for config/checkpoint compatibility.

- ``FluxAutoencoderKL`` — the reference's older 3-mode module
  (/root/reference/eo_vae/models/autoencoder_flux.py:57-799) with
  ``training_mode ∈ {distill, finetune, flow-refine}``. It shares the
  EOVAECore latent pipeline (same ps/bn scheme, autoencoder_flux.py:117-125)
  and the EOFluxVAE inference surface; the three modes map onto the
  framework's stage trainers:
    * distill    → eovax.train.distill (in-module distill loss,
                   autoencoder_flux.py:518-547)
    * finetune   → eovax.train.stage2 (step ≈ EOFluxVAE's,
                   autoencoder_flux.py:552-694)
    * flow-refine → a denoiser trained to refine VAE reconstructions
                   (autoencoder_flux.py:727-788), built here on the
                   in-repo diffusion stack.
- ``AutoencoderKL`` — the first-generation LDM autoencoder
  (/root/reference/eo_vae/models/autoencoder.py:22-350): static conv
  stems, classic two-optimizer GAN training. Architecturally it is the
  same backbone with ``use_dynamic_ops=False``; only stale configs use it.
"""

from __future__ import annotations

from typing import Any, Literal


from eovax.core.config import VAEConfig
from eovax.core.precision import FULL_PRECISION, Policy
from eovax.models.eo_flux_vae import EOFluxVAE


class FluxAutoencoderKL(EOFluxVAE):
    """Three-mode autoencoder module (distill / finetune / flow-refine)."""

    def __init__(
        self,
        config: VAEConfig,
        variables: dict[str, Any] | None = None,
        *,
        training_mode: Literal["distill", "finetune", "flow-refine"] = "finetune",
        policy: Policy = FULL_PRECISION,
        seed: int = 0,
    ):
        super().__init__(config, variables, policy=policy, seed=seed)
        if training_mode not in ("distill", "finetune", "flow-refine"):
            raise ValueError(f"Unknown training_mode: {training_mode}")
        self.training_mode = training_mode

    # -- mode dispatch ---------------------------------------------------------

    def make_distill_runner(self, teacher_path: str, **cfg_kwargs):
        """Stage-1 in-module distillation (autoencoder_flux.py:518-547)."""
        from eovax.train.distill import DistillConfig, load_teacher_stems, run_distillation

        teacher = load_teacher_stems(teacher_path)
        cfg = DistillConfig(**cfg_kwargs)

        def run(log_fn=None):
            new_vars, logs = run_distillation(
                self.core, self.variables, teacher, cfg, log_fn=log_fn
            )
            self.variables = new_vars
            self._jit_cache.clear()
            return logs

        return run

    def make_finetune_trainer(self, loss_obj, **trainer_kwargs):
        """Stage-2 finetune step (autoencoder_flux.py:552-694 ≈ EOFluxVAE)."""
        from eovax.train.stage2 import Stage2Trainer

        return Stage2Trainer(model=self, loss_obj=loss_obj, cfg=self.config, **trainer_kwargs)

    def make_flow_refine_trainer(
        self,
        *,
        hid_channels: tuple[int, ...] = (128, 128, 128),
        hid_blocks: tuple[int, ...] = (2, 2, 2),
        sampler_steps: int = 50,
        seed: int = 0,
        **trainer_kwargs,
    ):
        """Flow-refine mode (autoencoder_flux.py:727-788): freeze the VAE and
        train a rectified-flow denoiser conditioned on the VAE
        reconstruction to produce the refined image."""
        from eovax.cli.train_super_res import build_denoiser_from_config
        from eovax.train.sr import DiffusionSuperRes

        c = self.config.decoder.out_ch
        denoiser, params = build_denoiser_from_config(
            {
                "denoiser": {
                    "_target_": "SimpleDenoiser",
                    "backbone": {
                        "in_channels": c,
                        "out_channels": c,
                        "cond_channels": c,
                        "hid_channels": list(hid_channels),
                        "hid_blocks": list(hid_blocks),
                    },
                    "schedule": {"_target_": "RectifiedSchedule"},
                }
            },
            policy=self.policy,
            seed=seed,
        )
        trainer = DiffusionSuperRes(
            denoiser=denoiser, init_params=params, sampler_steps=sampler_steps,
            **trainer_kwargs,
        )

        vae = self

        def refine_batches(batches, wvs):
            """Adapt image batches → (cond=VAE recon, target=image) pairs."""
            import numpy as np

            for batch in batches:
                x = batch["image"]
                recon = np.asarray(
                    vae.reconstruct(np.transpose(x, (0, 3, 1, 2)), batch.get("wvs", wvs))
                )
                yield {
                    "image_hr": x,
                    "image_lr": np.transpose(recon, (0, 2, 3, 1)),
                }

        trainer.refine_batches = refine_batches
        return trainer


class AutoencoderKL(EOFluxVAE):
    """Legacy LDM autoencoder: static stems, classic GAN finetuning
    (autoencoder.py:22-232). The SD-VAE checkpoint auto-download of the
    reference (autoencoder.py:25-102) maps to ``load_checkpoint`` on a
    locally fetched file."""

    def __init__(
        self,
        config: VAEConfig | None = None,
        variables: dict[str, Any] | None = None,
        *,
        embed_dim: int = 4,
        policy: Policy = FULL_PRECISION,
        seed: int = 0,
    ):
        if config is None:
            from eovax.core.config import DecoderConfig, EncoderConfig

            config = VAEConfig(
                encoder=EncoderConfig(
                    z_channels=embed_dim, use_dynamic_ops=False, stem=None
                ),
                decoder=DecoderConfig(
                    z_channels=embed_dim, use_dynamic_ops=False, stem=None
                ),
            )
        if config.encoder.use_dynamic_ops or config.decoder.use_dynamic_ops:
            raise ValueError("AutoencoderKL is the static-stem legacy model")
        super().__init__(config, variables, policy=policy, seed=seed)

    def make_gan_trainer(self, loss_obj, discriminator, **trainer_kwargs):
        """Two-optimizer GAN training (autoencoder.py:154-232) via the
        Stage-2 adversarial alternation."""
        from eovax.train.stage2 import Stage2Trainer

        return Stage2Trainer(
            model=self, loss_obj=loss_obj, cfg=self.config,
            discriminator=discriminator, **trainer_kwargs,
        )
