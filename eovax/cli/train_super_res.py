"""Stage-3 latent-SR training CLI (reference: train_super_res.py).

Usage:
    python -m eovax.cli.train_super_res --config configs_superres/eo_vae_latent.yaml \
        [--debug] [--max-steps N]
"""

from __future__ import annotations

import argparse
import os

from eovax.cli.common import create_experiment_dir, enable_compile_cache, snapshot_config


def build_denoiser_from_config(cfg: dict, *, policy=None, seed: int = 0):
    """Instantiate UNet + schedule + denoiser from a reference-format
    config block (configs_superres/eo_vae_latent.yaml:32-48)."""
    import jax
    import jax.numpy as jnp

    from eovax.core.precision import DEFAULT_POLICY
    from eovax.models.sr_diffusion import (
        DecaySchedule,
        KarrasDenoiser,
        RectifiedSchedule,
        SimpleDenoiser,
        VPSchedule,
    )
    from eovax.models.unet import UNet

    policy = policy or DEFAULT_POLICY
    den_cfg = cfg["denoiser"]
    bb = den_cfg["backbone"]
    unet = UNet(
        in_channels=bb.get("in_channels", 32),
        out_channels=bb.get("out_channels", 32),
        cond_channels=bb.get("cond_channels", 0),
        hid_channels=tuple(bb.get("hid_channels", (256, 128, 64))),
        hid_blocks=tuple(bb.get("hid_blocks", (3, 3, 3))),
        policy=policy,
    )

    sched_target = den_cfg.get("schedule", {}).get("_target_", "RectifiedSchedule")
    if "VPSchedule" in sched_target:
        schedule = VPSchedule()
    elif "DecaySchedule" in sched_target:
        schedule = DecaySchedule()
    else:
        schedule = RectifiedSchedule()

    latent = bb.get("in_channels", 32)
    x = jnp.zeros((1, 16, 16, latent))
    cond = jnp.zeros((1, 16, 16, bb.get("cond_channels", 0))) if bb.get("cond_channels") else None
    t = jnp.zeros((1,))
    params = unet.init(jax.random.PRNGKey(seed), x, t, cond)["params"]

    def apply_fn(params, x_t, t, cond=None):
        return unet.apply({"params": params}, x_t, t, cond)

    den_target = den_cfg.get("_target_", "SimpleDenoiser")
    cls = KarrasDenoiser if "Karras" in den_target else SimpleDenoiser
    return cls(apply_fn=apply_fn, schedule=schedule), params


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="EO-VAE stage-3 latent SR training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--resume-dir", default=None,
        help="existing experiment dir: reuse it and auto-resume from its "
        "latest checkpoint (preemption recovery)",
    )
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.config import load_yaml
    from eovax.data.sen2naip import Sen2NaipCrossSensorLatent
    from eovax.train.schedule import SR_STEPS_PER_EPOCH
    from eovax.train.sr import DiffusionSuperRes
    from eovax.utils.logging import CSVLogger

    raw = load_yaml(args.config)
    lm = raw["lightning_module"]
    denoiser, params = build_denoiser_from_config(lm, seed=args.seed)

    trainer_cfg = raw.get("trainer", {})
    max_epochs = trainer_cfg.get("max_epochs", 750)
    max_steps = args.max_steps or max_epochs * SR_STEPS_PER_EPOCH

    exp_dir = logger = image_logger = None
    if not args.debug:
        exp = raw.get("experiment", {})
        if args.resume_dir:
            exp_dir = args.resume_dir
            os.makedirs(exp_dir, exist_ok=True)
        else:
            exp_dir = create_experiment_dir(
                exp.get("exp_dir", "results/exps/sr"), exp.get("experiment_name", "eo-vae-sr")
            )
        snapshot_config(args.config, exp_dir)
        logger = CSVLogger(exp_dir)
        from eovax.utils.image_logger import SuperResImageLogger

        image_logger = SuperResImageLogger(exp_dir)

    dm_cfg = raw["datamodule"]
    # `_target_` selects the data space (reference pixel.yaml:50-51 vs
    # eo_vae_latent.yaml): the latent datamodule consumes encode_latents
    # npz output; the pixel baseline reads {aoi}/{lr,hr}.tif pairs via
    # Sen2NaipCrossSensor + the z-score/bicubic collate.
    dm_target = dm_cfg.get(
        "_target_", "Sen2NaipLatentCrossSensorDataModule"
    ).split(".")[-1]
    if "Latent" in dm_target:
        train_ds = Sen2NaipCrossSensorLatent(
            dm_cfg["root"], "train",
            latent_scale_factor=dm_cfg.get("latent_scale_factor", 1.0),
            normalize=dm_cfg.get("normalize", True),
        )
        val_ds = Sen2NaipCrossSensorLatent(
            dm_cfg["root"], "val",
            latent_scale_factor=dm_cfg.get("latent_scale_factor", 1.0),
            normalize=dm_cfg.get("normalize", True),
        )
    else:
        from eovax.data.sen2naip import (
            Sen2NaipCrossSensor,
            sen2naip_collate,
            sen2naip_domain_adapted_collate,
        )

        collate = (
            sen2naip_domain_adapted_collate
            if dm_cfg.get("domain_adapted") else sen2naip_collate
        )
        sizes = dict(
            lr_size=dm_cfg.get("lr_size", 128),
            hr_size=dm_cfg.get("hr_size", 512),
        )
        train_ds = Sen2NaipCrossSensor(
            dm_cfg["root"], "train", collate=collate, **sizes)
        val_ds = Sen2NaipCrossSensor(
            dm_cfg["root"], "val", collate=collate, **sizes)
    bs = dm_cfg.get("batch_size", 16)

    sampler_cfg = raw["lightning_module"].get("sampler", {})
    trainer = DiffusionSuperRes(
        denoiser=denoiser,
        init_params=params,
        sampler_steps=sampler_cfg.get("steps", 50),
        # config `_target_` selects the sampler (DDIMSampler parity
        # default; DPMSolverPlusPlus2M reaches comparable error at ~half
        # the steps — no reference counterpart).
        sampler_type=sampler_cfg.get("_target_", "ddim").split(".")[-1],
        base_lr=lm.get("base_lr", 1e-4),
        final_lr=lm.get("final_lr"),
        warmup_epochs=lm.get("warmup_epochs"),
        decay_end_epoch=lm.get("decay_end_epoch"),
        grad_clip=trainer_cfg.get("gradient_clip_val", 1.0),
        log_every=trainer_cfg.get("log_every_n_steps", 20),
        logger=logger,
        image_logger=image_logger,
        ckpt_dir=os.path.join(exp_dir, "checkpoints") if exp_dir else None,
        ckpt_every=trainer_cfg.get("ckpt_every", SR_STEPS_PER_EPOCH),
        val_max_batches=trainer_cfg.get("limit_val_batches", 10),
        seed=args.seed,
    )
    state = trainer.fit(
        train_ds.batches(bs, shuffle=True, seed=args.seed, repeat=True),
        lambda: val_ds.batches(bs),
        max_steps=max_steps,
        val_every=trainer_cfg.get("val_every", SR_STEPS_PER_EPOCH),
    )
    if exp_dir:
        from eovax.utils.checkpoint import save_variables
        import jax

        save_variables(
            os.path.join(exp_dir, "sr-final.msgpack"),
            {"params": jax.device_get(state.params)},
        )
        print(f"Saved SR model to {exp_dir}/sr-final.msgpack")
        # Also publish the best-by-val_mse params (ModelCheckpoint
        # monitor='val_mse' save_top_k=1, train_super_res.py:65-78).
        best = trainer.restore_best()
        if best is not None:
            info = trainer._checkpointer.best_info()
            save_variables(
                os.path.join(exp_dir, "sr-best.msgpack"),
                {"params": jax.device_get(best.params)},
            )
            print(
                f"Saved best SR model (val_mse={info['metric']:.6g} "
                f"@ step {info['step']}) to {exp_dir}/sr-best.msgpack"
            )


if __name__ == "__main__":
    main()
