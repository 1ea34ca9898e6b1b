"""Stage-2 training CLI (reference: /root/reference/train.py).

Usage:
    python -m eovax.cli.train --config configs/eo-vae.yaml \
        [--distilled-ckpt distilled_final.pt] [--flux-ckpt ae.safetensors] \
        [--max-steps N] [--debug] [--synthetic-data]

Flow (train.py:65-174 parity): build encoder/decoder from config, load the
stage-1 distilled stems and/or Flux body, instantiate the consistency loss
and the TerraMesh pipeline, run the Stage-2 trainer with CSV (+ optional
W&B) logging and orbax checkpoints. `--debug` disables logging/ckpts;
`--synthetic-data` replaces TerraMesh with random batches (smoke runs on
hosts without the shards).
"""

from __future__ import annotations

import argparse
import os

from eovax.cli.common import create_experiment_dir, enable_compile_cache, snapshot_config


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="EO-VAE stage-2 training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--distilled-ckpt", default=None)
    parser.add_argument("--flux-ckpt", default=None)
    parser.add_argument("--ckpt", default=None, help="full checkpoint to resume from")
    parser.add_argument(
        "--vae-ckpt", default=None,
        help="pretrained VAE checkpoint for flow-refine mode (reference "
        "train.py:129-130: frozen VAE + fresh refiner)",
    )
    parser.add_argument(
        "--resume-dir", default=None,
        help="existing experiment dir: reuse it and auto-resume from its "
        "latest orbax checkpoint (preemption recovery)",
    )
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--synthetic-data", action="store_true")
    parser.add_argument("--precision", default="bf16-mixed")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.config import load_yaml, VAEConfig
    from eovax.core.precision import policy_from_name
    from eovax.losses.factory import build_loss_from_config
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.parallel.mesh import init_distributed
    from eovax.train.stage2 import Stage2Trainer
    from eovax.train.schedule import STAGE2_STEPS_PER_EPOCH
    from eovax.utils.logging import CSVLogger

    init_distributed()
    raw_cfg = load_yaml(args.config)
    cfg = VAEConfig.from_dict(raw_cfg)

    policy = policy_from_name(args.precision)
    if policy.conv_algorithm == "int8":
        raise SystemExit(
            f"--precision {args.precision!r} selects the inference-only "
            "int8 conv path (zero gradient through the round() "
            "quantization) — train with '32-true' or '16-mixed' and "
            "export with the quantized policy afterwards."
        )
    # training_mode routing (train.py:120-130): FluxAutoencoderKL configs
    # may request flow-refine; --distilled-ckpt without --vae-ckpt forces
    # finetune (reference train.py:126-127).
    training_mode = raw_cfg.get("model", {}).get("training_mode")
    if args.distilled_ckpt and not args.vae_ckpt:
        training_mode = "finetune"
    if training_mode == "flow-refine":
        from eovax.models.flux_autoencoder import FluxAutoencoderKL

        model = FluxAutoencoderKL(
            cfg, training_mode="flow-refine", policy=policy, seed=args.seed
        )
    else:
        model = EOFluxVAE(cfg, policy=policy, seed=args.seed)
    # Component-wise loading (train.py:75-98): Flux body, then distilled stems.
    if args.flux_ckpt:
        model.load_checkpoint(args.flux_ckpt, strict=False)
    if args.distilled_ckpt:
        model.load_checkpoint(args.distilled_ckpt)
    if args.ckpt:
        model.load_checkpoint(args.ckpt)
    if args.vae_ckpt:
        # VAE weights only; refiner trains fresh (train.py:33-62).
        model.load_checkpoint(args.vae_ckpt, strict=False)

    # Loss (+ optional GAN discriminator with encoder-stem injection,
    # train.py:105-117). Flow-refine trains the refiner only — skip the
    # (potentially discriminator/DOFA-sized) loss construction entirely.
    if training_mode == "flow-refine":
        loss_obj = discriminator = seed_disc_stem = None
    else:
        loss_cfg = raw_cfg.get("model", {}).get("loss_fn", {})
        loss_obj, discriminator, seed_disc_stem = build_loss_from_config(
            loss_cfg, cfg, policy=policy, seed=args.seed
        )

    trainer_cfg = raw_cfg.get("trainer", {})
    max_epochs = trainer_cfg.get("max_epochs", 100)
    limit_train = trainer_cfg.get("limit_train_batches", STAGE2_STEPS_PER_EPOCH)
    max_steps = args.max_steps or max_epochs * limit_train

    exp_dir = None
    logger = None
    image_logger = None
    if not args.debug:
        exp = raw_cfg.get("experiment", {})
        if args.resume_dir:
            exp_dir = args.resume_dir
            os.makedirs(exp_dir, exist_ok=True)
        else:
            exp_dir = create_experiment_dir(
                exp.get("exp_dir", "results/exps"), exp.get("experiment_name", "eo-vae")
            )
        snapshot_config(args.config, exp_dir)
        logger = CSVLogger(exp_dir)
        from eovax.utils.image_logger import ImageLogger

        image_logger = ImageLogger(exp_dir)
        wandb_cfg = raw_cfg.get("wandb")
        if wandb_cfg and wandb_cfg.get("mode", "online") != "disabled":
            from eovax.utils.logging import MultiLogger, WandbLogger

            logger = MultiLogger(
                logger,
                WandbLogger(
                    project=wandb_cfg.get("project", "eovax"),
                    entity=wandb_cfg.get("entity"),
                    config=raw_cfg,
                    mode=wandb_cfg.get("mode", "online"),
                ),
            )

    if args.synthetic_data:
        from eovax.data.synthetic import synthetic_terramesh_batches

        dm_cfg = raw_cfg.get("datamodule", {})
        mods = tuple(dm_cfg.get("modalities", ["S2L2A", "S1RTC", "S2RGB"]))
        mods = tuple(m for m in mods if m != "S1GRD")
        size = dm_cfg.get("target_size", (256, 256))
        size = (size, size) if isinstance(size, int) else tuple(size)
        train_iter = synthetic_terramesh_batches(
            batch_size=dm_cfg.get("batch_size", 16), target_size=size,
            modalities=mods, seed=args.seed,
        )
        val_factory = lambda: synthetic_terramesh_batches(  # noqa: E731
            batch_size=dm_cfg.get("eval_batch_size", 32), target_size=size,
            modalities=("S2L2A",), mode="S2L2A", seed=args.seed + 1, num_batches=10,
        )
    else:
        from eovax.data.terramesh import TerraMeshPipeline
        import jax

        dm_cfg = raw_cfg.get("datamodule", {})
        pipeline = TerraMeshPipeline(
            data_path=dm_cfg["data_path"],
            modalities=dm_cfg.get("modalities", ["S2L2A", "S1RTC", "S2RGB"]),
            batch_size=dm_cfg.get("batch_size", 16),
            eval_batch_size=dm_cfg.get("eval_batch_size", 32),
            train_collate_mode=dm_cfg.get("train_collate_mode", "random"),
            val_collate_mode=dm_cfg.get("val_collate_mode", "S2L2A"),
            normalize=dm_cfg.get("normalize", True),
            norm_scheme=dm_cfg.get("norm_scheme", "legacy"),
            target_size=tuple(dm_cfg.get("target_size", (256, 256))),
            seed=args.seed,
            num_workers=dm_cfg.get("num_workers", 4),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            # TPU-side normalize+augment: frees the host cores for decode
            # (measured 11 ms/img of numpy collate; ARCHITECTURE round-4).
            device_prep=dm_cfg.get("device_prep", False),
        )
        train_iter = pipeline.train_batches()
        val_factory = pipeline.val_batches

    if training_mode == "flow-refine":
        # Phase-3 flow refinement (autoencoder_flux.py:727-788): frozen
        # VAE, rectified-flow refiner conditioned on VAE reconstructions.
        refine_cfg = raw_cfg.get("model", {}).get("refiner", {})
        trainer = model.make_flow_refine_trainer(
            hid_channels=tuple(refine_cfg.get("hid_channels", (128, 128, 128))),
            hid_blocks=tuple(refine_cfg.get("hid_blocks", (2, 2, 2))),
            sampler_steps=refine_cfg.get("sampler_steps", 50),
            seed=args.seed,
            base_lr=cfg.base_lr,
            log_every=trainer_cfg.get("log_every_n_steps", 100),
            logger=logger,
        )
        from eovax.data.wavelengths import wavelengths_for

        wvs = wavelengths_for(
            raw_cfg.get("datamodule", {}).get("val_collate_mode", "S2L2A")
        )
        state = trainer.fit(
            trainer.refine_batches(train_iter, wvs), max_steps=max_steps
        )
        if exp_dir:
            import jax as _jax

            from eovax.utils.checkpoint import save_variables

            save_variables(
                os.path.join(exp_dir, "refiner-final.msgpack"),
                {"params": _jax.device_get(state.params)},
            )
            print(f"Saved refiner to {exp_dir}/refiner-final.msgpack")
        return

    trainer = Stage2Trainer(
        model=model,
        loss_obj=loss_obj,
        cfg=cfg,
        max_steps=max_steps,
        val_every=limit_train,
        ckpt_dir=os.path.join(exp_dir, "checkpoints") if exp_dir else None,
        ckpt_every=limit_train if exp_dir else 0,
        val_max_batches=trainer_cfg.get("limit_val_batches", 100),
        log_every=trainer_cfg.get("log_every_n_steps", 100),
        logger=logger,
        discriminator=discriminator,
        seed_disc_stem=seed_disc_stem,
        image_logger=image_logger,
        norm_scheme=raw_cfg.get("datamodule", {}).get("norm_scheme", "legacy"),
        seed=args.seed,
    )
    state = trainer.fit(train_iter, val_factory)

    if exp_dir:
        model.variables = trainer.export_variables(state)
        model.save(os.path.join(exp_dir, "eo-vae-final.msgpack"))
        print(f"Saved final model to {exp_dir}/eo-vae-final.msgpack")
        # Also publish the best-by-val/loss_rec model (the reference's
        # artifact of record: ModelCheckpoint(monitor='val/loss_rec',
        # save_top_k=1), train.py:155-162) — sr CLI does the same.
        best = trainer.restore_best()
        if best is not None:
            info = trainer._checkpointer.best_info()
            model.variables = trainer.export_variables(best)
            model.save(os.path.join(exp_dir, "eo-vae-best.msgpack"))
            print(
                f"Saved best model ({trainer.monitor}={info['metric']:.6g} "
                f"@ step {info['step']}) to {exp_dir}/eo-vae-best.msgpack"
            )


if __name__ == "__main__":
    main()
