"""Stage-1 weight-distillation CLI (reference: weight_distill_train.py).

Usage:
    python -m eovax.cli.weight_distill --config configs/weight_distill.yaml \
        --teacher ae.safetensors --output distilled_final.msgpack \
        [--max-steps 5000] [--lr 1e-4]
"""

from __future__ import annotations

import argparse

from eovax.cli.common import enable_compile_cache


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="EO-VAE stage-1 distillation")
    parser.add_argument("--config", required=True)
    parser.add_argument("--teacher", required=True, help="Flux ae.safetensors / ckpt")
    parser.add_argument("--output", default="distilled_final.msgpack")
    parser.add_argument("--max-steps", type=int, default=5000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.config import load_model_config
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.train.distill import (
        DistillConfig,
        load_teacher_stems,
        run_distillation,
        save_distilled_checkpoint,
    )

    # Stage 1 runs fp32-forced (weight_distill_train.py:540) — the default
    # FULL_PRECISION policy.
    model = EOFluxVAE(load_model_config(args.config), seed=args.seed)
    teacher = load_teacher_stems(args.teacher)
    cfg = DistillConfig(max_steps=args.max_steps, lr=args.lr)

    def log(step, scalars):
        msg = ", ".join(f"{k}={v:.3e}" for k, v in sorted(scalars.items()))
        print(f"[distill {step}/{cfg.max_steps}] {msg}")

    new_vars, logs = run_distillation(model.core, model.variables, teacher, cfg, log_fn=log)
    save_distilled_checkpoint(args.output, new_vars, cfg, final_loss=logs["total_loss"])
    print(f"Saved distilled stems to {args.output} (final loss {logs['total_loss']:.3e})")


if __name__ == "__main__":
    main()
