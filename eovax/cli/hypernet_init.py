"""Standalone hypernetwork pre-initialization CLI (reference:
eo_vae/utils/hypernet_init_weights.py): distill the dynamic stems against a
*freshly initialized* static conv (random teacher), so the hypernetworks
start from a sane kernel distribution before the real stage-1 run.

Usage:
    python -m eovax.cli.hypernet_init --config model_config.yaml \
        --output hypernet_init.msgpack [--steps 1000]
"""

from __future__ import annotations

import argparse

import numpy as np

from eovax.cli.common import enable_compile_cache


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Hypernetwork pre-init")
    parser.add_argument("--config", required=True)
    parser.add_argument("--output", default="hypernet_init.msgpack")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.config import load_model_config
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.train.distill import DistillConfig, run_distillation, save_distilled_checkpoint

    cfg = load_model_config(args.config)
    model = EOFluxVAE(cfg, seed=args.seed)

    # Random teacher: kaiming-uniform conv stems, like a fresh nn.Conv2d
    # (hypernet_init_weights.py trains against t_model.weight/bias of a
    # newly constructed conv).
    g = np.random.default_rng(args.seed)
    ch = cfg.encoder.ch
    cin = cfg.encoder.in_channels
    cout = cfg.decoder.out_ch
    k = 3

    def kaiming(shape, fan_in):
        bound = float(np.sqrt(1.0 / fan_in))
        return g.uniform(-bound, bound, shape).astype(np.float32)

    teacher = {
        "encoder_weight": kaiming((ch, cin, k, k), cin * k * k),
        "encoder_bias": kaiming((ch,), cin * k * k),
        "decoder_weight": kaiming((cout, ch, k, k), ch * k * k),
        "decoder_bias": kaiming((cout,), ch * k * k),
    }
    dcfg = DistillConfig(max_steps=args.steps, lr=args.lr, log_every_n_steps=100)

    def log(step, scalars):
        print(f"[hypernet-init {step}] total={scalars['total_loss']:.3e}")

    new_vars, logs = run_distillation(model.core, model.variables, teacher, dcfg, log_fn=log)
    save_distilled_checkpoint(args.output, new_vars, dcfg, final_loss=logs["total_loss"])
    print(f"Saved pre-initialized stems to {args.output}")


if __name__ == "__main__":
    main()
