"""Checkpoint conversion CLI: torch reference formats → native msgpack.

TPU hosts don't need torch at runtime — convert once wherever torch is
available and ship the .msgpack artifact.

Usage:
    python -m eovax.cli.convert_checkpoint --config model_config.yaml \
        --input eo-vae.ckpt --output eo-vae.msgpack [--no-strict]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Convert torch checkpoints to native")
    parser.add_argument("--config", required=True)
    parser.add_argument("--input", required=True,
                        help=".safetensors / .pt distilled / .ckpt full")
    parser.add_argument("--output", required=True, help="native .msgpack path")
    parser.add_argument("--no-strict", action="store_true")
    parser.add_argument("--ignore-keys", nargs="*", default=[])
    args = parser.parse_args(argv)

    from eovax.models.eo_flux_vae import EOFluxVAE

    model = EOFluxVAE.from_config(args.config)
    model.load_checkpoint(
        args.input, ignore_keys=tuple(args.ignore_keys), strict=not args.no_strict
    )
    model.save(args.output)
    print(f"Converted {args.input} → {args.output} ({model.param_count():,} params)")


if __name__ == "__main__":
    main()
