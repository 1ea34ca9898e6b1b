"""Export a trained EO-VAE to a StableHLO serving artifact.

Usage:
    python -m eovax.cli.export --config model_config.yaml --ckpt eo-vae.ckpt \
        --output artifact/ [--modalities S2L2A S2RGB] [--resolution 256]

The artifact (manifest + params.msgpack + one .stablehlo file per
function×modality) reloads via ``eovax.serving.ServedModel.load`` and
serves ``reconstruct`` / ``encode_spatial_normalized`` /
``decode_spatial_normalized`` at any batch size without the model code.
See eovax/serving/__init__.py.
"""

from __future__ import annotations

import argparse

from eovax.cli.common import enable_compile_cache


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Export EO-VAE serving artifact")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--modalities", nargs="+", default=["S2L2A"])
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument(
        "--precision", default="16-mixed",
        help="'32-true', '16-mixed' (bf16, default), or 'int8' — exports the "
        "W8A8 quantized graph (body convs on the double-rate int8 MXU)",
    )
    parser.add_argument(
        "--compact-weights", action="store_true",
        help="store float params as bf16 (halves the weights file; BN "
        "running stats stay fp32)",
    )
    parser.add_argument(
        "--calibrate-npz", default=None,
        help="int8 only: .npz with an 'images' array (NCHW, normalized "
        "units) used for percentile activation calibration — the artifact "
        "then carries static act scales instead of per-call abs-max",
    )
    parser.add_argument(
        "--calibrate-percentile", type=float, default=99.9,
        help="|activation| percentile for --calibrate-npz (default 99.9)",
    )
    parser.add_argument(
        "--sr-config", default=None,
        help="superres yaml (configs_superres/*): export the stage-3 "
        "pipeline (encode → DDIM → decode) as one StableHLO function "
        "instead of the VAE surface",
    )
    parser.add_argument(
        "--sr-ckpt", default=None,
        help="trained SR denoiser msgpack (sr-best.msgpack) for --sr-config",
    )
    parser.add_argument(
        "--sr-steps", type=int, default=50, help="sampling steps for --sr-config",
    )
    parser.add_argument(
        "--sr-sampler", default="ddim", choices=("ddim", "dpm++2m"),
        help="'ddim' (reference parity) or 'dpm++2m' (second-order "
        "multistep: comparable error at ~half the steps)",
    )
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.precision import policy_from_name
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.serving import export_model

    model = EOFluxVAE.from_config(
        args.config, args.ckpt, policy=policy_from_name(args.precision)
    )
    import jax.numpy as jnp

    if args.sr_config:
        if args.calibrate_npz:
            parser.error(
                "--calibrate-npz is not supported for the SR pipeline "
                "export (the int8 SR artifact uses dynamic abs-max "
                "activation scales)"
            )
        from eovax.cli.train_super_res import build_denoiser_from_config
        from eovax.core.config import load_yaml
        from eovax.serving.export import export_sr_pipeline

        raw = load_yaml(args.sr_config)
        denoiser, sr_params = build_denoiser_from_config(
            raw["lightning_module"], policy=model.policy
        )
        if args.sr_ckpt:
            from eovax.utils.checkpoint import load_variables

            sr_params = load_variables(args.sr_ckpt, {"params": sr_params})["params"]
        manifest = export_sr_pipeline(
            model, denoiser, sr_params, args.output,
            resolution=args.resolution, steps=args.sr_steps,
            sampler=args.sr_sampler,
            params_dtype=jnp.bfloat16 if args.compact_weights else None,
            denoiser_policy=model.policy,
        )
        q = manifest.get("quantization")
        if q:
            print(f"int8: {q['quantized_convs']} convs pre-quantized "
                  "(VAE + UNet trees)")
        print(f"exported SR pipeline ({manifest['steps']} "
              f"{manifest['sampler']} steps, {args.resolution}² LR input) "
              f"to {args.output}")
        return

    act_scales = None
    if args.calibrate_npz:
        if policy_from_name(args.precision).conv_algorithm != "int8":
            parser.error("--calibrate-npz requires --precision int8")
        import numpy as np

        from eovax.serving.export import calibrate_activations

        images = np.load(args.calibrate_npz)["images"]
        # Calibrate in small batches; a handful of representative tiles
        # pins the bulk activation range.
        bs = min(8, images.shape[0])
        batches = [images[i:i + bs] for i in range(0, images.shape[0], bs)]
        act_scales = calibrate_activations(
            model, batches, modality=args.modalities[0],
            percentile=args.calibrate_percentile,
        )
        print(f"calibrated {len(act_scales)} conv activation scales")

    manifest = export_model(
        model,
        args.output,
        modalities=tuple(args.modalities),
        resolution=args.resolution,
        params_dtype=jnp.bfloat16 if args.compact_weights else None,
        act_scales=act_scales,
    )
    n = len(manifest["functions"])
    q = manifest.get("quantization")
    if q:
        print(f"int8: {q['quantized_convs']} convs pre-quantized, "
              f"activations {q['activations']}")
    print(f"exported {n} functions to {args.output}")


if __name__ == "__main__":
    main()
