"""Distilled-stem vs teacher comparison CLI (reference:
compare_weight_distill.py): loads distilled stems + the Flux teacher,
queries the generators at the RGB wavelengths, and reports per-tensor
MSE/MAE/max-error plus cosine similarity.

Usage:
    python -m eovax.cli.compare_weight_distill --config model_config.yaml \
        --distilled distilled_final.msgpack --teacher ae.safetensors
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from eovax.cli.common import enable_compile_cache


def compare(model, teacher: dict, rgb_wvs) -> dict:
    import jax.numpy as jnp

    wvs = jnp.asarray(rgb_wvs, jnp.float32)
    out = {}
    pairs = [
        ("encoder", lambda c, w: c.encoder.conv_in.get_distillation_weight(w),
         "encoder_weight", "encoder_bias"),
        ("decoder", lambda c, w: c.decoder.conv_out.get_distillation_weight(w),
         "decoder_weight", "decoder_bias"),
    ]
    for name, method, wkey, bkey in pairs:
        sw, sb = model.core.apply(model.variables, wvs, method=method)
        sw, sb = np.asarray(sw), np.asarray(sb)
        tw, tb = teacher[wkey], teacher[bkey]
        cos = float(
            np.dot(sw.ravel(), tw.ravel())
            / (np.linalg.norm(sw) * np.linalg.norm(tw) + 1e-12)
        )
        out[name] = {
            "weight_mse": float(np.mean((sw - tw) ** 2)),
            "weight_mae": float(np.mean(np.abs(sw - tw))),
            "weight_max_err": float(np.max(np.abs(sw - tw))),
            "weight_cosine": cos,
            "bias_mse": float(np.mean((sb - tb) ** 2)),
        }
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Compare distilled stems vs teacher")
    parser.add_argument("--config", required=True)
    parser.add_argument("--distilled", required=True)
    parser.add_argument("--teacher", required=True)
    parser.add_argument(
        "--rgb-wavelengths", nargs=3, type=float, default=[0.665, 0.560, 0.490]
    )
    args = parser.parse_args(argv)

    enable_compile_cache()

    from eovax.core.config import load_model_config
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.train.distill import load_distilled_checkpoint, load_teacher_stems

    model = EOFluxVAE(load_model_config(args.config))
    if args.distilled.endswith((".msgpack", ".eovax")):
        model.variables = load_distilled_checkpoint(args.distilled, model.variables)
    else:
        model.load_checkpoint(args.distilled)
    teacher = load_teacher_stems(args.teacher)
    print(json.dumps(compare(model, teacher, args.rgb_wavelengths), indent=2))


if __name__ == "__main__":
    main()
