"""int8 serving ablation: where does 1.83x-per-conv become 1.16x end-to-end?

The round-2 microbenchmark measured the W8A8 conv at 319 TF/s (1.83x
bf16) at 64^2*512ch — the HEALTHY shape class. End-to-end int8
reconstruct is only 253 vs 218 imgs/s (1.16x). Rows (slope method,
eovax/utils/slopetime.py):

  1. per-shape-class conv3x3 fwd: bf16 vs int8 vs int8-prequant, with
     MFU — the 256^2/128 class sits on a 63-65% bf16 lane/fusion floor
     (ARCHITECTURE round-4 train ablation); does int8 clear it or sink
     below it?
  2. activation-quantize overhead per shape (the extra VPU reduction +
     int8 write pass of dynamic abs-max);
  3. full reconstruct bf16 vs int8 vs int8-prequant composition check.

Run from /root/repo:  python scripts/ablate_int8.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# PYTHONPATH breaks the axon tunnel plugin on this host — sys.path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFS = 197.0
PEAK_INT8_TFS = 394.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eovax_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eovax.kernels.qconv import (
        int8_conv3x3,
        int8_conv3x3_prequant,
        quantize_symmetric,
    )
    from eovax.utils.slopetime import chained_ms

    B = args.batch
    it = args.iters
    rng = np.random.default_rng(0)
    results: dict[str, float] = {}

    def rand(shape, dtype=jnp.bfloat16):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32)
        ).astype(dtype)

    def bf16_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # ---- 1+2: per-shape-class rows ---------------------------------------
    # The model's distinct ResnetBlock conv classes (ch=128, mult 1,2,4,4).
    classes = [(256, 128), (128, 256), (64, 512), (32, 512)]
    for res, ch in classes:
        x = rand((B, res, res, ch))
        w = rand((3, 3, ch, ch))
        wq, sw = quantize_symmetric(jnp.asarray(w, jnp.float32), axis=(0, 1, 2))
        gflop = 2 * B * res * res * 9 * ch * ch / 1e9

        rows = {
            "bf16": lambda c, y: jnp.tanh(bf16_conv(y, c[0])).astype(jnp.bfloat16),
            "int8": lambda c, y: jnp.tanh(
                int8_conv3x3(y.astype(jnp.float32), c[1], None)
            ).astype(jnp.bfloat16),
            "int8_prequant": lambda c, y: jnp.tanh(
                int8_conv3x3_prequant(y.astype(jnp.float32), c[2], c[3], None)
            ).astype(jnp.bfloat16),
            # activation-quantize pass alone (reduction + int8 write,
            # result folded back so it can't be DCE'd)
            "act_quant_only": lambda c, y: (
                lambda q, s: (q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16))
            )(*quantize_symmetric(y)),
        }
        consts = (w, jnp.asarray(w, jnp.float32), wq, sw)
        for name, fn in rows.items():
            ms = chained_ms(fn, x, consts=consts, lo=it, hi=3 * it)
            key = f"{name}_{res}px_{ch}ch"
            results[key] = round(ms, 3)
            peak = PEAK_INT8_TFS if name.startswith("int8") else PEAK_BF16_TFS
            mfu = gflop / ms / peak * 100
            extra = "" if name == "act_quant_only" else f"  MFU {mfu:5.1f}%"
            print(f"{key:28s}: {ms:7.2f} ms{extra}", flush=True)

    # ---- 3: full reconstruct composition ---------------------------------
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig
    from eovax.core.precision import DEFAULT_POLICY, INT8_POLICY
    from eovax.data.wavelengths import wavelengths_for
    from eovax.models.backbone import EOVAECore
    from eovax.utils.slopetime import random_variables

    stem = StemConfig(num_layers=4, wv_planes=256)
    wvs = jnp.asarray(wavelengths_for("S2L2A"))
    x16 = jnp.asarray(rng.standard_normal((B, 256, 256, 12), dtype=np.float32))
    for tag, policy in (("bf16", DEFAULT_POLICY), ("int8", INT8_POLICY)):
        core = EOVAECore(
            encoder_cfg=EncoderConfig(in_channels=12, stem=stem),
            decoder_cfg=DecoderConfig(out_ch=12, stem=stem),
            policy=policy,
        )
        variables = random_variables(
            lambda: core.init(
                jax.random.PRNGKey(0), x16[:1], wvs, sample_posterior=False,
                method=EOVAECore.forward,
            ),
            rng,
        )

        def recon(c, y, _core=core):
            out, _ = _core.apply(
                c, y, wvs, sample_posterior=False, method=EOVAECore.forward
            )
            return jnp.tanh(out).astype(jnp.float32)

        ms = chained_ms(recon, x16, consts=variables, lo=it, hi=3 * it)
        results[f"reconstruct_{tag}"] = round(ms, 2)
        print(f"reconstruct_{tag}: {ms:.1f} ms ({B * 1e3 / ms:.1f} imgs/s)",
              flush=True)

    print("JSON:" + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
