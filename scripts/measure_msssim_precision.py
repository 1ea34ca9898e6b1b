"""One-off: measure the MS-SSIM blur-precision lever on the TPU.

Rows (slope method, same methodology as scripts/ablate_train.py):
  1. loss_char_msssim_fwdbwd at HIGH (new default) vs HIGHEST (old) —
     isolates the blur matmul saving;
  2. value delta |msssim_HIGH - msssim_HIGHEST| on random 12-band batches
     (numeric justification for the default);
  3. full flagship train step (B=16, char+MS-SSIM, Adam) with the new
     default — the committed 257.9 ms number re-measured.

Run from /root/repo:  python scripts/measure_msssim_precision.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eovax_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.core.precision import DEFAULT_POLICY
    from eovax.data.wavelengths import wavelengths_for
    from eovax.losses import EOConsistencyLoss
    from eovax.losses.msssim import multiscale_ssim
    from eovax.models.backbone import EOVAECore
    from eovax.train.stage2 import TrainState, make_optimizer, make_train_step

    B, ITERS = 16, 8
    rng = np.random.default_rng(0)
    results: dict[str, float] = {}

    from eovax.utils.slopetime import slope_ms as _slope_ms

    def slope_ms(loop, x0, iters=ITERS):
        # Shared impl: eovax/utils/slopetime.py (the one methodology).
        return _slope_ms(loop, x0, lo=iters, hi=3 * iters)

    wvs = jnp.asarray(wavelengths_for("S2L2A"))
    image = jnp.asarray(rng.standard_normal((B, 256, 256, 12), dtype=np.float32))
    recon0 = jnp.asarray(rng.standard_normal((B, 256, 256, 12), dtype=np.float32))

    # ---- 2. value delta (jitted — eager runs op-by-op over the tunnel) ---
    @jax.jit
    def both(a, b):
        return (
            multiscale_ssim(a, b, precision=jax.lax.Precision.HIGHEST),
            multiscale_ssim(a, b, precision=jax.lax.Precision.HIGH),
        )

    deltas = []
    for seed in range(3):
        g = np.random.default_rng(100 + seed)
        a = jnp.asarray(g.standard_normal((4, 256, 256, 12), dtype=np.float32))
        b = a + 0.1 * jnp.asarray(
            g.standard_normal((4, 256, 256, 12), dtype=np.float32)
        )
        hi, lo = (float(v) for v in both(a, b))
        deltas.append(abs(hi - lo))
        print(f"seed {seed}: HIGHEST {hi:.7f}  HIGH {lo:.7f}  "
              f"delta {abs(hi - lo):.2e}", flush=True)
    results["msssim_value_max_abs_delta"] = max(deltas)

    # ---- 1. loss fwd+bwd row at both precisions ---------------------------
    loss_obj = EOConsistencyLoss(
        pixel_weight=1.0, rec_loss_type="char", msssim_weight=1.0,
        msssim_start_step=0,
    )

    # Temporarily override the module default per row.
    import eovax.losses.msssim as msssim_mod

    for tag, prec in (("high", jax.lax.Precision.HIGH),
                      ("highest", jax.lax.Precision.HIGHEST)):
        msssim_mod.DEFAULT_BLUR_PRECISION = prec

        def loss(img, y):
            val, _ = loss_obj(img, wvs, y, global_step=0, split="train")
            return val

        g = jax.grad(loss, argnums=1)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(img, y, n):
            return jax.lax.fori_loop(
                0, n, lambda _, q: jnp.tanh(g(img, q) + q * 1e-20), y
            )

        results[f"loss_char_msssim_fwdbwd_{tag}"] = slope_ms(
            functools.partial(loop, image), recon0
        )
        print(f"loss_char_msssim_fwdbwd[{tag}]: "
              f"{results[f'loss_char_msssim_fwdbwd_{tag}']:.3f} ms", flush=True)

    msssim_mod.DEFAULT_BLUR_PRECISION = jax.lax.Precision.HIGH

    # ---- 3. full train step with the new default -------------------------
    stem = StemConfig(num_layers=4, wv_planes=256)
    cfg = VAEConfig(
        encoder=EncoderConfig(in_channels=12, stem=stem),
        decoder=DecoderConfig(out_ch=12, stem=stem),
        base_lr=1e-4, clip_grad=1.0,
    )
    core = EOVAECore(
        encoder_cfg=cfg.encoder, decoder_cfg=cfg.decoder, policy=DEFAULT_POLICY
    )
    from eovax.utils.slopetime import random_variables

    variables = random_variables(
        lambda: core.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 12)), wvs,
            sample_posterior=False, method=EOVAECore.forward,
        ),
        rng,
    )
    tx, _ = make_optimizer(cfg)
    step_fn = make_train_step(core, loss_obj, tx, cfg)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def train_loop(st, n):
        return jax.lax.fori_loop(
            0, n, lambda _, s: step_fn(s, image, wvs, key)[0], st
        )

    results["train_total_adam_highblur"] = slope_ms(train_loop, state0)
    print(f"train_total_adam[HIGH blur]: "
          f"{results['train_total_adam_highblur']:.3f} ms "
          f"({B * 1e3 / results['train_total_adam_highblur']:.1f} imgs/s)",
          flush=True)

    print("JSON:" + json.dumps({k: round(v, 5) for k, v in results.items()}))


if __name__ == "__main__":
    main()
