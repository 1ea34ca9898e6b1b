"""Stage-2 train-step ablation (VERDICT r4 item #2 — the decode treatment
for training).

Breaks the flagship train step (S2L2A 12-band, B=16, char + MS-SSIM,
fwd+bwd+Adam, bf16 — the committed 258.9 ms / 61.8 imgs/s number) into:

  1. step-level layers: fwd loss only → +backward (value_and_grad) →
     +optimizer (Adam+clip vs ~free SGD isolates the update cost);
  2. module-level fwd+bwd: whole encoder / decoder / loss / latent
     pipeline, which must compose to the value_and_grad row;
  3. block-level fwd+bwd: every distinct (resolution, ch_in, ch_out)
     ResnetBlock shape in the model plus attention, down/upsamples and the
     dynamic stems — each with an analytic-FLOP MFU column so the
     inefficient shapes are visible directly.

Methodology is the slope method from scripts/ablate_decode.py: every row
is the difference of two on-device `lax.fori_loop` chains (N and 3N
iterations, min of 2 runs each) with a single 4-byte fetch — this cancels
the constant dispatch+fetch tunnel round-trip (~30 ms on this host).
Backward rows chain through grad-wrt-input (same shape as the input) and
force weight-gradient computation by folding a reduction of every param
grad into the carry (otherwise XLA dead-code-eliminates the wgrad convs
and the row silently measures dgrad only).

Run from /root/repo:  python scripts/ablate_train.py [--iters 8] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

# PYTHONPATH breaks the axon tunnel plugin on this host (memory:
# host-measurement-pitfalls) — put the repo root on sys.path here.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFS = 197.0  # v5e bf16 dense peak


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

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.core.precision import DEFAULT_POLICY
    from eovax.data.wavelengths import wavelengths_for
    from eovax.losses import EOConsistencyLoss
    from eovax.models.backbone import Decoder, Encoder, EOVAECore
    from eovax.nn.blocks import AttnBlock, Downsample, ResnetBlock, Upsample
    from eovax.train.stage2 import TrainState, make_optimizer, make_train_step

    policy = DEFAULT_POLICY
    B = args.batch
    ITERS = args.iters
    rng = np.random.default_rng(0)
    results: dict[str, float] = {}
    gflops: dict[str, float] = {}

    from eovax.utils.slopetime import random_variables
    from eovax.utils.slopetime import chained_ms as _chained_ms
    from eovax.utils.slopetime import scalar_chained_ms as _scalar_chained_ms
    from eovax.utils.slopetime import slope_ms as _slope_ms

    def host_vars(module, *xs):
        return random_variables(
            lambda: module.init(jax.random.PRNGKey(0), *xs), rng
        )

    def rand(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(dtype)

    # ---- slope-method timers (shared impl: eovax/utils/slopetime.py) ----
    def slope_ms(loop, x0, iters=ITERS):
        return _slope_ms(loop, x0, lo=iters, hi=3 * iters)

    def chained_ms(fn, x0, consts=None, iters=ITERS):
        return _chained_ms(fn, x0, consts, lo=iters, hi=3 * iters)

    def scalar_chained_ms(fn_scalar, consts=None, iters=ITERS):
        return _scalar_chained_ms(fn_scalar, consts, lo=iters, hi=3 * iters)

    def tree_scalar(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree)
        )

    def report(label):
        mfu = ""
        if label in gflops and results[label] > 0:
            tfs = gflops[label] / results[label]  # GF / ms = TF/s
            mfu = f"  {tfs:7.1f} TF/s  {100 * tfs / PEAK_TFS:5.1f}% MFU"
        print(f"{label:38} {results[label]:9.3f} ms{mfu}", flush=True)

    # ---- the flagship train step ----------------------------------------
    stem = StemConfig(num_layers=4, wv_planes=256)
    cfg = VAEConfig(
        encoder=EncoderConfig(in_channels=12, stem=stem),
        decoder=DecoderConfig(out_ch=12, stem=stem),
        base_lr=1e-4,
        clip_grad=1.0,
    )
    core = EOVAECore(
        encoder_cfg=cfg.encoder, decoder_cfg=cfg.decoder, policy=policy
    )
    loss_obj = EOConsistencyLoss(
        pixel_weight=1.0, rec_loss_type="char", msssim_weight=1.0,
        msssim_start_step=0,
    )
    wvs = jnp.asarray(wavelengths_for("S2L2A"))
    image = rand((B, 256, 256, 12), jnp.float32)
    key = jax.random.PRNGKey(0)

    variables = random_variables(
        lambda: core.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 12)), wvs,
            sample_posterior=False, method=EOVAECore.forward,
        ),
        rng,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx, _ = make_optimizer(cfg)
    step_adam = make_train_step(core, loss_obj, tx, cfg)
    tx_sgd = __import__("optax").sgd(1e-9)
    step_sgd = make_train_step(core, loss_obj, tx_sgd, cfg)

    def make_state(t):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=t.init(params),
        )

    # Analytic FLOPs helpers (fwd; fwd+bwd ≈ 3×: dgrad + wgrad each ≈ fwd).
    def conv_gf(res, ci, co, k=3):
        return 2.0 * B * res * res * k * k * ci * co / 1e9

    def block_gf(res, ci, co):
        g = conv_gf(res, ci, co) + conv_gf(res, co, co)
        if ci != co:
            g += conv_gf(res, ci, co, k=1)
        return g

    def attn_gf(res, c):
        n = res * res
        return (2.0 * B * (4 * n * c * c + 2 * n * n * c)) / 1e9

    # ---- step-level rows -------------------------------------------------
    for label, step_fn in (("train_total_adam", step_adam),
                           ("train_total_sgd", step_sgd)):
        state0 = make_state(tx if label.endswith("adam") else tx_sgd)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(st, n, _fn=step_fn):
            def body(_, s):
                new_s, _logs = _fn(s, image, wvs, key)
                return new_s

            return jax.lax.fori_loop(0, n, body, st)

        results[label] = slope_ms(loop, state0, ITERS)
        report(label)

    # Whole-step FLOPs from the compiled executable (MFU denominator).
    try:
        state0 = make_state(tx)
        compiled = (
            jax.jit(lambda s: step_adam(s, image, wvs, key)[0])
            .lower(state0)
            .compile()
        )
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_tf = float(ca["flops"]) / 1e12
        results["xla_step_tflops"] = step_tf
        mfu = step_tf * 1e3 / results["train_total_adam"] / PEAK_TFS
        results["train_step_mfu_pct"] = 100 * mfu
        print(
            f"{'XLA step cost':38} {step_tf:9.3f} TF  → "
            f"{100 * mfu:5.1f}% MFU at {results['train_total_adam']:.1f} ms",
            flush=True,
        )
    except Exception as e:  # cost analysis is best-effort on the tunnel
        print(f"cost_analysis unavailable: {e}", flush=True)

    # fwd loss only / fwd+bwd (the actual loss_fn of the step, params fixed)
    def loss_value(p, img):
        vars_ = {"params": p, "batch_stats": batch_stats}
        (recon, _post), _mut = core.apply(
            vars_, img, wvs, rng=key, sample_posterior=True, train=True,
            method=EOVAECore.forward, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        loss, _logs = loss_obj(img, wvs, recon, global_step=0, split="train")
        return loss

    def fwd_only(c, s):
        p, img = c
        return loss_value(p, img * (1 + s * 1e-20)).astype(jnp.float32) * 1e-20

    results["fwd_loss_only"] = scalar_chained_ms(fwd_only, consts=(params, image))
    report("fwd_loss_only")

    def fwd_bwd(c, s):
        p, img = c
        grads = jax.grad(loss_value)(p, img * (1 + s * 1e-20))
        return tree_scalar(grads) * 1e-20

    results["fwd_bwd_grads"] = scalar_chained_ms(fwd_bwd, consts=(params, image))
    report("fwd_bwd_grads")
    results["backward_only (grads - fwd)"] = (
        results["fwd_bwd_grads"] - results["fwd_loss_only"]
    )
    results["optimizer_adam_clip (total - sgd)"] = (
        results["train_total_adam"] - results["train_total_sgd"]
    )
    results["update+bn+dispatch (total - grads)"] = (
        results["train_total_adam"] - results["fwd_bwd_grads"]
    )
    for k in ("backward_only (grads - fwd)", "optimizer_adam_clip (total - sgd)",
              "update+bn+dispatch (total - grads)"):
        report(k)

    # ---- module-level fwd+bwd rows ---------------------------------------
    enc = Encoder(cfg.encoder, policy=policy)
    dec = Decoder(cfg.decoder, policy=policy)
    evars = {"params": params["encoder"]}
    dvars = {"params": params["decoder"]}

    def module_fwdbwd(label, module, vars_, x, needs_wvs=True, gf=None):
        def loss(v, y):
            out = module.apply(v, y, wvs) if needs_wvs else module.apply(v, y)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        def fn(v, y):
            dv, dx = g(v, y)
            return jnp.tanh(dx + (tree_scalar(dv) * 1e-20).astype(dx.dtype))

        results[label] = chained_ms(fn, x, consts=vars_)
        if gf is not None:
            gflops[label] = gf
        report(label)

    # Whole encoder / decoder (fwd+bwd ≈ 3× the fwd analytic cost).
    enc_fwd_gf = (
        conv_gf(256, 12, 128)
        + 2 * block_gf(256, 128, 128) + conv_gf(128, 128, 128)
        + block_gf(128, 128, 256) + block_gf(128, 256, 256) + conv_gf(64, 256, 256)
        + block_gf(64, 256, 512) + block_gf(64, 512, 512) + conv_gf(32, 512, 512)
        + 2 * block_gf(32, 512, 512)
        + 2 * block_gf(32, 512, 512) + attn_gf(32, 512)
        + conv_gf(32, 512, 64) + conv_gf(32, 64, 64, k=1)
    )
    dec_fwd_gf = (
        conv_gf(32, 32, 32, k=1) + conv_gf(32, 32, 512)
        + 2 * block_gf(32, 512, 512) + attn_gf(32, 512)
        + 3 * block_gf(32, 512, 512) + conv_gf(64, 512, 512)
        + 3 * block_gf(64, 512, 512) + conv_gf(128, 512, 512)
        + block_gf(128, 512, 256) + 2 * block_gf(128, 256, 256)
        + conv_gf(256, 256, 256)
        + block_gf(256, 256, 128) + 2 * block_gf(256, 128, 128)
        + conv_gf(256, 128, 12)
    )
    module_fwdbwd("encoder_fwdbwd", enc, evars, image.astype(jnp.bfloat16),
                  gf=3 * enc_fwd_gf)
    module_fwdbwd("decoder_fwdbwd", dec, dvars, rand((B, 32, 32, 32)),
                  gf=3 * dec_fwd_gf)

    # Loss terms, fwd+bwd wrt recon.
    char_only = EOConsistencyLoss(pixel_weight=1.0, rec_loss_type="char")

    def loss_row(label, lobj):
        def loss(img, y):
            val, _ = lobj(img, wvs, y.astype(jnp.float32), global_step=0,
                          split="train")
            return val

        g = jax.grad(loss, argnums=1)

        def fn(img, y):
            return jnp.tanh(g(img, y) + y * 1e-20)

        results[label] = chained_ms(
            fn, rand((B, 256, 256, 12), jnp.float32), consts=image
        )
        report(label)

    loss_row("loss_char_fwdbwd", char_only)
    loss_row("loss_char_msssim_fwdbwd", loss_obj)
    results["msssim_term (diff)"] = (
        results["loss_char_msssim_fwdbwd"] - results["loss_char_fwdbwd"]
    )
    report("msssim_term (diff)")

    # ---- block-level fwd+bwd rows (each with an MFU column) --------------
    def bench_block_bwd(res, ci, co):
        label = f"bwd_block_{res}px_{ci}to{co}" if ci != co else f"bwd_block_{res}px_{ci}"
        blk = ResnetBlock(in_channels=ci, out_channels=co, policy=policy)
        v = host_vars(blk, jnp.zeros((1, res, res, ci)))
        module_fwdbwd(label, blk, v, rand((B, res, res, ci)), needs_wvs=False,
                      gf=3 * block_gf(res, ci, co))

    for res, ci, co in (
        (256, 128, 128), (256, 256, 128),
        (128, 128, 256), (128, 256, 256), (128, 512, 256),
        (64, 256, 512), (64, 512, 512),
        (32, 512, 512),
    ):
        bench_block_bwd(res, ci, co)

    attn = AttnBlock(in_channels=512, policy=policy)
    av = host_vars(attn, jnp.zeros((1, 32, 32, 512)))
    module_fwdbwd("bwd_attn_32px_512", attn, av, rand((B, 32, 32, 512)),
                  needs_wvs=False, gf=3 * attn_gf(32, 512))

    for res, c in ((256, 128), (128, 256), (64, 512)):
        ds = Downsample(c, policy=policy)
        v = host_vars(ds, jnp.zeros((1, res, res, c)))
        module_fwdbwd(f"bwd_down_{res}px_{c}", ds, v, rand((B, res, res, c)),
                      needs_wvs=False, gf=3 * conv_gf(res // 2, c, c))
    for res, c in ((32, 512), (64, 512), (128, 256)):
        up = Upsample(c, policy=policy)
        v = host_vars(up, jnp.zeros((1, res, res, c)))
        module_fwdbwd(f"bwd_up_{res}px_{c}", up, v, rand((B, res, res, c)),
                      needs_wvs=False, gf=3 * 4 * conv_gf(res, c, c))

    # Dynamic stems (hypernet weight generation + the generated conv).
    from eovax.nn.dynamic_conv import DynamicConv, DynamicConvDecoder
    from eovax.models.backbone import _stem_kwargs

    enc_stem = DynamicConv(embed_dim=128, stride=1, padding=1, policy=policy,
                           **_stem_kwargs(stem))
    sv = host_vars(enc_stem, jnp.zeros((1, 256, 256, 12)), wvs)
    module_fwdbwd("bwd_enc_stem_256px_12to128", enc_stem, sv,
                  rand((B, 256, 256, 12)), gf=3 * conv_gf(256, 12, 128))
    dec_stem = DynamicConvDecoder(embed_dim=128, stride=1, padding=1,
                                  policy=policy, **_stem_kwargs(stem))
    dsv = host_vars(dec_stem, jnp.zeros((1, 256, 256, 128)), wvs)
    module_fwdbwd("bwd_dec_stem_256px_128to12", dec_stem, dsv,
                  rand((B, 256, 256, 128)), gf=3 * conv_gf(256, 128, 12))

    # ---- conv3x3 primitive: fwd vs dgrad vs wgrad at the hot shapes ------
    for res, c in ((256, 128), (128, 256), (64, 512)):
        x = rand((B, res, res, c))
        w = rand((3, 3, c, c))
        gf = conv_gf(res, c, c)

        def conv(y, ww):
            return jax.lax.conv_general_dilated(
                y, ww, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        label = f"conv3x3_fwd_{res}px_{c}"
        results[label] = chained_ms(lambda ww, y: jnp.tanh(conv(y, ww)), x,
                                    consts=w)
        gflops[label] = gf
        report(label)

        def dgrad(c_, y):
            xx, ww = c_
            _, vjp = jax.vjp(lambda q: conv(q, ww), xx)
            (dx,) = vjp(y)
            return jnp.tanh(dx)

        label = f"conv3x3_dgrad_{res}px_{c}"
        results[label] = chained_ms(dgrad, x, consts=(x, w))
        gflops[label] = gf
        report(label)

        def wgrad(c_, s):
            xx, ww = c_
            xx = xx * (1 + s * 1e-20).astype(xx.dtype)
            _, vjp = jax.vjp(lambda w2: conv(xx, w2), ww)
            (dw,) = vjp(jnp.tanh(xx))
            return jnp.sum(dw.astype(jnp.float32)) * 1e-20

        label = f"conv3x3_wgrad_{res}px_{c}"
        results[label] = scalar_chained_ms(wgrad, consts=(x, w))
        gflops[label] = gf
        report(label)

    # ---- composed estimates ----------------------------------------------
    r = results
    enc_composed = (
        r["bwd_enc_stem_256px_12to128"]
        + 2 * r["bwd_block_256px_128"] + r["bwd_down_256px_128"]
        + r["bwd_block_128px_128to256"] + r["bwd_block_128px_256"]
        + r["bwd_down_128px_256"]
        + r["bwd_block_64px_256to512"] + r["bwd_block_64px_512"]
        + r["bwd_down_64px_512"]
        + 4 * r["bwd_block_32px_512"]  # level-3 ×2 + mid ×2
        + r["bwd_attn_32px_512"]
    )
    dec_composed = (
        5 * r["bwd_block_32px_512"] + r["bwd_attn_32px_512"]  # mid + level 3
        + r["bwd_up_32px_512"]
        + 3 * r["bwd_block_64px_512"] + r["bwd_up_64px_512"]
        + r["bwd_block_128px_512to256"] + 2 * r["bwd_block_128px_256"]
        + r["bwd_up_128px_256"]
        + r["bwd_block_256px_256to128"] + 2 * r["bwd_block_256px_128"]
        + r["bwd_dec_stem_256px_128to12"]
    )
    results["enc_composed_blocks"] = enc_composed
    results["enc_unattributed"] = r["encoder_fwdbwd"] - enc_composed
    results["dec_composed_blocks"] = dec_composed
    results["dec_unattributed"] = r["decoder_fwdbwd"] - dec_composed
    results["step_composed (enc+dec+loss)"] = (
        r["encoder_fwdbwd"] + r["decoder_fwdbwd"] + r["loss_char_msssim_fwdbwd"]
    )
    results["step_unattributed (grads - composed)"] = (
        r["fwd_bwd_grads"] - results["step_composed (enc+dec+loss)"]
    )
    for k in ("enc_composed_blocks", "enc_unattributed", "dec_composed_blocks",
              "dec_unattributed", "step_composed (enc+dec+loss)",
              "step_unattributed (grads - composed)"):
        report(k)

    print("JSON:" + json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
