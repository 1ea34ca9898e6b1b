"""Full-pipeline benchmark CLI with the reference's JSON result schema
(/root/reference/benchmark_compute.py:248-280): per-stage encode / SR /
decode latency, throughput, parameter counts, peak memory.

Timing: each stage is measured as one on-device `lax.fori_loop` dependency
chain with a single 4-byte sync (see bench.py — per-call barriers add the
full tunnel round-trip to every iteration on remote-TPU hosts). Peak
memory comes from jax device memory stats when the backend exposes them.

Usage:
    python -m eovax.cli.benchmark --name eo-vae [--batch 1] [--iters 50] \
        [--sr-steps 50] [--output results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from eovax.cli.common import enable_compile_cache


def _peak_memory_gb() -> float | None:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 1024**3, 3) if peak else None
    except Exception:
        return None


def main(argv=None, *, emit_marker: bool = True) -> None:
    parser = argparse.ArgumentParser(description="EO-VAE pipeline benchmark")
    parser.add_argument("--name", default="eo-vae")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--resolution", type=int, default=128, help="LR input size")
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--sr-steps", type=int, default=50)
    parser.add_argument(
        "--sr-sampler", default="ddim", choices=("ddim", "dpm++2m"),
        help="'ddim' or 'dpm++2m' (second-order: ~half the steps)",
    )
    parser.add_argument("--output", default=None)
    parser.add_argument("--config", default=None, help="optional model_config.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument(
        "--precision", default="16-mixed",
        help="'32-true', '16-mixed' (bf16, default), or 'int8' (W8A8 body convs)",
    )
    parser.add_argument(
        "--all", action="store_true",
        help="per-round perf ledger: ONE JSON covering reconstruct "
        "bf16/int8, the stage-2 train step, the 512px SR pipeline "
        "(DDIM-50 and DPM++(2M)-25), and the exported serving artifact "
        "(VERDICT r4 item #6; commit the output as PERF_r{N}.json)",
    )
    parser.add_argument(
        "--int8-quality", action="store_true",
        help="emit a per-modality PSNR/MS-SSIM table of int8 vs bf16 "
        "reconstruction (the quality gate for quantized serving) instead "
        "of the timing benchmark",
    )
    parser.add_argument(
        "--modalities", nargs="+",
        default=["S2RGB", "S1RTC", "S2L2A", "S2L1C"],
        help="--int8-quality: modalities to tabulate",
    )
    parser.add_argument(
        "--quality-npz", default=None,
        help="--int8-quality: .npz with one NCHW array per modality "
        "(normalized units); synthetic smooth fields otherwise",
    )
    args = parser.parse_args(argv)

    enable_compile_cache()

    if args.all:
        _bench_all(args)
        return

    import jax
    import jax.numpy as jnp

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.core.precision import policy_from_name
    from eovax.data.sen2naip import SEN2NAIP_WVS
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.models.sr_diffusion import RectifiedSchedule, SimpleDenoiser, make_sampler
    from eovax.models.unet import UNet

    policy = policy_from_name(args.precision)
    if args.config:
        model = EOFluxVAE.from_config(args.config, args.ckpt, policy=policy)
    else:
        stem = StemConfig(num_layers=4, wv_planes=256)
        cfg = VAEConfig(
            encoder=EncoderConfig(in_channels=4, stem=stem),
            decoder=DecoderConfig(out_ch=4, stem=stem),
        )
        model = EOFluxVAE(cfg, policy=policy)

    if args.int8_quality:
        _int8_quality_table(model, args)
        return

    z = model.config.encoder.z_channels
    wvs = jnp.asarray(SEN2NAIP_WVS)
    lr = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, 4, args.resolution, args.resolution), dtype=np.float32
        )
    )
    latent_hw = args.resolution // 8

    # SR denoiser (latent-space UNet per eo_vae_latent.yaml:32-48).
    unet = UNet(in_channels=z, out_channels=z, cond_channels=z,
                hid_channels=(256, 128, 64), hid_blocks=(3, 3, 3),
                policy=policy)
    x0 = jnp.zeros((args.batch, latent_hw, latent_hw, z))
    sr_params = unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((args.batch,)), x0)["params"]

    def apply_fn(params, x_t, t, cond=None):
        return unet.apply({"params": params}, x_t, t, cond)

    sampler = make_sampler(
        args.sr_sampler, SimpleDenoiser(apply_fn, RectifiedSchedule()),
        steps=args.sr_steps,
    )

    @jax.jit
    def sr_forward(params, x1, cond):
        return sampler(params, x1, cond)

    def chained_ms(body, seed_arg, iters) -> float:
        """Average per-iteration ms of `body` as ONE on-device fori_loop
        dependency chain (scalar feedback into the input) with a single
        4-byte sync — a per-call barrier would add the full tunnel
        round-trip (~26 ms here) to every iteration; see bench.py."""
        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(a0, n):
            def it(_, s):
                out = body(a0 + s.astype(a0.dtype))
                # full-tensor reduction: a sliced reduction would let XLA
                # narrow norm-free bodies to the few needed outputs.
                return jnp.mean(out.astype(jnp.float32)) * 1e-20

            return jax.lax.fori_loop(0, n, it, jnp.zeros((), jnp.float32))

        float(loop(seed_arg, iters))  # compile + autotune
        float(loop(seed_arg, iters))  # warm
        t0 = time.perf_counter()
        float(loop(seed_arg, iters))
        return (time.perf_counter() - t0) / iters * 1000.0

    core, variables = model.core, model.variables
    z_lr = model.encode_spatial_normalized(lr, wvs)
    x1 = sampler.init(jax.random.PRNGKey(2), _nhwc_shape(z_lr))
    pred = sr_forward(sr_params, x1, _to_nhwc(z_lr))
    out = model.decode_spatial_normalized(_to_nchw(pred), wvs)

    lr_nhwc = _to_nhwc(lr)
    avg_encode = chained_ms(
        lambda x: core.apply(variables, x, wvs, method=type(core).encode_spatial_normalized),
        lr_nhwc, args.iters,
    )
    avg_sr = chained_ms(
        lambda a: sr_forward(sr_params, a, _to_nhwc(z_lr)), x1, args.iters
    )
    avg_decode = chained_ms(
        lambda p: core.apply(variables, p, wvs, method=type(core).decode_spatial_normalized),
        pred, args.iters,
    )
    avg_total = avg_encode + avg_sr + avg_decode
    throughput = args.batch * 1000.0 / avg_total

    def count(tree):
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))

    result = {
        "name": args.name,
        "model_type": "eo-vae",
        "architecture": {
            "input_shape": list(lr.shape),
            "output_shape": list(out.shape),
            "latent_channels": z,
            "compression_ratio": "64:1",
        },
        "parameters": {
            "sr_model": count(sr_params),
            "encoder": count(model.params["encoder"]),
            "decoder": count(model.params["decoder"]),
            "total": count(sr_params) + count(model.params["encoder"]) + count(model.params["decoder"]),
        },
        "memory_gb": {"peak_memory": _peak_memory_gb()},
        "timing_ms": {
            "encode": round(avg_encode, 2),
            "sr_forward": round(avg_sr, 2),
            "decode": round(avg_decode, 2),
            "total": round(avg_total, 2),
        },
        "throughput_imgs_per_sec": round(throughput, 2),
    }
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
    if emit_marker:
        # Exactly ONE JSON_RESULT line per invocation is the stdout
        # contract consumers grep for; --all's nested SR sub-runs pass
        # emit_marker=False so only the final ledger prints it.
        print(f"JSON_RESULT:{json.dumps(result)}")


def _bench_all(args) -> None:
    """Per-round perf ledger over all hot paths, one JSON artifact.

    Every number uses the slope method (two on-device `lax.fori_loop`
    chain lengths, min of 2 runs each, single 4-byte fetch — bench.py /
    scripts/ablate_*.py methodology) so cross-round diffs are apples to
    apples and dispatch/tunnel overhead cancels.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.core.precision import DEFAULT_POLICY, INT8_POLICY
    from eovax.data.wavelengths import wavelengths_for
    from eovax.models.backbone import EOVAECore

    B = 16
    LO, HI = 10, 30
    rng = np.random.default_rng(0)
    ledger: dict = {"mode": "all", "methodology": "fori_loop slope, min-of-2"}

    # Shared slope-method timer (HTTP-413 closure rule and the warm/min
    # protocol live there — change the methodology in ONE place).
    from eovax.utils.slopetime import chained_ms as _chained_ms
    from eovax.utils.slopetime import random_variables
    from eovax.utils.slopetime import slope_ms as _slope_ms

    def slope_ms(loop, x0, lo=LO, hi=HI):
        return _slope_ms(loop, x0, lo, hi)

    def chained_ms(fn, x0, consts, lo=LO, hi=HI):
        return _chained_ms(fn, x0, consts, lo, hi)

    def host_variables(core, x, wvs):
        return random_variables(
            lambda: core.init(
                jax.random.PRNGKey(0), x, wvs, sample_posterior=False,
                method=EOVAECore.forward,
            ),
            rng,
        )

    stem = StemConfig(num_layers=4, wv_planes=256)
    wvs = jnp.asarray(wavelengths_for("S2L2A"))
    x16 = jnp.asarray(
        rng.standard_normal((B, 256, 256, 12), dtype=np.float32)
    )

    # ---- reconstruct bf16 / int8 (the bench.py headline, both policies) --
    for tag, policy in (("bf16", DEFAULT_POLICY), ("int8", INT8_POLICY)):
        core = EOVAECore(
            encoder_cfg=EncoderConfig(in_channels=12, stem=stem),
            decoder_cfg=DecoderConfig(out_ch=12, stem=stem),
            policy=policy,
        )
        variables = host_variables(core, x16[:1], wvs)

        def recon_body(v, y, _core=core):
            recon, _ = _core.apply(
                v, y, wvs, sample_posterior=False, method=EOVAECore.forward
            )
            return jnp.tanh(recon).astype(jnp.float32)

        ms = chained_ms(recon_body, x16, variables)
        ledger[f"reconstruct_{tag}"] = {
            "batch": B, "ms_per_batch": round(ms, 2),
            "imgs_per_sec": round(B * 1e3 / ms, 1),
        }
        print(f"reconstruct_{tag}: {B * 1e3 / ms:.1f} imgs/s", flush=True)

    # ---- stage-2 train step (char + MS-SSIM, fwd+bwd+Adam) ---------------
    from eovax.losses import EOConsistencyLoss
    from eovax.train.stage2 import TrainState, make_optimizer, make_train_step

    cfg = VAEConfig(
        encoder=EncoderConfig(in_channels=12, stem=stem),
        decoder=DecoderConfig(out_ch=12, stem=stem),
        base_lr=1e-4, clip_grad=1.0,
    )
    core = EOVAECore(
        encoder_cfg=cfg.encoder, decoder_cfg=cfg.decoder, policy=DEFAULT_POLICY
    )
    variables = host_variables(core, x16[:1], wvs)
    loss_obj = EOConsistencyLoss(
        pixel_weight=1.0, rec_loss_type="char", msssim_weight=1.0,
        msssim_start_step=0,
    )
    tx, _ = make_optimizer(cfg)
    step_fn = make_train_step(core, loss_obj, tx, cfg)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"], opt_state=tx.init(variables["params"]),
    )
    key = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def train_loop(img, st, n):
        return jax.lax.fori_loop(
            0, n, lambda _, s: step_fn(s, img, wvs, key)[0], st
        )

    ms = slope_ms(functools.partial(train_loop, x16), state0, lo=6, hi=18)
    ledger["train_step_bf16"] = {
        "batch": B, "ms_per_step": round(ms, 2),
        "imgs_per_sec": round(B * 1e3 / ms, 1),
        "loss": "char+msssim", "optimizer": "adam+clip",
    }
    print(f"train_step: {ms:.1f} ms ({B * 1e3 / ms:.1f} imgs/s)", flush=True)

    # ---- 512px SR pipeline, DDIM-50 and DPM++(2M)-25 ---------------------
    import tempfile as _tempfile

    for tag, (sampler_name, steps) in (
        ("ddim50", ("ddim", 50)), ("dpmpp2m25", ("dpm++2m", 25)),
    ):
        # Per-invocation temp path: a fixed /tmp name would let a
        # concurrent --all run (or a stale file from an aborted one)
        # feed foreign numbers into this ledger unnoticed.
        fd, sr_out = _tempfile.mkstemp(
            prefix=f"eovax_bench_sr_{tag}_", suffix=".json"
        )
        os.close(fd)
        try:
            main(  # reuse the single-pipeline path, capture via --output
                [
                    "--batch", "1", "--resolution", "128",
                    "--sr-sampler", sampler_name, "--sr-steps", str(steps),
                    "--iters", "20", "--name", f"sr_{tag}",
                    "--output", sr_out,
                ],
                emit_marker=False,
            )
            with open(sr_out) as f:
                r = json.load(f)
        finally:
            os.unlink(sr_out)
        ledger[f"sr_pipeline_512_{tag}"] = {
            "timing_ms": r["timing_ms"],
            "throughput_imgs_per_sec": r["throughput_imgs_per_sec"],
        }
        print(f"sr_pipeline_512_{tag}: {r['timing_ms']['total']} ms", flush=True)

    # ---- exported serving artifact (bf16) ---------------------------------
    import atexit
    import shutil
    import tempfile

    from eovax.serving import ServedModel, export_model

    core = EOVAECore(
        encoder_cfg=EncoderConfig(in_channels=12, stem=stem),
        decoder_cfg=DecoderConfig(out_ch=12, stem=stem),
        policy=DEFAULT_POLICY,
    )
    variables = host_variables(core, x16[:1], wvs)

    class _Shim:
        pass

    shim = _Shim()
    shim.core = core
    shim.variables = variables
    shim.config = VAEConfig(
        encoder=EncoderConfig(in_channels=12, stem=stem),
        decoder=DecoderConfig(out_ch=12, stem=stem),
    )
    shim.policy = DEFAULT_POLICY
    out = tempfile.mkdtemp(prefix="eovax_ledger_artifact_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    export_model(shim, out, modalities=("S2L2A",), resolution=256)
    served = ServedModel.load(out)
    exp = served._fn("reconstruct", "S2L2A")
    x_nchw = jnp.transpose(x16, (0, 3, 1, 2))

    def serve_body(v, y):
        return jnp.tanh(exp.call(v, y)).astype(jnp.float32)

    ms = chained_ms(serve_body, x_nchw, served._variables)
    ledger["serving_artifact_bf16"] = {
        "batch": B, "ms_per_batch": round(ms, 2),
        "imgs_per_sec": round(B * 1e3 / ms, 1),
    }
    print(f"serving_artifact_bf16: {B * 1e3 / ms:.1f} imgs/s", flush=True)

    # ---- bulk latent encoding (encode_latents hot path, SURVEY §3.3) -----
    # The BASELINE-protocol item 4 path: streaming encode_spatial_normalized
    # over Sen2NAIP-shaped 512² LR/HR pairs through the REAL encode_split
    # (double-buffered device dispatch, host Welford stats, IO-pool npz
    # writes — /root/reference/encode_latents.py:305-352). Wall-clock, not
    # slope: the host-side IO is part of the path being measured, and the
    # per-batch np.asarray latent fetch is a real D2H barrier the tunnel
    # cannot early-return through. One synthetic batch is pre-generated and
    # recycled so data synthesis (which stands in for rasterio reads) stays
    # out of the measurement.
    from eovax.cli.encode_latents import encode_split
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.utils.stats import RunningStats

    sr_wvs = np.asarray([0.665, 0.56, 0.49, 0.842], np.float32)
    vae_cfg = VAEConfig(
        encoder=EncoderConfig(in_channels=4, stem=stem),
        decoder=DecoderConfig(out_ch=4, stem=stem),
    )
    bulk_model = EOFluxVAE(vae_cfg, policy=DEFAULT_POLICY, seed=0)
    lr_b = rng.standard_normal((B, 512, 512, 4), dtype=np.float32)
    hr_b = rng.standard_normal((B, 512, 512, 4), dtype=np.float32)

    def pair_batches(n):
        for i in range(n):
            yield {
                "image_lr": lr_b, "image_hr": hr_b,
                "aoi": [f"bench_{i:03d}_{j:02d}" for j in range(B)],
            }

    bulk_out = tempfile.mkdtemp(prefix="eovax_bench_bulk_")
    atexit.register(shutil.rmtree, bulk_out, ignore_errors=True)
    z = vae_cfg.encoder.z_channels
    row: dict = {"batch": B, "resolution": 512, "spatial_norm": True}
    for tag, compress, n_batches in (
        ("uncompressed", False, 4), ("compressed", True, 2),
    ):
        stats_lr = RunningStats((z,), (0, 1, 2))
        stats_hr = RunningStats((z,), (0, 1, 2))
        sub = os.path.join(bulk_out, tag)
        # Warm the [B,4,512,512] encode compile outside the timed window.
        encode_split(
            bulk_model, pair_batches(1), sub, wvs=sr_wvs,
            stats_lr=stats_lr, stats_hr=stats_hr, use_spatial_norm=True,
            compress=compress,
        )
        t0 = time.perf_counter()
        n = encode_split(
            bulk_model, pair_batches(n_batches), sub, wvs=sr_wvs,
            stats_lr=stats_lr, stats_hr=stats_hr, use_spatial_norm=True,
            compress=compress,
        )
        wall = time.perf_counter() - t0
        shutil.rmtree(sub, ignore_errors=True)
        row[f"pairs_per_sec_{tag}"] = round(n / wall, 2)
        # Each AOI pair = two 512² patch encodes (LR bicubic-upsampled to
        # HR size in the collate + HR) — the "patches/sec" of BASELINE 4.
        row[f"patches_512_per_sec_{tag}"] = round(2 * n / wall, 2)
        print(
            f"encode_latents_bulk[{tag}]: {n / wall:.2f} pairs/s "
            f"({2 * n / wall:.2f} 512² patch encodes/s, {n} pairs)",
            flush=True,
        )
    ledger["encode_latents_bulk"] = row

    if args.output:
        with open(args.output, "w") as f:
            json.dump(ledger, f, indent=2)
    print(f"JSON_RESULT:{json.dumps(ledger)}")


def _int8_quality_table(model, args):
    """Per-modality PSNR / MS-SSIM deltas of int8 vs bf16 reconstruction
    (VERDICT r2 weak #2: a user-gateable quality table instead of one
    aggregate RMS number). With --ckpt the numbers are the real serving
    quality; without, they still bound the quantization error mechanism
    on random weights (stated in the output)."""
    import jax
    import jax.numpy as jnp

    from eovax.core.precision import DEFAULT_POLICY, INT8_POLICY
    from eovax.data.wavelengths import WAVELENGTHS
    from eovax.losses.msssim import multiscale_ssim
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.utils.metrics import psnr

    bf16 = EOFluxVAE(model.config, model.variables, policy=DEFAULT_POLICY)
    q = EOFluxVAE(model.config, model.variables, policy=INT8_POLICY)

    data = np.load(args.quality_npz) if args.quality_npz else None
    res = args.resolution
    # MS-SSIM over 5 scales needs resolution ≥ 80 (kernel 5); the
    # reference's data_range=6.0 convention for normalized units.
    data_range = 6.0
    rows = {}
    for modality in args.modalities:
        wvs = jnp.asarray(WAVELENGTHS[modality], jnp.float32)
        c = len(WAVELENGTHS[modality])
        if data is not None and modality in data:
            x = jnp.asarray(data[modality], jnp.float32)
        else:
            # Smooth synthetic fields (bilinear-upsampled noise) so the
            # conv stack sees image-like spatial statistics. crc32, not
            # hash(): str hashing is salted per process and would make
            # the quality gate non-reproducible across runs.
            import zlib

            g = np.random.default_rng(zlib.crc32(modality.encode()))
            lo = g.standard_normal((args.batch, res // 8, res // 8, c))
            x_nhwc = jax.image.resize(
                jnp.asarray(lo, jnp.float32), (args.batch, res, res, c),
                "linear",
            )
            x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        r_b = jnp.transpose(bf16.reconstruct(x, wvs), (0, 2, 3, 1)).astype(jnp.float32)
        r_q = jnp.transpose(q.reconstruct(x, wvs), (0, 2, 3, 1)).astype(jnp.float32)
        tgt = jnp.transpose(jnp.asarray(x, jnp.float32), (0, 2, 3, 1))
        m = {
            "psnr_bf16": float(psnr(r_b, tgt, data_range=data_range)),
            "psnr_int8": float(psnr(r_q, tgt, data_range=data_range)),
            # HIGHEST: this is a quality *measurement* (4-decimal deltas),
            # not the training loss — keep the blur bit-faithful fp32.
            "msssim_bf16": float(multiscale_ssim(
                r_b, tgt, data_range=data_range,
                precision=jax.lax.Precision.HIGHEST)),
            "msssim_int8": float(multiscale_ssim(
                r_q, tgt, data_range=data_range,
                precision=jax.lax.Precision.HIGHEST)),
        }
        m["psnr_delta"] = m["psnr_int8"] - m["psnr_bf16"]
        m["msssim_delta"] = m["msssim_int8"] - m["msssim_bf16"]
        rows[modality] = {k: round(v, 4) for k, v in m.items()}

    result = {
        "mode": "int8-quality",
        "weights": "checkpoint" if args.ckpt else "random-init (mechanism check only)",
        "batch": args.batch,
        "resolution": res,
        "modalities": rows,
    }
    hdr = f"{'modality':10} {'PSNR bf16':>10} {'PSNR int8':>10} {'ΔPSNR':>8} {'MS-SSIM bf16':>13} {'MS-SSIM int8':>13} {'Δ':>8}"
    print(hdr)
    for mod, m in rows.items():
        print(f"{mod:10} {m['psnr_bf16']:10.2f} {m['psnr_int8']:10.2f} "
              f"{m['psnr_delta']:8.3f} {m['msssim_bf16']:13.4f} "
              f"{m['msssim_int8']:13.4f} {m['msssim_delta']:8.4f}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
    print(f"JSON_RESULT:{json.dumps(result)}")


def _to_nhwc(x):
    import jax.numpy as jnp

    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def _to_nchw(x):
    import jax.numpy as jnp

    return jnp.transpose(x, (0, 3, 1, 2))


def _nhwc_shape(z_nchw):
    b, c, h, w = z_nchw.shape
    return (b, h, w, c)


if __name__ == "__main__":
    main()
