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


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="EO-VAE pipeline benchmark")
    parser.add_argument("--name", default="eo-vae")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--resolution", type=int, default=128, help="LR input size")
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--sr-steps", type=int, default=50)
    parser.add_argument("--output", default=None)
    parser.add_argument("--config", default=None, help="optional model_config.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument(
        "--precision", default="16-mixed",
        help="'32-true', '16-mixed' (bf16, default), or 'int8' (W8A8 body convs)",
    )
    args = parser.parse_args(argv)

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.core.precision import policy_from_name
    from eovax.data.sen2naip import SEN2NAIP_WVS
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.models.sr_diffusion import DDIMSampler, RectifiedSchedule, SimpleDenoiser
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

    sampler = DDIMSampler(SimpleDenoiser(apply_fn, RectifiedSchedule()), steps=args.sr_steps)

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
