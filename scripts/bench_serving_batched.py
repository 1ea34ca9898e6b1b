"""Measure the serving daemon's dynamic micro-batching win on real hardware.

Protocol: export the flagship VAE (12-band S2L2A, 256px) as a StableHLO
artifact, warm the bucket ladder, then drive the HTTP daemon with K
concurrent clients each posting M sequential B=1 reconstruct requests —
once with batching off (every request is its own device dispatch) and
once with micro-batching on (concurrent requests coalesce into bucketed
device calls, eovax/serving/batching.py). Aggregate imgs/s is wall-clock
from first send to last response — a full host-clock, value-fetched
measure, immune to the tunnel's early-return block_until_ready quirk
(ARCHITECTURE.md round-4 notes).

Caveats stated up front: on this host the HTTP numbers are HOST-bound,
not device-bound — one CPU core serializes every client's .npy
encode/decode and the tunnel caps D2H, so the end-to-end ratio
UNDERSTATES the on-metal win (first measured run even showed a 0.69x
"win" before pad rows were device-sliced off the fetch). The
hardware-intrinsic part is the device-compute ratio — N serialized B=1
calls vs one B=N call — which the --device-only section measures
directly on the ServedModel, no HTTP in the loop.

Usage: python scripts/bench_serving_batched.py [--clients 8] [--requests 6]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request

# PYTHONPATH breaks the axon tunnel plugin on this host — sys.path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _drive(port: int, clients: int, requests: int, x_bytes: bytes):
    """K threads x M posts; returns (wall_s, errors)."""
    errors: list[Exception] = []
    barrier = threading.Barrier(clients + 1)

    def client():
        try:
            barrier.wait()
            for _ in range(requests):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/reconstruct?modality=S2L2A",
                    data=x_bytes)
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, errors


def _device_intrinsic(served, np, batch: int) -> dict:
    """The hardware half of the story: device compute of one B=N call vs
    N back-to-back B=1 calls, measured with the repo's chained-slope
    methodology (eovax/utils/slopetime.py) so per-dispatch tunnel RTT and
    D2H fetch cancel out of the ratio — a naive value-fetched wall clock
    on this host measures the ~30 MB/s tunnel, not the chip."""
    import jax.numpy as jnp

    from eovax.utils.slopetime import chained_ms

    exp = served._fn("reconstruct", "S2L2A")

    def body(v, y):
        return jnp.tanh(exp.call(v, y)).astype(jnp.float32)

    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal(
        (batch, 12, 256, 256)).astype(np.float32))
    ms_b1 = chained_ms(body, xs[:1], served._variables)
    ms_bn = chained_ms(body, xs, served._variables)
    return {
        "batch": batch,
        "b1_ms_per_call": round(ms_b1, 2),
        "coalesced_ms": round(ms_bn, 2),
        "device_speedup": round(batch * ms_b1 / ms_bn, 2),
    }


def _sr_device_intrinsic(max_batch: int, steps: int) -> dict:
    """Device-intrinsic coalescing ratio for the SR-pipeline artifact —
    the workload micro-batching helps most: requests are typically B=1
    (one tile per client) and every call pays a full ``steps``-step DDIM
    scan, so N-into-1 dispatch collapse amortizes N× more device work
    than on the single-conv-stack surfaces. Per-sample seeds (round-4
    export) are what make this coalescing legal at all. Same
    chained-slope methodology as _device_intrinsic; flagship stage-3
    setup (4-band SEN2NAIP 128px LR, z-latent UNet per
    eo_vae_latent.yaml — identical to cli/benchmark's sr_pipeline rows).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eovax.core.config import (DecoderConfig, EncoderConfig, StemConfig,
                                   VAEConfig)
    from eovax.core.precision import DEFAULT_POLICY
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.models.sr_diffusion import RectifiedSchedule, SimpleDenoiser
    from eovax.models.unet import UNet
    from eovax.serving import ServedModel, export_sr_pipeline
    from eovax.utils.slopetime import chained_ms

    stem = StemConfig(num_layers=4, wv_planes=256)
    cfg = VAEConfig(encoder=EncoderConfig(in_channels=4, stem=stem),
                    decoder=DecoderConfig(out_ch=4, stem=stem))
    model = EOFluxVAE(cfg, policy=DEFAULT_POLICY)
    z = model.config.encoder.z_channels
    unet = UNet(in_channels=z, out_channels=z, cond_channels=z,
                hid_channels=(256, 128, 64), hid_blocks=(3, 3, 3),
                policy=DEFAULT_POLICY)
    x0 = jnp.zeros((1, 16, 16, z))
    sr_params = unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
                          x0)["params"]

    def apply_fn(params, x_t, t, cond=None):
        return unet.apply({"params": params}, x_t, t, cond)

    den = SimpleDenoiser(apply_fn=apply_fn, schedule=RectifiedSchedule())
    out = tempfile.mkdtemp(prefix="eovax_bench_sr_serve_")
    try:
        export_sr_pipeline(model, den, sr_params, out, resolution=128,
                           steps=steps)
        print("sr artifact exported", flush=True)
        served = ServedModel.load(out)
        exp = served._fn("super_resolve")

        def body(c, y):
            v, s = c
            return jnp.tanh(exp.call(v, y, s)).astype(jnp.float32)

        rng = np.random.default_rng(1)
        xs = jnp.asarray(rng.standard_normal(
            (max_batch, 4, 128, 128)).astype(np.float32))
        seeds = jnp.arange(max_batch, dtype=jnp.int32)
        ms_b1 = chained_ms(body, xs[:1], (served._variables, seeds[:1]))
        ms_bn = chained_ms(body, xs, (served._variables, seeds))
        return {
            "batch": max_batch,
            "ddim_steps": steps,
            "b1_ms_per_call": round(ms_b1, 2),
            "coalesced_ms": round(ms_bn, 2),
            "device_speedup": round(max_batch * ms_b1 / ms_bn, 2),
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--requests", type=int, default=6)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--batch-wait-ms", type=float, default=5.0)
    parser.add_argument("--trials", type=int, default=1,
                        help="repeat the unbatched/batched HTTP pair N "
                        "times (export/warmup once); report per-trial "
                        "walls and the MEDIAN of per-trial ratios — one "
                        "trial's ratio swings ±20%% with tunnel variance "
                        "(ARCHITECTURE.md round-5 serving notes)")
    parser.add_argument("--device-only", action="store_true",
                        help="skip the HTTP modes; measure only the "
                        "device-intrinsic serialized-vs-coalesced ratio")
    parser.add_argument("--sr", action="store_true",
                        help="measure the SR-pipeline device-intrinsic "
                        "coalescing ratio (per-sample-seed artifact) "
                        "instead of the VAE surface")
    parser.add_argument("--sr-steps", type=int, default=50)
    args = parser.parse_args()
    if args.trials < 1:
        # Fail before the minutes of export/warmup tunnel compiles an
        # empty trial loop would discard.
        parser.error(f"--trials must be >= 1, got {args.trials}")

    if args.sr:
        from eovax.cli.common import enable_compile_cache

        enable_compile_cache()
        result = {"sr_device_intrinsic": _sr_device_intrinsic(
            args.max_batch, args.sr_steps)}
        print("JSON_RESULT:" + json.dumps(result), flush=True)
        return

    import numpy as np

    from eovax.cli.common import enable_compile_cache

    enable_compile_cache()

    from eovax.core.config import (DecoderConfig, EncoderConfig, StemConfig,
                                   VAEConfig)
    from eovax.core.precision import DEFAULT_POLICY
    from eovax.data.wavelengths import WAVELENGTHS
    from eovax.models.backbone import EOVAECore
    from eovax.serving import ServedModel, export_model
    from eovax.serving.server import make_server, warmup
    from eovax.utils.slopetime import random_variables

    # Flagship config — identical to cli/benchmark.py's ledger rows.
    stem = StemConfig(num_layers=4, wv_planes=256)
    cfg = VAEConfig(encoder=EncoderConfig(in_channels=12, stem=stem),
                    decoder=DecoderConfig(out_ch=12, stem=stem))
    core = EOVAECore(encoder_cfg=cfg.encoder, decoder_cfg=cfg.decoder,
                     policy=DEFAULT_POLICY)
    import jax
    import jax.numpy as jnp

    wvs = jnp.asarray(WAVELENGTHS["S2L2A"], jnp.float32)
    variables = random_variables(
        lambda: core.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 12)), wvs,
            sample_posterior=False, method=EOVAECore.forward,
        ))

    class _Shim:
        pass

    shim = _Shim()
    shim.core, shim.variables, shim.config = core, variables, cfg
    shim.policy = DEFAULT_POLICY
    out = tempfile.mkdtemp(prefix="eovax_bench_serve_")
    try:
        # Only the measured function: each (function, bucket) pair costs a
        # full tunnel compile (~30-40 s) during warmup.
        export_model(shim, out, modalities=("S2L2A",), resolution=256,
                     functions=("reconstruct",))
        print("exported", flush=True)
        served = ServedModel.load(out)
        buckets = [b for b in (1, 2, 4, 8, 16) if b <= args.max_batch]
        warmup(served, batch_sizes=tuple(buckets))
        print(f"warmed buckets {buckets}", flush=True)

        result = {"clients": args.clients, "requests_per_client":
                  args.requests, "batch_per_request": 1}
        result["device_intrinsic"] = _device_intrinsic(
            served, np, batch=args.max_batch)
        print(f"device_intrinsic: {result['device_intrinsic']}", flush=True)
        if args.device_only:
            print("JSON_RESULT:" + json.dumps(result), flush=True)
            return

        x = np.random.default_rng(0).standard_normal(
            (1, 12, 256, 256)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        x_bytes = buf.getvalue()

        total = args.clients * args.requests
        walls: dict[str, list[float]] = {"unbatched": [], "batched": []}
        for trial in range(args.trials):
            for mode, max_batch in (("unbatched", 0),
                                    ("batched", args.max_batch)):
                httpd = make_server(served, port=0, max_batch=max_batch,
                                    batch_wait_ms=args.batch_wait_ms)
                port = httpd.server_address[1]
                t = threading.Thread(target=httpd.serve_forever, daemon=True)
                t.start()
                try:
                    _drive(port, args.clients, 1, x_bytes)  # connection warm
                    wall, errors = _drive(port, args.clients, args.requests,
                                          x_bytes)
                    assert not errors, errors
                    walls[mode].append(wall)
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:{port}/metrics",
                            timeout=30) as r:
                        m = json.load(r)
                    row = {
                        "wall_s": round(wall, 3),
                        "imgs_per_sec": round(total / wall, 1),
                        "latency_p50_ms": m["reconstruct"].get("p50_ms"),
                        "latency_p99_ms": m["reconstruct"].get("p99_ms"),
                    }
                    if "_batching" in m:
                        b = m["_batching"]["reconstruct"]
                        row["mean_samples_per_batch"] = (
                            b["mean_samples_per_batch"])
                        row["pad_waste_pct"] = b["pad_waste_pct"]
                    result[mode] = row  # last trial's detail row
                    print(f"[trial {trial + 1}/{args.trials}] {mode}: {row}",
                          flush=True)
                finally:
                    httpd.shutdown()
                    t.join(timeout=10)
                    httpd.server_close()
        import statistics

        ratios = sorted(u / b for u, b in zip(walls["unbatched"],
                                             walls["batched"]))
        result["trials"] = {
            "n": args.trials,
            "unbatched_wall_s": [round(w, 3) for w in walls["unbatched"]],
            "batched_wall_s": [round(w, 3) for w in walls["batched"]],
            "per_trial_speedup": [round(r, 2) for r in ratios],
        }
        # Median of per-trial ratios: each trial's pair shares one tunnel
        # session back-to-back, so the ratio is far more stable than the
        # absolute rates. (statistics.median — averages the middle pair
        # for even N; the upper-middle element would bias upward.)
        result["speedup"] = round(statistics.median(ratios), 2)
        print(f"speedup per trial {result['trials']['per_trial_speedup']} "
              f"-> median {result['speedup']}", flush=True)
        print("JSON_RESULT:" + json.dumps(result), flush=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
