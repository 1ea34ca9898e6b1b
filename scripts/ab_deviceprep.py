"""A/B localization: why was the fused device_prep fit() slower on the
tunnel host? Times, with identical pipelining (async dispatch loop, one
block at the end):

  A. place fp32 batch  + host-path train fn
  B. place int16 + d4  + fused (device_prep) train fn
  C. bare place_batch of the fp32 batch vs the int16 batch
  D. fused fn on PRE-PLACED device inputs (isolates the program itself)

Run from /root/repo:  python scripts/ab_deviceprep.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.losses import EOConsistencyLoss
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.parallel.mesh import make_mesh, place_batch
    from eovax.train.stage2 import Stage2Trainer

    stem = StemConfig(num_layers=4, wv_planes=256)
    cfg = VAEConfig(
        encoder=EncoderConfig(in_channels=12, stem=stem),
        decoder=DecoderConfig(out_ch=12, stem=stem),
        base_lr=1e-4, clip_grad=1.0,
    )
    model = EOFluxVAE(cfg, seed=0)
    loss = EOConsistencyLoss(
        pixel_weight=1.0, rec_loss_type="char", msssim_weight=1.0,
        msssim_start_step=0,
    )
    mesh = make_mesh()
    trainer = Stage2Trainer(
        model=model, loss_obj=loss, cfg=cfg, max_steps=5, log_every=0,
        mesh=mesh, seed=0,
    )

    g = np.random.default_rng(0)
    raw_i16 = g.integers(0, 4000, (16, 256, 256, 12)).astype(np.int16)
    img_f32 = g.standard_normal((16, 256, 256, 12)).astype(np.float32)
    wvs = np.asarray(
        [0.49, 0.56, 0.665, 0.705, 0.74, 0.783, 0.842, 0.865, 0.945,
         1.375, 1.61, 2.19], np.float32)
    mean = np.zeros(12, np.float32)
    std = np.ones(12, np.float32)
    clip = np.asarray([-np.inf, np.inf], np.float32)
    d4 = np.asarray([1, 0, 2], np.int32)

    fn = trainer._jitted("train", None, None)
    key = jax.random.PRNGKey(0)

    desc = place_batch(
        {"wvs": wvs, "norm_mean": mean, "norm_std": std, "norm_clip": clip},
        mesh,
    )

    def run_host(state, n):
        for _ in range(n):
            placed = place_batch({"image": img_f32, "wvs": wvs}, mesh)
            state, logs = fn(state, placed["image"], placed["wvs"], key)
        jax.block_until_ready(logs["train/loss_total"])
        return state

    def run_fused(state, n):
        for _ in range(n):
            placed = place_batch({"image": raw_i16, "d4": d4}, mesh)
            tup = (placed["image"], desc["norm_mean"], desc["norm_std"],
                   desc["norm_clip"], placed["d4"])
            state, logs = fn(state, tup, desc["wvs"], key)
        jax.block_until_ready(logs["train/loss_total"])
        return state

    def run_fused_preplaced(state, n):
        placed = place_batch({"image": raw_i16, "d4": d4}, mesh)
        tup = (placed["image"], desc["norm_mean"], desc["norm_std"],
               desc["norm_clip"], placed["d4"])
        for _ in range(n):
            state, logs = fn(state, tup, desc["wvs"], key)
        jax.block_until_ready(logs["train/loss_total"])
        return state

    def timed(label, runner, n_lo=5, n_hi=15):
        state = trainer.init_state()
        state = runner(state, 2)  # compile + warm
        t0 = time.perf_counter(); state = runner(state, n_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); state = runner(state, n_hi)
        t_hi = time.perf_counter() - t0
        ms = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
        print(f"{label}: {ms:.1f} ms/step (lo {t_lo:.2f}s hi {t_hi:.2f}s)",
              flush=True)
        del state
        return ms

    a = timed("A host-path fp32       ", run_host)
    b = timed("B fused int16 (placed) ", run_fused)
    d = timed("D fused, pre-placed    ", run_fused_preplaced)

    # C. bare transfer cost, 10 reps each, blocked per rep.
    for label, arr in (("fp32 50MB", img_f32), ("int16 25MB", raw_i16)):
        for _ in range(2):
            jax.block_until_ready(place_batch({"image": arr}, mesh)["image"])
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(place_batch({"image": arr}, mesh)["image"])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"C place_batch {label}: {ms:.1f} ms/put", flush=True)

    print(f"delta fused-host: {b - a:.1f} ms; program-only delta: "
          f"{d - a:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
