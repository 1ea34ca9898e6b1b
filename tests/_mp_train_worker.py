"""Worker for the genuine 2-process multi-host training test.

Run as:  python -m tests._mp_train_worker <process_id> <coordinator> <out_file>

Each process hosts 4 virtual CPU devices (global mesh = 8), feeds its OWN
half of the global batch through ``place_batch`` (which routes to
``jax.make_array_from_process_local_data`` because process_count == 2),
runs two Stage-2 train steps, and writes a params checksum. The parent
test asserts both processes stayed bit-identical (the XLA gradient
all-reduce over the process boundary actually happened) and moved away
from init.
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_file = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.local_device_count() == 4

    import numpy as np

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.losses import EOConsistencyLoss
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.train.stage2 import Stage2Trainer

    stem = StemConfig(num_layers=1, wv_planes=32)
    cfg = VAEConfig(
        encoder=EncoderConfig(
            resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
            num_res_blocks=1, z_channels=4, use_dynamic_ops=True, stem=stem,
        ),
        decoder=DecoderConfig(
            resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
            num_res_blocks=1, z_channels=4, use_dynamic_ops=True, stem=stem,
        ),
        base_lr=1e-3,
    )
    model = EOFluxVAE(cfg, seed=0)  # same init on both processes
    init_leaf = float(
        sum(
            np.sum(np.abs(np.asarray(l, np.float64)))
            for l in jax.tree_util.tree_leaves(model.variables["params"])
        )
    )
    trainer = Stage2Trainer(
        model=model,
        loss_obj=EOConsistencyLoss(pixel_weight=1.0, msssim_weight=0.0),
        cfg=cfg, max_steps=2, log_every=0, seed=0,
    )

    device_prep = len(sys.argv) > 4 and sys.argv[4] == "device_prep"

    if device_prep:
        # device_prep collate contract across a REAL process boundary:
        # raw uint8 batches + per-sample descriptors; seed differs per
        # process so the D4 draws differ — the [B,·] leaves must carry
        # each host's own values through global assembly (the whole
        # point of the per-sample design, eovax/data/device_prep.py).
        from eovax.data.collate import deterministic_modality_collate

        collate = deterministic_modality_collate(
            "S2RGB", target_size=(32, 32), mode="train", seed=100 + pid,
            device_prep=True,
        )
        g = np.random.default_rng(100 + pid)

        def local_batches():
            for _ in range(2):
                raw = g.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
                yield collate({"S2RGB": raw})

        # Gold semantic check BEFORE training: the assembled + jitted
        # device_prepare of this process's shard must equal the host
        # numpy prep of this process's LOCAL batch with ITS OWN draw.
        from eovax.data.normalize import make_normalizer
        from eovax.parallel.mesh import local_numpy
        from eovax.train.stage2 import _resolve_image

        raw0 = np.random.default_rng(7 + pid).integers(
            0, 255, (8, 32, 32, 3)
        ).astype(np.uint8)
        b0 = collate({"S2RGB": raw0})
        placed = trainer._place_prepared(b0)
        out = jax.jit(_resolve_image)(placed["image"])
        mine = local_numpy(out)
        host = make_normalizer("S2RGB", "legacy")(np.asarray(raw0, np.float32))
        fh, fv, k = b0["d4"][0]
        if fh:
            host = host[:, :, ::-1]
        if fv:
            host = host[:, ::-1]
        if k:
            host = np.rot90(host, k, axes=(1, 2))
        np.testing.assert_allclose(mine, host, rtol=1e-5, atol=1e-5)
        print(f"proc {pid} device_prep shard parity OK (d4={list(b0['d4'][0])})",
              flush=True)
    else:

        def local_batches():
            # DIFFERENT data per process — the global batch is their union.
            g = np.random.default_rng(100 + pid)
            for _ in range(2):
                yield {
                    "image": g.standard_normal((8, 32, 32, 3)).astype(np.float32),
                    "wvs": np.asarray([0.665, 0.56, 0.49], np.float32),
                }

    state = trainer.fit(local_batches())
    assert int(state.step) == 2

    # Params are replicated: every process can read its local replica.
    from eovax.parallel.mesh import local_numpy

    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(np.sum(np.abs(local_numpy(l).astype(np.float64))) for l in leaves))
    with open(out_file, "w") as f:
        f.write(f"{checksum:.10e} {init_leaf:.10e}\n")
    print(f"proc {pid} checksum {checksum:.10e}", flush=True)


if __name__ == "__main__":
    main()
