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
