"""Async step-managed checkpoints + auto-resume + encode pre-flight check
(VERDICT round-1 weak #7 / missing #8)."""

import glob
import os

import jax
import numpy as np
import pytest

from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
from eovax.losses import EOConsistencyLoss
from eovax.models.eo_flux_vae import EOFluxVAE
from eovax.utils.checkpoint import TrainCheckpointer

STEM = StemConfig(num_layers=1, wv_planes=32)
CFG = VAEConfig(
    encoder=EncoderConfig(
        resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, z_channels=4, use_dynamic_ops=True, stem=STEM,
    ),
    decoder=DecoderConfig(
        resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, z_channels=4, use_dynamic_ops=True, stem=STEM,
    ),
    base_lr=1e-4,
)


@pytest.mark.slow
def test_train_checkpointer_async_roundtrip(tmp_path):
    state = {"step": np.int32(1), "w": np.arange(8, dtype=np.float32)}
    ckptr = TrainCheckpointer(str(tmp_path), max_to_keep=2)
    ckptr.save(1, state)
    state2 = {"step": np.int32(2), "w": np.arange(8, dtype=np.float32) * 2}
    ckptr.save(2, state2)
    state3 = {"step": np.int32(3), "w": np.arange(8, dtype=np.float32) * 3}
    ckptr.save(3, state3)
    ckptr.wait()
    assert ckptr.latest_step() == 3
    restored = ckptr.restore_latest(state)
    np.testing.assert_array_equal(restored["w"], state3["w"])
    # keep-last-K pruning.
    steps = sorted(
        int(os.path.basename(p)) for p in glob.glob(str(tmp_path / "[0-9]*"))
    )
    assert steps == [2, 3]
    ckptr.close()


@pytest.mark.slow
def test_stage2_auto_resume(tmp_path, capsys):
    from eovax.data.synthetic import synthetic_terramesh_batches
    from eovax.train.stage2 import Stage2Trainer

    def batches(n, seed):
        return synthetic_terramesh_batches(
            batch_size=4, target_size=(32, 32), modalities=("S2RGB",),
            seed=seed, num_batches=n,
        )

    model = EOFluxVAE(CFG, seed=0)
    loss = EOConsistencyLoss(pixel_weight=1.0, msssim_weight=0.0)
    t1 = Stage2Trainer(
        model=model, loss_obj=loss, cfg=CFG, max_steps=2, log_every=0,
        ckpt_dir=str(tmp_path / "ckpt"), seed=0,
    )
    s1 = t1.fit(batches(2, 0))
    assert int(s1.step) == 2

    # Fresh trainer on the same dir: picks up step 2 without --ckpt.
    # max_steps is the GLOBAL budget (Lightning Trainer(max_steps=N)
    # semantics): resuming at 2 with max_steps=4 trains exactly 2 more.
    t2 = Stage2Trainer(
        model=EOFluxVAE(CFG, seed=99), loss_obj=loss, cfg=CFG, max_steps=4,
        log_every=0, ckpt_dir=str(tmp_path / "ckpt"), seed=0,
    )
    s2 = t2.fit(batches(4, 1))
    assert int(s2.step) == 4
    assert "resumed from checkpoint at step 2" in capsys.readouterr().out

    # A run resumed at (or past) the budget trains zero further steps.
    t3 = Stage2Trainer(
        model=EOFluxVAE(CFG, seed=7), loss_obj=loss, cfg=CFG, max_steps=4,
        log_every=0, ckpt_dir=str(tmp_path / "ckpt"), seed=0,
    )
    s3 = t3.fit(batches(4, 2))
    assert int(s3.step) == 4
    # Resumed params actually came from the checkpoint, not seed-99 init.
    w1 = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(s1.params)[0])
    )
    w99 = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(t2.model.variables["params"])[0])
    )
    assert not np.allclose(w1, w99)


def test_encode_latents_reconstruction_check(tmp_path):
    from eovax.cli.encode_latents import reconstruction_check

    model = EOFluxVAE(CFG, seed=0)
    g = np.random.default_rng(0)
    batch = {"image_hr": g.standard_normal((2, 32, 32, 3), dtype=np.float32)}
    wvs = np.asarray([0.665, 0.56, 0.49], np.float32)
    path, mse = reconstruction_check(model, batch, wvs, str(tmp_path))
    assert os.path.exists(path)
    assert np.isfinite(mse)
