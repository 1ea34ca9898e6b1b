"""Graceful preemption: SIGTERM mid-run → trainers stop at the signalled
step and the tail save makes it the resume point (reference parity target:
Lightning only recovers to the last periodic ModelCheckpoint,
/root/reference/train.py:155-162)."""

import os
import signal

import numpy as np
import pytest

from eovax.utils import preemption


@pytest.fixture(autouse=True)
def _reset_flag():
    preemption.reset_for_tests()
    yield
    preemption.reset_for_tests()


def test_guard_sets_flag_restores_and_chains():
    calls = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: calls.append(s))
    try:
        with preemption.PreemptionGuard() as guard:
            assert not guard.should_stop()
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.should_stop()
            assert guard.should_stop(step=7)  # latched
            # the pre-existing handler chained
            assert calls == [signal.SIGTERM]
        # our lambda (the pre-guard handler) was restored on exit
        restored = signal.getsignal(signal.SIGTERM)
        assert getattr(restored, "__name__", "") == "<lambda>"
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_inert_off_main_thread():
    """signal.signal is main-thread-only; a guard entered on a worker
    thread (e.g. fit() embedded in a serving process) must not crash."""
    import threading

    result = {}

    def run():
        try:
            with preemption.PreemptionGuard() as g:
                result["stop"] = g.should_stop(1)
        except Exception as e:  # pragma: no cover
            result["error"] = e

    t = threading.Thread(target=run)
    t.start()
    t.join(10)
    assert "error" not in result and result["stop"] is False


def test_flag_survives_across_guards():
    """A signal between two fit() calls still stops the next one."""
    with preemption.PreemptionGuard():
        os.kill(os.getpid(), signal.SIGTERM)
    with preemption.PreemptionGuard() as g2:
        assert g2.should_stop()


@pytest.mark.slow
def test_stage2_sigterm_saves_interrupted_step(tmp_path, capsys):
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.data.synthetic import synthetic_terramesh_batches
    from eovax.losses import EOConsistencyLoss
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.train.stage2 import Stage2Trainer

    stem = StemConfig(num_layers=1, wv_planes=32)
    cfg = VAEConfig(
        encoder=EncoderConfig(resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=4, use_dynamic_ops=True,
                              stem=stem),
        decoder=DecoderConfig(resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=4, use_dynamic_ops=True,
                              stem=stem),
        base_lr=1e-4,
    )

    def batches(n, kill_before=None):
        it = synthetic_terramesh_batches(
            batch_size=4, target_size=(32, 32), modalities=("S2RGB",),
            seed=0, num_batches=n,
        )
        for j, b in enumerate(it):
            if kill_before is not None and j == kill_before:
                os.kill(os.getpid(), signal.SIGTERM)  # preemption notice
            yield b

    loss = EOConsistencyLoss(pixel_weight=1.0, msssim_weight=0.0)
    ckpt = str(tmp_path / "ckpt")
    # NO periodic checkpointing (ckpt_every=0): only the graceful-stop tail
    # save can produce the step-3 resume point.
    t1 = Stage2Trainer(model=EOFluxVAE(cfg, seed=0), loss_obj=loss, cfg=cfg,
                       max_steps=5, log_every=0, ckpt_dir=ckpt, seed=0)
    # The signal arrives while FETCHING the 3rd batch (j==2); that batch
    # still trains (the flag is polled after the step), so the run stops
    # at step 3 — strictly before max_steps.
    s1 = t1.fit(batches(5, kill_before=2))
    out = capsys.readouterr().out
    assert "preemption signal" in out
    assert int(s1.step) == 3 < 5

    # The resume is a NEW process in real life — clear the latched flag.
    preemption.reset_for_tests()
    t2 = Stage2Trainer(model=EOFluxVAE(cfg, seed=9), loss_obj=loss, cfg=cfg,
                       max_steps=5, log_every=0, ckpt_dir=ckpt, seed=0)
    s2 = t2.fit(batches(5))
    assert int(s2.step) == 5
    assert "resumed from checkpoint at step 3" in capsys.readouterr().out


@pytest.mark.slow
def test_sr_sigterm_saves_interrupted_step(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from eovax.core.precision import FULL_PRECISION
    from eovax.models.sr_diffusion import SimpleDenoiser
    from eovax.models.unet import UNet
    from eovax.train.sr import DiffusionSuperRes

    unet = UNet(in_channels=4, out_channels=4, cond_channels=4,
                hid_channels=(8, 16), hid_blocks=(1, 1), policy=FULL_PRECISION)
    x0 = jnp.zeros((2, 8, 8, 4))
    params = unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), x0)["params"]
    den = SimpleDenoiser(
        apply_fn=lambda p, x_t, t, cond: unet.apply({"params": p}, x_t, t, cond)
    )

    def batches(n, kill_before=None):
        g = np.random.default_rng(0)
        for j in range(n):
            if kill_before is not None and j == kill_before:
                os.kill(os.getpid(), signal.SIGTERM)
            yield {
                "image_hr": g.standard_normal((2, 8, 8, 4)).astype(np.float32),
                "image_lr": g.standard_normal((2, 8, 8, 4)).astype(np.float32),
            }

    ckpt = str(tmp_path / "srckpt")
    m1 = DiffusionSuperRes(denoiser=den, init_params=params, sampler_steps=2,
                           log_every=0, seed=0, ckpt_dir=ckpt)
    s1 = m1.fit(batches(6, kill_before=2), max_steps=6)
    out = capsys.readouterr().out
    assert "preemption signal" in out
    assert int(s1.step) == 3 < 6  # signal during fetch of batch 3; it trains

    preemption.reset_for_tests()  # resume = a fresh process in real life
    m2 = DiffusionSuperRes(denoiser=den, init_params=params, sampler_steps=2,
                           log_every=0, seed=0, ckpt_dir=ckpt)
    s2 = m2.fit(batches(6), max_steps=6)
    assert int(s2.step) == 6
    assert "resumed from checkpoint at step 3" in capsys.readouterr().out
