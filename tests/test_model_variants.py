"""Tests: FluxAutoencoderKL modes, legacy AutoencoderKL, shared-basis stems,
image loggers."""

import numpy as np
import pytest

from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig

STEM = StemConfig(num_layers=1, wv_planes=64)


def tiny_cfg(dynamic=True):
    return VAEConfig(
        encoder=EncoderConfig(
            resolution=32, in_channels=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            z_channels=8, use_dynamic_ops=dynamic, stem=STEM if dynamic else None,
        ),
        decoder=DecoderConfig(
            resolution=32, out_ch=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            z_channels=8, use_dynamic_ops=dynamic, stem=STEM if dynamic else None,
        ),
        base_lr=1e-3,
    )


WVS = np.asarray([0.665, 0.56, 0.49], np.float32)


def test_flux_autoencoder_distill_mode(tmp_path):
    import safetensors.numpy

    from eovax.models.flux_autoencoder import FluxAutoencoderKL

    g = np.random.default_rng(0)
    teacher_path = str(tmp_path / "ae.safetensors")
    safetensors.numpy.save_file(
        {
            "encoder.conv_in.weight": g.normal(0, 0.1, (32, 3, 3, 3)).astype(np.float32),
            "encoder.conv_in.bias": g.normal(0, 0.05, (32,)).astype(np.float32),
            "decoder.conv_out.weight": g.normal(0, 0.1, (3, 32, 3, 3)).astype(np.float32),
            "decoder.conv_out.bias": g.normal(0, 0.05, (3,)).astype(np.float32),
        },
        teacher_path,
    )
    model = FluxAutoencoderKL(tiny_cfg(), training_mode="distill", seed=0)
    run = model.make_distill_runner(teacher_path, max_steps=30, lr=3e-3)
    logs = run()
    assert logs["total_loss"] < 1.0
    # Inference surface intact after distillation.
    x = np.zeros((1, 3, 32, 32), np.float32)
    assert model.reconstruct(x, WVS).shape == (1, 3, 32, 32)


@pytest.mark.slow
def test_flux_autoencoder_flow_refine_mode():
    from eovax.data.synthetic import synthetic_terramesh_batches
    from eovax.models.flux_autoencoder import FluxAutoencoderKL

    model = FluxAutoencoderKL(tiny_cfg(), training_mode="flow-refine", seed=1)
    trainer = model.make_flow_refine_trainer(
        hid_channels=(16, 16), hid_blocks=(1, 1), sampler_steps=4,
        base_lr=1e-3, log_every=0,
    )
    batches = synthetic_terramesh_batches(
        batch_size=2, target_size=(32, 32), modalities=("S2RGB",),
        mode="S2RGB", seed=1, num_batches=2,
    )
    refine_iter = trainer.refine_batches(batches, WVS)
    state = trainer.fit(refine_iter, max_steps=2)
    assert int(state.step) == 2


def test_legacy_autoencoder_static():
    from eovax.models.flux_autoencoder import AutoencoderKL

    model = AutoencoderKL(tiny_cfg(dynamic=False), seed=2)
    x = np.random.default_rng(2).standard_normal((1, 3, 32, 32)).astype(np.float32)
    recon = model.reconstruct(x, WVS)
    assert recon.shape == x.shape
    post = model.encode(x, WVS)
    assert post.mean.shape == (1, 8, 16, 16)


def test_shared_basis_stems():
    import jax
    import jax.numpy as jnp

    from eovax.nn.dynamic_basis import DynamicInputLayer, DynamicOutputLayer

    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((2, 16, 16, 3), dtype=np.float32))
    wvs = jnp.asarray(WVS)

    layer = DynamicInputLayer(out_channels=32, num_bases=8, rank_dim=16)
    variables = layer.init(jax.random.PRNGKey(0), x, wvs)
    out = layer.apply(variables, x, wvs)
    assert out.shape == (2, 16, 16, 32)
    w, b = layer.apply(variables, wvs, method=DynamicInputLayer.get_distillation_weight)
    assert w.shape == (32, 3, 3, 3) and b.shape == (32,)

    h = jnp.asarray(g.standard_normal((2, 16, 16, 32), dtype=np.float32))
    out_layer = DynamicOutputLayer(in_channels=32, num_bases=8, rank_dim=16)
    ov = out_layer.init(jax.random.PRNGKey(1), h, wvs)
    y = out_layer.apply(ov, h, wvs)
    assert y.shape == (2, 16, 16, 3)
    w, b = out_layer.apply(ov, wvs, method=DynamicOutputLayer.get_distillation_weight)
    assert w.shape == (3, 32, 3, 3) and b.shape == (3,)


def test_image_loggers(tmp_path):
    from eovax.utils.image_logger import ImageLogger, SuperResImageLogger

    g = np.random.default_rng(4)
    images = g.standard_normal((4, 32, 32, 12)).astype(np.float32)
    recons = images + 0.1
    logger = ImageLogger(str(tmp_path), max_images=4)
    path = logger.log(images, recons, modality="S2L2A", step=10)
    assert path.endswith(".png")
    import os

    assert os.path.exists(path)

    sr_logger = SuperResImageLogger(str(tmp_path))
    path2 = sr_logger.log(
        g.standard_normal((2, 32, 32, 4)).astype(np.float32),
        g.standard_normal((2, 32, 32, 4)).astype(np.float32),
        g.standard_normal((2, 32, 32, 4)).astype(np.float32),
        step=5,
    )
    assert os.path.exists(path2)
