"""Stage-1 distillation tests: data-free stem optimization + checkpoint IO."""

import jax
import numpy as np
import pytest
import torch

from eovax import EOFluxVAE
from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
from eovax.train.distill import (
    DistillConfig,
    distillation_loss,
    load_distilled_checkpoint,
    run_distillation,
    save_distilled_checkpoint,
)

STEM = StemConfig(num_layers=1, wv_planes=64)
CFG = VAEConfig(
    encoder=EncoderConfig(
        resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, z_channels=8, use_dynamic_ops=True, stem=STEM,
    ),
    decoder=DecoderConfig(
        resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, z_channels=8, use_dynamic_ops=True, stem=STEM,
    ),
)


def _teacher():
    g = np.random.default_rng(0)
    return {
        "encoder_weight": g.normal(0, 0.1, (32, 3, 3, 3)).astype(np.float32),
        "encoder_bias": g.normal(0, 0.05, (32,)).astype(np.float32),
        "decoder_weight": g.normal(0, 0.1, (3, 32, 3, 3)).astype(np.float32),
        "decoder_bias": g.normal(0, 0.05, (3,)).astype(np.float32),
    }


def test_distillation_converges(tmp_path):
    model = EOFluxVAE(CFG, seed=0)
    teacher = _teacher()
    cfg = DistillConfig(max_steps=400, lr=3e-3, val_every_n_steps=100,
                        log_every_n_steps=0)

    loss0, _ = distillation_loss(model.core, model.variables["params"], teacher, cfg)
    new_vars, logs = run_distillation(model.core, model.variables, teacher, cfg)
    assert logs["total_loss"] < float(loss0) * 0.1, logs

    # Distilled stems, queried at RGB, approximate the teacher weights.
    assert logs["enc_weight_mae"] < 0.05
    assert logs["dec_weight_mae"] < 0.05

    # Body params untouched.
    np.testing.assert_array_equal(
        np.asarray(model.variables["params"]["encoder"]["mid_block_1"]["conv1"]["kernel"]),
        np.asarray(new_vars["params"]["encoder"]["mid_block_1"]["conv1"]["kernel"]),
    )

    # Native distilled-checkpoint round trip.
    p = str(tmp_path / "distilled.msgpack")
    save_distilled_checkpoint(p, new_vars, cfg, final_loss=logs["total_loss"])
    restored = load_distilled_checkpoint(p, model.variables)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["encoder"]["conv_in"]["fclayer"]["w1"]["kernel"]),
        np.asarray(new_vars["params"]["encoder"]["conv_in"]["fclayer"]["w1"]["kernel"]),
    )


def test_load_reference_distilled_pt(tmp_path):
    """Reference format 2: .pt with encoder_conv_in/decoder_conv_out state
    dicts (weight_distill_train.py:398-426, new_autoencoder.py:358-380)."""
    from tests._torch_ref import torch_modules

    _, dynconv_t, _, _ = torch_modules()
    torch.manual_seed(0)
    conv_in_t = dynconv_t.DynamicConv(
        wv_planes=64, inter_dim=128, kernel_size=3, stride=1, padding=1,
        embed_dim=32, num_layers=1,
    )
    conv_out_t = dynconv_t.DynamicConv_decoder(
        wv_planes=64, inter_dim=128, kernel_size=3, stride=1, padding=1,
        embed_dim=32, num_layers=1,
    )
    ckpt = {
        "encoder_conv_in_state_dict": conv_in_t.state_dict(),
        "decoder_conv_out_state_dict": conv_out_t.state_dict(),
        "distill_config": {"final_loss": 1.2e-5},
    }
    path = str(tmp_path / "distilled_final.pt")
    torch.save(ckpt, path)

    model = EOFluxVAE(CFG, seed=3)
    before = np.asarray(
        model.variables["params"]["encoder"]["conv_in"]["weight_generator"]["fc_weight"]["kernel"]
    )
    model.load_checkpoint(path)
    after = np.asarray(
        model.variables["params"]["encoder"]["conv_in"]["weight_generator"]["fc_weight"]["kernel"]
    )
    assert not np.allclose(before, after)
    # Loaded stems reproduce the torch generator output exactly.
    wvs = np.array([0.665, 0.56, 0.49], dtype=np.float32)
    with torch.no_grad():
        w_ref, b_ref = conv_in_t.get_distillation_weight(torch.from_numpy(wvs))
    from eovax.nn.dynamic_conv import DynamicConv
    from eovax.models.backbone import EOVAECore

    w, b = model.core.apply(
        model.variables,
        np.asarray(wvs),
        method=lambda c, v: c.encoder.conv_in.get_distillation_weight(v),
    )
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b), b_ref.numpy(), rtol=2e-4, atol=2e-5)
