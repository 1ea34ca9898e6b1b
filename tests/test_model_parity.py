"""Full-model golden tests: eovax Encoder/Decoder/EOVAECore vs the torch
reference (model.py + the latent pipeline semantics of new_autoencoder.py).

Uses a reduced architecture (ch=32, 2 levels) for CPU speed; the layer
topology is identical to the shipped config modulo width/depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from einops import rearrange

from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig
from eovax.models.backbone import Decoder, Encoder, EOVAECore
from eovax.utils.torch_convert import _merge_arrays, convert_state_dict
from tests._torch_ref import torch_modules, torch_state_dict_numpy

layers_t, dynconv_t, dist_t, model_t = torch_modules()

STEM = dict(num_layers=1, wv_planes=64)
ENC_KW = dict(
    resolution=32, in_channels=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
    z_channels=8, use_dynamic_ops=True, dynamic_conv_kwargs=dict(STEM),
)
DEC_KW = dict(
    resolution=32, out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
    z_channels=8, use_dynamic_ops=True, dynamic_conv_kwargs=dict(STEM),
)

WVS = np.array([0.665, 0.56, 0.49], dtype=np.float32)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _convert(torch_mod, template, prefix=()):
    sd = torch_state_dict_numpy(torch_mod)
    updates, report = convert_state_dict(sd, template, prefix=prefix)
    assert not report.unexpected, f"unconverted: {report.unexpected[:5]}"
    merged = {k: dict(v) for k, v in template.items()}
    _merge_arrays(merged, updates)
    return merged


@pytest.fixture(scope="module")
def torch_pair():
    torch.manual_seed(7)
    enc = model_t.Encoder(**ENC_KW).eval()
    dec = model_t.Decoder(**DEC_KW).eval()
    return enc, dec


@pytest.fixture(scope="module")
def x():
    g = np.random.default_rng(11)
    return g.standard_normal((2, 3, 32, 32), dtype=np.float32)


def test_encoder_parity(torch_pair, x):
    enc_t, _ = torch_pair
    with torch.no_grad():
        moments_ref = enc_t(torch.from_numpy(x), torch.from_numpy(WVS)).numpy()

    cfg = EncoderConfig.from_dict(dict(ENC_KW))
    enc = Encoder(cfg)
    template = enc.init(jax.random.PRNGKey(0), _nhwc(x), jnp.asarray(WVS))
    variables = _convert(enc_t, template)
    moments = enc.apply(variables, _nhwc(x), jnp.asarray(WVS))
    np.testing.assert_allclose(_nchw(moments), moments_ref, rtol=2e-3, atol=2e-4)


def test_decoder_parity(torch_pair):
    _, dec_t = torch_pair
    g = np.random.default_rng(12)
    z = g.standard_normal((2, 8, 8, 8), dtype=np.float32)  # NCHW [B,z,8,8]
    with torch.no_grad():
        out_ref = dec_t(torch.from_numpy(z), torch.from_numpy(WVS)).numpy()

    cfg = DecoderConfig.from_dict(dict(DEC_KW))
    dec = Decoder(cfg)
    template = dec.init(jax.random.PRNGKey(0), _nhwc(z), jnp.asarray(WVS))
    variables = _convert(dec_t, template)
    out = dec.apply(variables, _nhwc(z), jnp.asarray(WVS))
    np.testing.assert_allclose(_nchw(out), out_ref, rtol=2e-3, atol=2e-4)


def test_core_reconstruct_parity(torch_pair, x):
    """Full eval-mode pipeline: encode → mode → shuffle → BN(eval) →
    invBN → unshuffle → decode (new_autoencoder.py:447-478,423-429)."""
    enc_t, dec_t = torch_pair
    bn_t = torch.nn.BatchNorm2d(4 * 8, affine=False, track_running_stats=True).eval()
    # Non-trivial running stats to exercise the inverse path.
    torch.manual_seed(21)
    bn_t.running_mean.copy_(torch.randn(32) * 0.5)
    bn_t.running_var.copy_(torch.rand(32) * 2 + 0.5)

    with torch.no_grad():
        moments = enc_t(torch.from_numpy(x), torch.from_numpy(WVS))
        post = dist_t.DiagonalGaussianDistribution(moments)
        z = post.mode()
        z_sh = rearrange(z, "b c (i pi) (j pj) -> b (c pi pj) i j", pi=2, pj=2)
        z_norm = bn_t(z_sh)
        # decode: inverse BN with bn_eps=1e-4 (new_autoencoder.py:538-543)
        s = torch.sqrt(bn_t.running_var.view(1, -1, 1, 1) + 1e-4)
        m = bn_t.running_mean.view(1, -1, 1, 1)
        z_dec = z_norm * s + m
        z_dec = rearrange(z_dec, "b (c pi pj) i j -> b c (i pi) (j pj)", pi=2, pj=2)
        recon_ref = dec_t(z_dec, torch.from_numpy(WVS)).numpy()
        latent_ref = rearrange(
            z_norm, "b (c pi pj) i j -> b c (i pi) (j pj)", pi=2, pj=2
        ).numpy()

    core = EOVAECore(
        encoder_cfg=EncoderConfig.from_dict(dict(ENC_KW)),
        decoder_cfg=DecoderConfig.from_dict(dict(DEC_KW)),
    )
    template = core.init(
        jax.random.PRNGKey(0), _nhwc(x), jnp.asarray(WVS),
        sample_posterior=False, method=EOVAECore.forward,
    )
    variables = _convert(enc_t, template, prefix=("encoder",))
    upd_dec, rep = convert_state_dict(
        torch_state_dict_numpy(dec_t), template, prefix=("decoder",)
    )
    assert not rep.unexpected
    _merge_arrays(variables, upd_dec)
    variables["batch_stats"] = {
        "bn": {
            "mean": jnp.asarray(bn_t.running_mean.numpy()),
            "var": jnp.asarray(bn_t.running_var.numpy()),
        }
    }

    recon, post = core.apply(
        variables, _nhwc(x), jnp.asarray(WVS),
        sample_posterior=False, method=EOVAECore.forward,
    )
    np.testing.assert_allclose(_nchw(recon), recon_ref, rtol=2e-3, atol=5e-4)

    latent = core.apply(
        variables, _nhwc(x), jnp.asarray(WVS),
        method=EOVAECore.encode_spatial_normalized,
    )
    np.testing.assert_allclose(_nchw(latent), latent_ref, rtol=2e-3, atol=2e-4)

    # Round-trip: decode_spatial_normalized(encode_spatial_normalized) ==
    # reconstruct.
    recon2 = core.apply(
        variables, latent, jnp.asarray(WVS),
        method=EOVAECore.decode_spatial_normalized,
    )
    np.testing.assert_allclose(
        np.asarray(recon2), np.asarray(recon), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("channels", [2, 3, 12, 13])
def test_modality_shapes(channels):
    """One model handles all four sensor channel counts (SURVEY.md §2.1)."""
    core = EOVAECore(
        encoder_cfg=EncoderConfig.from_dict(dict(ENC_KW)),
        decoder_cfg=DecoderConfig.from_dict({**DEC_KW}),
    )
    wvs = jnp.linspace(0.4, 2.5, channels)
    x = jnp.zeros((1, 32, 32, channels))
    variables = core.init(
        jax.random.PRNGKey(0), x, wvs, sample_posterior=False,
        method=EOVAECore.forward,
    )
    recon, post = core.apply(
        variables, x, wvs, sample_posterior=False, method=EOVAECore.forward
    )
    assert recon.shape == (1, 32, 32, channels)
    # ch_mult=[1,2] → one downsample: 32² → 16² latent grid, z=8 channels.
    assert post.mean.shape == (1, 16, 16, 8)
