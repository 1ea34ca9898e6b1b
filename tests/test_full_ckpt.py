"""Format-3 checkpoint test: a full Lightning-style .ckpt (state_dict with
encoder/decoder/bn keys) loads end-to-end and reproduces torch outputs."""

import numpy as np
import torch
from einops import rearrange

from eovax import EOFluxVAE
from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
from tests._torch_ref import torch_modules

layers_t, dynconv_t, dist_t, model_t = torch_modules()

STEM = dict(num_layers=1, wv_planes=64)
ENC_KW = dict(resolution=32, in_channels=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              z_channels=8, use_dynamic_ops=True, dynamic_conv_kwargs=dict(STEM))
DEC_KW = dict(resolution=32, out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              z_channels=8, use_dynamic_ops=True, dynamic_conv_kwargs=dict(STEM))
WVS = np.asarray([0.665, 0.56, 0.49], np.float32)


def test_full_lightning_ckpt_roundtrip(tmp_path):
    torch.manual_seed(3)
    enc_t = model_t.Encoder(**ENC_KW).eval()
    dec_t = model_t.Decoder(**DEC_KW).eval()
    bn_t = torch.nn.BatchNorm2d(32, affine=False, track_running_stats=True)
    bn_t.running_mean.copy_(torch.randn(32) * 0.3)
    bn_t.running_var.copy_(torch.rand(32) + 0.5)

    # Assemble a Lightning-style checkpoint (nested under 'state_dict',
    # module prefixes encoder./decoder./bn. as in new_autoencoder).
    sd = {}
    for k, v in enc_t.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in dec_t.state_dict().items():
        sd[f"decoder.{k}"] = v
    for k, v in bn_t.state_dict().items():
        sd[f"bn.{k}"] = v
    sd["loss_fn.some_buffer"] = torch.zeros(3)  # expected extra (ignored)
    ckpt_path = str(tmp_path / "eo-vae.ckpt")
    torch.save({"state_dict": sd, "global_step": 1234}, ckpt_path)

    cfg = VAEConfig(
        encoder=EncoderConfig.from_dict(dict(ENC_KW)),
        decoder=DecoderConfig.from_dict(dict(DEC_KW)),
    )
    model = EOFluxVAE(cfg, seed=9)
    model.load_checkpoint(ckpt_path)

    # BN running stats must have round-tripped (part of the public
    # contract, SURVEY.md §5).
    np.testing.assert_allclose(
        np.asarray(model.variables["batch_stats"]["bn"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-6,
    )

    # Full reconstruct parity vs the torch pipeline.
    g = np.random.default_rng(7)
    x = g.standard_normal((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        moments = enc_t(torch.from_numpy(x), torch.from_numpy(WVS))
        z = torch.chunk(moments, 2, 1)[0]
        z_sh = rearrange(z, "b c (i pi) (j pj) -> b (c pi pj) i j", pi=2, pj=2)
        bn_t.eval()
        z_norm = bn_t(z_sh)
        s = torch.sqrt(bn_t.running_var.view(1, -1, 1, 1) + 1e-4)
        z_dec = z_norm * s + bn_t.running_mean.view(1, -1, 1, 1)
        z_dec = rearrange(z_dec, "b (c pi pj) i j -> b c (i pi) (j pj)", pi=2, pj=2)
        recon_ref = dec_t(z_dec, torch.from_numpy(WVS)).numpy()

    recon = np.asarray(model.reconstruct(x, WVS))
    np.testing.assert_allclose(recon, recon_ref, rtol=2e-3, atol=5e-4)


def test_export_state_dict_roundtrip_into_torch():
    """eovax → torch export: the reference torch modules load the exported
    dict strictly and reproduce eovax outputs."""
    from eovax.utils.torch_convert import export_state_dict

    cfg = VAEConfig(
        encoder=EncoderConfig.from_dict(dict(ENC_KW)),
        decoder=DecoderConfig.from_dict(dict(DEC_KW)),
    )
    model = EOFluxVAE(cfg, seed=11)
    exported = export_state_dict(model.variables)

    enc_sd = {k[len("encoder."):]: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in exported.items() if k.startswith("encoder.")}
    dec_sd = {k[len("decoder."):]: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in exported.items() if k.startswith("decoder.")}

    enc_t = model_t.Encoder(**ENC_KW).eval()
    dec_t = model_t.Decoder(**DEC_KW).eval()
    enc_t.load_state_dict(enc_sd, strict=True)
    dec_t.load_state_dict(dec_sd, strict=True)

    g = np.random.default_rng(12)
    x = g.standard_normal((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        moments_ref = enc_t(torch.from_numpy(x), torch.from_numpy(WVS)).numpy()
    post = model.encode(x, WVS)
    # BOTH moment halves: a corrupted logvar export would be invisible to
    # a mean-only check (logvar is clamped identically on both sides).
    np.testing.assert_allclose(
        np.asarray(post.mean), moments_ref[:, :8], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(post.logvar), moments_ref[:, 8:], rtol=2e-3, atol=2e-4
    )
    # And the DECODER actually runs with the exported weights: its output
    # must match eovax's decode on the same latent (strict key load alone
    # does not catch corrupted VALUES).
    z = np.asarray(post.mean, np.float32)
    with torch.no_grad():
        recon_ref = dec_t(torch.from_numpy(z), torch.from_numpy(WVS)).numpy()
    recon_ours = np.asarray(model.decode_raw(z, WVS))
    np.testing.assert_allclose(recon_ours, recon_ref, rtol=2e-3, atol=5e-4)
