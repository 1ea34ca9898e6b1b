"""Public API tests: config parsing (reference YAML format), EOFluxVAE
wrapper (NCHW contract), native checkpoint round-trip."""

import numpy as np
import pytest

from eovax import EOFluxVAE
from eovax.core.config import VAEConfig, load_model_config

CONFIG_YAML = """
model:
  _target_: eo_vae.models.new_autoencoder.EOFluxVAE
  freeze_body: False
  base_lr: 1e-4
  final_lr: 2e-5
  warmup_epochs: 1
  decay_end_epoch: ${trainer.max_epochs}
  clip_grad: 1.0
  noise_tau: 0.0
  latent_noise_p: 0.0
  encoder:
    _target_: eo_vae.models.Encoder
    z_channels: 8
    resolution: 32
    in_channels: 3
    ch: 32
    ch_mult: [ 1,2 ]
    num_res_blocks: 1
    use_dynamic_ops: True
    dynamic_conv_kwargs:
      num_layers: 1
      wv_planes: 64
  decoder:
    _target_: eo_vae.models.Decoder
    z_channels: 8
    resolution: 32
    out_ch: 3
    ch: 32
    ch_mult: [ 1,2 ]
    num_res_blocks: 1
    use_dynamic_ops: True
    dynamic_conv_kwargs:
      num_layers: 1
      wv_planes: 64
trainer:
  max_epochs: 100
"""

WVS = np.array([0.665, 0.56, 0.49], dtype=np.float32)


@pytest.fixture(scope="module")
def config_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "model_config.yaml"
    p.write_text(CONFIG_YAML)
    return str(p)


def test_config_parses_reference_format(config_path):
    cfg = load_model_config(config_path)
    assert isinstance(cfg, VAEConfig)
    assert cfg.encoder.ch == 32
    assert cfg.encoder.ch_mult == (1, 2)
    assert cfg.encoder.stem.wv_planes == 64
    assert cfg.decoder.stem.num_layers == 1
    # ${trainer.max_epochs} interpolation resolved
    assert cfg.decay_end_epoch == 100
    assert cfg.clip_grad == 1.0


def test_interpolation_eval_resolver(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 4\nb: ${eval:${a} * 2 + 1}\nc: ${a}\n")
    from eovax.core.config import load_yaml

    cfg = load_yaml(str(p))
    assert cfg["b"] == 9
    assert cfg["c"] == 4


@pytest.mark.slow
def test_wrapper_nchw_contract(config_path):
    model = EOFluxVAE.from_config(config_path)
    g = np.random.default_rng(0)
    x = g.standard_normal((2, 3, 32, 32), dtype=np.float32)

    recon = model.reconstruct(x, WVS)
    assert recon.shape == (2, 3, 32, 32)

    post = model.encode(x, WVS)
    assert post.mean.shape == (2, 8, 16, 16)

    lat = model.encode_spatial_normalized(x, WVS)
    assert lat.shape == (2, 8, 16, 16)

    back = model.decode_spatial_normalized(lat, WVS)
    np.testing.assert_allclose(np.asarray(back), np.asarray(recon), atol=1e-5)

    packed = model.encode_to_latent(x, WVS)
    assert packed.shape == (2, 32, 8, 8)
    dec = model.decode(packed, WVS)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(recon), atol=1e-5)

    # Stochastic forward with EQ-VAE transforms compiles and runs.
    recon_s, post_s = model.forward(x, WVS, sample_posterior=True, seed=3)
    assert recon_s.shape == x.shape
    recon_rot, _ = model.forward(x, WVS, sample_posterior=False, angle=1)
    assert recon_rot.shape == x.shape
    recon_sc, _ = model.forward(x, WVS, sample_posterior=False, scale=0.5)
    assert recon_sc.shape == (2, 3, 16, 16)


def test_native_checkpoint_roundtrip(config_path, tmp_path):
    model = EOFluxVAE.from_config(config_path, seed=1)
    g = np.random.default_rng(1)
    x = g.standard_normal((1, 3, 32, 32), dtype=np.float32)
    ref = np.asarray(model.reconstruct(x, WVS))

    path = str(tmp_path / "model.msgpack")
    model.save(path)

    model2 = EOFluxVAE.from_config(config_path, seed=2)  # different init
    assert not np.allclose(np.asarray(model2.reconstruct(x, WVS)), ref)
    model2.load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(model2.reconstruct(x, WVS)), ref, atol=1e-6)


@pytest.mark.slow
def test_param_count_full_config():
    """Shipped config must hit the reference's measured parameter counts:
    encoder 40,176,128 / decoder 55,338,017 ≈ 95.5M (BASELINE.md)."""
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig

    stem = StemConfig(num_layers=4, wv_planes=256)
    cfg = VAEConfig(
        encoder=EncoderConfig(stem=stem),
        decoder=DecoderConfig(stem=stem),
    )
    model = EOFluxVAE(cfg)
    import jax

    enc_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(model.params["encoder"])
    )
    dec_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(model.params["decoder"])
    )
    assert enc_params == 40_176_128, enc_params
    assert dec_params == 55_338_017, dec_params


def test_eval_resolver_string_results():
    """Quoted-literal expressions unwrap once; expressions that legitimately
    PRODUCE a string return it unchanged (regression: the resolver used to
    re-evaluate every string result and raise on e.g. 'ab' + 'cd')."""
    from eovax.core.config import _safe_eval

    assert _safe_eval("'1 * 2000'") == 2000  # quoted literal -> unwrapped
    assert _safe_eval("'ab' + 'cd'") == "abcd"  # string-producing expr
    assert _safe_eval("2 ** 10") == 1024
