"""Tiled large-scene inference: grid coverage, blend partition-of-unity,
identity-function exactness, and model smoke."""

import numpy as np
import pytest

from eovax.utils.tiling import _hann2d, tile_grid, tiled_apply, tiled_reconstruct


def test_tile_grid_covers_and_clamps():
    starts = tile_grid(100, 32, 8)
    assert starts[0] == 0 and starts[-1] == 100 - 32
    # full coverage with >= overlap sharing
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s : s + 32] = True
    assert covered.all()
    for a, b in zip(starts, starts[1:]):
        assert b - a <= 32 - 8
    assert tile_grid(32, 32, 8) == [0]
    assert tile_grid(20, 32, 8) == [0]


def test_identity_function_is_exact():
    """With fn=identity, blended tiling must reproduce the scene exactly —
    the Hann weights cancel in the weighted average."""
    g = np.random.default_rng(0)
    x = g.standard_normal((3, 80, 112)).astype(np.float32)
    out = tiled_apply(lambda t: t, x, tile=32, overlap=16, batch_size=4)
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_channel_change_and_batching():
    x = np.ones((2, 64, 64), np.float32)
    out = tiled_apply(
        lambda t: t.sum(axis=1, keepdims=True), x,
        tile=32, overlap=8, batch_size=3, out_channels=1,
    )
    assert out.shape == (1, 64, 64)
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_hann_weight_positive():
    w = _hann2d(16)
    assert w.shape == (16, 16) and (w > 0).all()


def test_errors():
    x = np.zeros((3, 16, 16), np.float32)
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, x, tile=32)
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, np.zeros((2, 3, 64, 64), np.float32), tile=32)
    # overlap >= tile would busy-NaN (coords empty / zero stride)
    big = np.zeros((3, 64, 64), np.float32)
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, big, tile=32, overlap=32)
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, big, tile=32, overlap=40)
    with pytest.raises(ValueError):
        tiled_apply(lambda t: t, big, tile=32, overlap=-1)


@pytest.mark.slow
def test_tiled_reconstruct_smoke():
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.models.eo_flux_vae import EOFluxVAE

    stem = StemConfig(num_layers=1, wv_planes=64)
    cfg = VAEConfig(
        encoder=EncoderConfig(resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=8, use_dynamic_ops=True,
                              stem=stem),
        decoder=DecoderConfig(resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=8, use_dynamic_ops=True,
                              stem=stem),
    )
    model = EOFluxVAE(cfg, seed=0)
    g = np.random.default_rng(1)
    scene = g.standard_normal((3, 64, 96)).astype(np.float32)
    out = tiled_reconstruct(model, scene, [0.665, 0.56, 0.49],
                            tile=32, overlap=16, batch_size=4)
    assert out.shape == (3, 64, 96)
    assert np.isfinite(out).all()
    # interior consistency: a direct reconstruct of one interior tile stays
    # close to the blended output away from that tile's borders
    direct = np.asarray(model.reconstruct(scene[None, :, 16:48, 32:64],
                                          [0.665, 0.56, 0.49]))[0]
    diff = np.abs(out[:, 24:40, 40:56] - direct[:, 8:24, 8:24])
    assert float(diff.mean()) < float(np.abs(direct).mean())


@pytest.mark.slow
def test_reconstruct_cli_tiled(tmp_path):
    import yaml

    from eovax.cli.reconstruct import main as recon_main
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.models.eo_flux_vae import EOFluxVAE

    cfg = {
        "model": {
            "encoder": {"z_channels": 8, "resolution": 32, "in_channels": 3,
                        "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "use_dynamic_ops": True,
                        "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64}},
            "decoder": {"z_channels": 8, "resolution": 32, "out_ch": 3,
                        "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "use_dynamic_ops": True,
                        "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64}},
        }
    }
    cfg_path = tmp_path / "model_config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    stem = StemConfig(num_layers=1, wv_planes=64)
    vcfg = VAEConfig(
        encoder=EncoderConfig(resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=8, use_dynamic_ops=True,
                              stem=stem),
        decoder=DecoderConfig(resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=8, use_dynamic_ops=True,
                              stem=stem),
    )
    model = EOFluxVAE(vcfg, seed=0)
    ckpt = tmp_path / "m.msgpack"
    model.save(str(ckpt))

    scene = np.random.default_rng(0).standard_normal((3, 64, 64)).astype(np.float32)
    np.save(tmp_path / "scene.npy", scene)
    out = tmp_path / "recon.npy"
    recon_main([
        "--config", str(cfg_path), "--ckpt", str(ckpt),
        "--image", str(tmp_path / "scene.npy"), "--modality", "S2RGB",
        "--output", str(out), "--tiled", "--tile", "32", "--overlap", "16",
        "--tile-batch", "4",
    ])
    r = np.load(out)
    assert r.shape == (1, 3, 64, 64) and np.isfinite(r).all()
