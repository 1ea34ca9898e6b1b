"""CLI smoke tests + sen2naip/stats/metrics unit tests."""

import json
import os

import numpy as np
import pytest


def test_running_stats_matches_numpy():
    from eovax.utils.stats import RunningStats

    g = np.random.default_rng(0)
    data = g.normal(3.0, 2.5, (40, 8, 8, 5)).astype(np.float32)
    rs = RunningStats((5,), (0, 1, 2))
    for i in range(0, 40, 7):
        rs.update(data[i : i + 7])
    flat = data.reshape(-1, 5)
    np.testing.assert_allclose(rs.mean, flat.mean(0), rtol=1e-5)
    np.testing.assert_allclose(rs.std, flat.std(0), rtol=1e-2)
    np.testing.assert_allclose(rs.min, flat.min(0), rtol=1e-6)
    np.testing.assert_allclose(rs.max, flat.max(0), rtol=1e-6)


def test_reference_latent_stats_regression_values():
    """The vendored LATENT_STATS must match BASELINE.md's regression
    targets (mean[0]=-1.7888, std[0]=1.8264 for 'eo-vae')."""
    from eovax.data.sen2naip import reference_latent_stats

    stats = reference_latent_stats("eo-vae")
    assert stats["mean"].shape == (32,)
    np.testing.assert_allclose(stats["mean"][0], -1.7888, atol=1e-4)
    np.testing.assert_allclose(stats["std"][0], 1.8264, atol=1e-4)


def test_spatial_split_deterministic():
    from eovax.data.sen2naip import assign_spatial_split

    g = np.random.default_rng(1)
    lons = g.uniform(-120, -80, 500)
    lats = g.uniform(30, 45, 500)
    labels = assign_spatial_split(lons, lats)
    labels2 = assign_spatial_split(lons, lats)
    np.testing.assert_array_equal(labels, labels2)
    fracs = {s: float(np.mean(labels == s)) for s in ("train", "val", "test")}
    assert 0.6 < fracs["train"] < 0.95
    assert fracs["val"] > 0 and fracs["test"] > 0


@pytest.fixture()
def latent_root(tmp_path):
    g = np.random.default_rng(2)
    root = tmp_path / "latents"
    stats = {
        "lr_latent": {"mean": g.normal(size=8).tolist(), "std": (g.uniform(0.5, 2, 8)).tolist()},
        "hr_latent": {"mean": g.normal(size=8).tolist(), "std": (g.uniform(0.5, 2, 8)).tolist()},
    }
    (root / "train").mkdir(parents=True)
    (root / "latent_stats.json").write_text(json.dumps(stats))
    for i in range(5):
        np.savez_compressed(
            root / "train" / f"aoi{i}.npz",
            lr_latent=g.normal(size=(8, 16, 16)).astype(np.float32),
            hr_latent=g.normal(size=(8, 16, 16)).astype(np.float32),
            lr_image=g.normal(size=(4, 128, 128)).astype(np.float32),
            hr_image=g.normal(size=(4, 128, 128)).astype(np.float32),
        )
    return str(root)


def test_sen2naip_latent_dataset(latent_root):
    from eovax.data.sen2naip import Sen2NaipCrossSensorLatent

    ds = Sen2NaipCrossSensorLatent(latent_root, "train", latent_scale_factor=2.0)
    assert len(ds) == 5
    s = ds[0]
    assert s["image_hr"].shape == (16, 16, 8)
    assert s["image_lr"].shape == (16, 16, 8)
    # Both normalized with HR stats then ×2 scale.
    raw = np.load(os.path.join(latent_root, "train", sorted(os.listdir(latent_root + "/train"))[0]))
    expected = (
        (np.transpose(raw["lr_latent"], (1, 2, 0)) - ds.hr_mean) / ds.hr_std * 2.0
    )
    np.testing.assert_allclose(s["image_lr"], expected, rtol=1e-5)

    batches = list(ds.batches(2, shuffle=True, seed=0))
    assert batches[0]["image_hr"].shape == (2, 16, 16, 8)


def test_sen2naip_collates():
    from eovax.data.sen2naip import sen2naip_collate, sen2naip_domain_adapted_collate

    g = np.random.default_rng(3)
    samples = [
        {
            "image_lr": g.uniform(0, 4000, (32, 32, 4)).astype(np.float32),
            "image_hr": g.uniform(0, 255, (128, 128, 4)).astype(np.float32),
            "aoi": f"a{i}",
        }
        for i in range(2)
    ]
    out = sen2naip_collate(samples)
    assert out["image_lr"].shape == (2, 128, 128, 4)  # bicubic-upsampled to HR
    assert out["image_hr"].shape == (2, 128, 128, 4)

    out2 = sen2naip_domain_adapted_collate(samples)
    assert out2["image_lr"].shape == (2, 128, 128, 4)
    # DA targets roughly loc -0.4 / scale 0.6 for z-scored NAIP.
    assert abs(float(out2["image_hr"].mean())) < 5.0


def test_metrics_sanity():
    import jax.numpy as jnp

    from eovax.utils.metrics import mae, psnr, rmse, spectral_angle, ssim

    g = np.random.default_rng(4)
    a = jnp.asarray(g.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    assert float(psnr(a, a)) > 80
    assert float(rmse(a, a)) == 0
    assert float(mae(a, a)) == 0
    assert float(spectral_angle(a, a)) < 1e-3
    assert float(ssim(a, a, data_range=1.0)) > 0.999
    b = a + 0.1
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=0.5)


def test_weight_distill_cli(tmp_path):
    """End-to-end stage-1 CLI with a synthetic safetensors teacher."""
    import safetensors.numpy

    from eovax.cli.weight_distill import main as distill_main

    config = tmp_path / "model_config.yaml"
    config.write_text(
        """
model:
  encoder: {z_channels: 8, resolution: 32, in_channels: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
  decoder: {z_channels: 8, resolution: 32, out_ch: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
"""
    )
    g = np.random.default_rng(5)
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
    out = str(tmp_path / "distilled.msgpack")
    distill_main([
        "--config", str(config), "--teacher", teacher_path,
        "--output", out, "--max-steps", "50",
    ])
    assert os.path.exists(out)


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    from eovax.cli.train import main as train_main

    config = tmp_path / "train.yaml"
    config.write_text(
        """
model:
  base_lr: 1e-3
  clip_grad: 1.0
  loss_fn: {_target_: eo_vae.models.modules.consistency_loss.EOConsistencyLoss,
            rec_loss_type: char, pixel_weight: 1.0}
  encoder: {z_channels: 8, resolution: 32, in_channels: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
  decoder: {z_channels: 8, resolution: 32, out_ch: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
datamodule: {batch_size: 4, eval_batch_size: 4, target_size: [32, 32],
             modalities: [S2RGB, S1RTC]}
trainer: {max_epochs: 1, limit_train_batches: 3, log_every_n_steps: 0}
"""
    )
    train_main([
        "--config", str(config), "--debug", "--synthetic-data",
        "--max-steps", "3", "--precision", "32-true",
    ])


@pytest.mark.slow
def test_train_cli_flow_refine(tmp_path):
    """Flow-refine routing (reference train.py:120-130): a config with
    training_mode: flow-refine trains the refiner on VAE reconstructions."""
    from eovax.cli.train import main as train_main

    config = tmp_path / "refine.yaml"
    config.write_text(
        """
model:
  training_mode: flow-refine
  base_lr: 1e-3
  refiner: {hid_channels: [16, 16], hid_blocks: [1, 1], sampler_steps: 2}
  encoder: {z_channels: 8, resolution: 32, in_channels: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
  decoder: {z_channels: 8, resolution: 32, out_ch: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
datamodule: {batch_size: 2, target_size: [32, 32], modalities: [S2RGB],
             val_collate_mode: S2RGB}
trainer: {max_epochs: 1, limit_train_batches: 2, log_every_n_steps: 0}
"""
    )
    train_main([
        "--config", str(config), "--debug", "--synthetic-data",
        "--max-steps", "2", "--precision", "32-true",
    ])


def test_encode_latents_core(tmp_path):
    """encode_split with synthetic batches produces the reference npz +
    stats schema."""
    from eovax import EOFluxVAE
    from eovax.cli.encode_latents import encode_split
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.data.sen2naip import SEN2NAIP_WVS
    from eovax.utils.stats import RunningStats

    stem = StemConfig(num_layers=1, wv_planes=64)
    cfg = VAEConfig(
        encoder=EncoderConfig(resolution=32, in_channels=4, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=8, use_dynamic_ops=True,
                              stem=stem),
        decoder=DecoderConfig(resolution=32, out_ch=4, ch=32, ch_mult=(1, 2),
                              num_res_blocks=1, z_channels=8, use_dynamic_ops=True,
                              stem=stem),
    )
    model = EOFluxVAE(cfg, seed=0)
    g = np.random.default_rng(6)
    batches = [
        {
            "image_lr": g.normal(size=(2, 32, 32, 4)).astype(np.float32),
            "image_hr": g.normal(size=(2, 32, 32, 4)).astype(np.float32),
            "aoi": [f"a{i}", f"b{i}"],
        }
        for i in range(2)
    ]
    stats_lr = RunningStats((8,), (0, 1, 2))
    stats_hr = RunningStats((8,), (0, 1, 2))
    n = encode_split(
        model, iter(batches), str(tmp_path / "train"), wvs=SEN2NAIP_WVS,
        stats_lr=stats_lr, stats_hr=stats_hr, use_spatial_norm=True,
    )
    assert n == 4
    files = sorted(os.listdir(tmp_path / "train"))
    assert len(files) == 4
    with np.load(tmp_path / "train" / files[0]) as d:
        assert d["lr_latent"].shape == (8, 16, 16)  # CHW reference schema
        assert d["hr_image"].shape == (4, 32, 32)
    assert stats_hr.count > 0


def test_streaming_histogram_and_quantile():
    from eovax.utils.histogram import StreamingHistogram

    g = np.random.default_rng(8)
    hist = StreamingHistogram(3, min_val=-10, max_val=10, bins=200)
    data = g.normal(0, 2, (5, 16, 16, 3)).astype(np.float32)
    hist.update(data)
    assert hist.hist_counts.sum() > 0
    med = hist.quantile(0.5)
    assert np.all(np.abs(med) < 1.0)  # roughly centered


def test_inspect_terramesh_cli(tmp_path):
    from eovax.cli.inspect_terramesh import inspect_shard
    from tests._zarr_helpers import write_terramesh_shard

    g = np.random.default_rng(9)
    shard = str(tmp_path / "s.tar")
    write_terramesh_shard(
        shard,
        [{"bands": g.normal(size=(1, 3, 8, 8)).astype("<f4"), "time": 0}],
    )
    reports = inspect_shard(shard, max_samples=2)
    assert len(reports) == 1
    info = reports[0]["zarr.zip"]["arrays"]["bands"]
    assert info["shape"] == [1, 3, 8, 8]


def test_seasonet_datamodule_with_fake_torchgeo(monkeypatch):
    """SeasoNet legacy path (datamodule.py parity): /3000 scaling, resize,
    train flips, RGB band subset stats — exercised against a stub
    torchgeo (the real one isn't in the TPU image)."""
    import sys
    import types

    import numpy as np

    from eovax.data.seasonet import (
        SEASONET_MEANS,
        SEASONET_STDS,
        make_seasonet_datamodule,
        seasonet_stats,
    )

    m, s = seasonet_stats(["10m_RGB"])
    assert m.shape == (3,) and s.shape == (3,)
    np.testing.assert_allclose(m, SEASONET_MEANS[:3])
    m12, s12 = seasonet_stats()
    assert m12.shape == (12,) and np.all(s12 == SEASONET_STDS)

    class FakeSeasoNet:
        def __init__(self, root, **kwargs):
            self.g = np.random.default_rng(0)

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"image": self.g.normal(1500, 300, (12, 64, 64)).astype(np.float32)}

    fake_ds_mod = types.ModuleType("torchgeo.datasets")
    fake_ds_mod.SeasoNet = FakeSeasoNet
    fake_tg = types.ModuleType("torchgeo")
    fake_tg.datasets = fake_ds_mod
    monkeypatch.setitem(sys.modules, "torchgeo", fake_tg)
    monkeypatch.setitem(sys.modules, "torchgeo.datasets", fake_ds_mod)

    batches = make_seasonet_datamodule("/nonexistent", batch_size=2, size=32, seed=0)
    batch = next(batches())
    assert batch["image"].shape == (2, 32, 32, 12)
    assert batch["wvs"].shape == (12,)
    # /3000 scaling applied: values around 0.5, not 1500.
    assert 0.1 < float(batch["image"].mean()) < 1.0


def test_csv_logger_appends_linear(tmp_path):
    """Rows append in O(1); the file is rewritten only when the column set
    grows; the final CSV parses with the union of columns."""
    import csv

    from eovax.utils.logging import CSVLogger

    lg = CSVLogger(str(tmp_path))
    lg.log(1, {"a": 1.0})
    sizes = []
    import os as _os
    for step in range(2, 12):
        lg.log(step, {"a": float(step)})
        sizes.append(_os.path.getsize(lg.path))
    deltas = np.diff(sizes)
    # Linear growth: per-row byte cost is bounded and ~constant (a full
    # rewrite per row would make deltas grow with the row count).
    assert max(deltas) <= min(deltas) + 4

    # New column → one rewrite; old rows gain an empty cell.
    lg.log(12, {"a": 12.0, "b": 99.0})
    with open(lg.path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 12
    assert rows[0]["b"] == "" and rows[-1]["b"] == "99.0"
    assert [r["step"] for r in rows] == [str(s) for s in range(1, 13)]

    # Resume into the same dir (--resume-dir preemption recovery): a
    # fresh logger must APPEND to the existing history, not truncate it.
    lg2 = CSVLogger(str(tmp_path))
    lg2.log(13, {"a": 13.0, "b": 1.0})
    with open(lg2.path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 13
    assert [r["step"] for r in rows] == [str(s) for s in range(1, 14)]


@pytest.mark.slow
def test_train_cli_publishes_best_model(tmp_path, capsys):
    """Non-debug runs publish BOTH eo-vae-final.msgpack and the
    best-by-val/loss_rec eo-vae-best.msgpack (reference ModelCheckpoint
    monitor='val/loss_rec' save_top_k=1, train.py:155-162)."""
    import os

    from eovax.cli.train import main as train_main

    config = tmp_path / "train.yaml"
    config.write_text(
        """
model:
  base_lr: 1e-3
  clip_grad: 1.0
  loss_fn: {_target_: eo_vae.models.modules.consistency_loss.EOConsistencyLoss,
            rec_loss_type: char, pixel_weight: 1.0}
  encoder: {z_channels: 8, resolution: 32, in_channels: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
  decoder: {z_channels: 8, resolution: 32, out_ch: 3, ch: 32,
            ch_mult: [1, 2], num_res_blocks: 1, use_dynamic_ops: True,
            dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}}
datamodule: {batch_size: 4, eval_batch_size: 4, target_size: [32, 32],
             modalities: [S2RGB]}
trainer: {max_epochs: 1, limit_train_batches: 1, log_every_n_steps: 0}
experiment: {exp_dir: %s, experiment_name: best-test}
""" % tmp_path
    )
    exp = tmp_path / "exp"
    train_main([
        "--config", str(config), "--synthetic-data", "--max-steps", "2",
        "--precision", "32-true", "--resume-dir", str(exp),
    ])
    out = capsys.readouterr().out
    assert os.path.exists(exp / "eo-vae-final.msgpack")
    assert os.path.exists(exp / "eo-vae-best.msgpack"), out
    assert "Saved best model (val/loss_rec=" in out


def test_running_stats_single_sample_batch_stays_finite():
    """A batch with ONE reduced sample per channel (x.size == channels)
    must not poison the accumulator with ddof=1 NaNs (round-3 review)."""
    import numpy as np

    from eovax.utils.stats import RunningStats

    g = np.random.default_rng(0)
    rs = RunningStats((3,), (0, 1, 2))
    big = g.standard_normal((4, 2, 2, 3))
    rs.update(big)
    rs.update(g.standard_normal((1, 1, 1, 3)))  # ddof=1 would divide by 0
    assert np.isfinite(rs.var).all() and np.isfinite(rs.std).all()
    # accumulator still tracks the data (loose check vs the big batch)
    assert np.all(rs.count == 4 * 2 * 2 + 1)


def test_pixel_dataset_batches_collate():
    """Sen2NaipCrossSensor.batches composes the z-score/bicubic collate
    into trainer-ready pixel batches (rasterio-free via synthetic tifs)."""
    import numpy as np

    from eovax.data import sen2naip as sn

    class Synthetic(sn.Sen2NaipCrossSensor):
        def __init__(self):  # skip rasterio / disk
            self.lr_size, self.hr_size = 8, 32
            self.collate = sn.sen2naip_collate
            self._g = np.random.default_rng(0)

        def __len__(self):
            return 5

        def __getitem__(self, idx):
            return {
                "image_lr": self._g.standard_normal((8, 8, 4)).astype(np.float32),
                "image_hr": self._g.standard_normal((32, 32, 4)).astype(np.float32),
                "aoi": f"aoi{idx}",
            }

    ds = Synthetic()
    batches = list(ds.batches(2, shuffle=True, seed=1))
    assert len(batches) == 2  # 5 samples, drop_remainder
    b = batches[0]
    assert b["image_hr"].shape == (2, 32, 32, 4)
    # LR is bicubic-upsampled to HR size by the collate
    assert b["image_lr"].shape == (2, 32, 32, 4)
    assert np.asarray(b["wvs"]).shape == (4,)
    assert np.isfinite(b["image_lr"]).all() and np.isfinite(b["image_hr"]).all()


@pytest.mark.slow
def test_sr_cli_pixel_space(tmp_path, monkeypatch):
    """The pixel-space reference config (KarrasDenoiser + VPSchedule,
    4-channel images, datamodule _target_ without 'Latent') trains
    through the SR CLI — previously it crashed into the latent dataset."""
    import numpy as np
    import yaml

    from eovax.cli.train_super_res import main as sr_main
    from eovax.data import sen2naip as sn

    class Synthetic:
        def __init__(self, root, split, collate=None, lr_size=8, hr_size=16):
            self.split = split
            self._g = np.random.default_rng(0)

        def batches(self, bs, **kw):
            for _ in range(4):
                yield {
                    "image_lr": self._g.standard_normal(
                        (bs, 16, 16, 4)).astype(np.float32),
                    "image_hr": self._g.standard_normal(
                        (bs, 16, 16, 4)).astype(np.float32),
                    "wvs": sn.SEN2NAIP_WVS,
                }

    monkeypatch.setattr(sn, "Sen2NaipCrossSensor", Synthetic)
    cfg = {
        "trainer": {"max_epochs": 1, "log_every_n_steps": 0,
                    "limit_train_batches": 2, "val_every": 0},
        "lightning_module": {
            "base_lr": 1e-4,
            "denoiser": {
                "_target_": "KarrasDenoiser",
                "backbone": {"in_channels": 4, "out_channels": 4,
                             "cond_channels": 4, "hid_channels": [8, 16],
                             "hid_blocks": [1, 1]},
                "schedule": {"_target_": "VPSchedule"},
            },
            "sampler": {"_target_": "DDIMSampler", "steps": 2},
        },
        "datamodule": {
            "_target_": "eo_vae.datasets.sen2naip.Sen2NaipCrossSensorDataModule",
            "root": str(tmp_path), "batch_size": 2,
        },
    }
    cfg_path = tmp_path / "pixel.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    sr_main(["--config", str(cfg_path), "--debug", "--max-steps", "2"])
