"""Eval CLI tests: tokenizer metrics, table generators, latent PCA."""

import json

import pytest

import numpy as np

from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig

STEM = StemConfig(num_layers=1, wv_planes=64)
CFG = VAEConfig(
    encoder=EncoderConfig(resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
                          num_res_blocks=1, z_channels=8, use_dynamic_ops=True, stem=STEM),
    decoder=DecoderConfig(resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
                          num_res_blocks=1, z_channels=8, use_dynamic_ops=True, stem=STEM),
)


def test_evaluate_tokenizer_core():
    from eovax import EOFluxVAE
    from eovax.cli.evaluate_metrics_tokenizer import evaluate_tokenizer
    from eovax.data.synthetic import synthetic_terramesh_batches

    model = EOFluxVAE(CFG, seed=0)
    batches = synthetic_terramesh_batches(
        batch_size=2, target_size=(32, 32), modalities=("S2RGB",), mode="S2RGB",
        seed=0, num_batches=2,
    )
    results = evaluate_tokenizer(model, batches, num_batches=2)
    assert "S2RGB" in results
    assert np.isfinite(results["S2RGB"]["mse"])
    assert np.isfinite(results["S2RGB"]["psnr"])


def test_latent_pca_rgb():
    from eovax.cli.visual_eval import latent_pca_rgb

    g = np.random.default_rng(0)
    latent = g.standard_normal((2, 8, 16, 16)).astype(np.float32)
    rgb = latent_pca_rgb(latent)
    assert rgb.shape == (2, 16, 16, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_table_generators(tmp_path, capsys):
    from eovax.cli.generate_tables import main as tables_main

    for name, total in (("pixel", 100.0), ("eo-vae", 25.0)):
        (tmp_path / f"{name}.json").write_text(json.dumps({
            "name": name,
            "timing_ms": {"encode": 5, "sr_forward": total - 10, "decode": 5,
                          "total": total},
            "throughput_imgs_per_sec": 1000.0 / total,
            "memory_gb": {"peak_memory": 2.0},
            "parameters": {"total": 100_000_000},
        }))
    tables_main([str(tmp_path / "*.json"), "--baseline", "pixel"])
    out = capsys.readouterr().out
    assert "eo-vae" in out and "speedup" in out
    assert "4.0" in out  # 100/25 speedup

    tables_main([str(tmp_path / "*.json"), "--format", "latex"])
    out = capsys.readouterr().out
    assert "\\begin{tabular}" in out

    (tmp_path / "sr.json").write_text(json.dumps(
        {"name": "eo-vae", "rmse": 0.05, "psnr": 26.1, "ssim": 0.8, "sam": 0.1}
    ))
    tables_main([str(tmp_path / "sr.json"), "--kind", "sr"])
    out = capsys.readouterr().out
    assert "26.1" in out


def test_compare_weight_distill_core():
    from eovax import EOFluxVAE
    from eovax.cli.compare_weight_distill import compare

    g = np.random.default_rng(1)
    teacher = {
        "encoder_weight": g.normal(0, 0.1, (32, 3, 3, 3)).astype(np.float32),
        "encoder_bias": g.normal(0, 0.05, (32,)).astype(np.float32),
        "decoder_weight": g.normal(0, 0.1, (3, 32, 3, 3)).astype(np.float32),
        "decoder_bias": g.normal(0, 0.05, (3,)).astype(np.float32),
    }
    model = EOFluxVAE(CFG, seed=1)
    out = compare(model, teacher, [0.665, 0.560, 0.490])
    assert set(out) == {"encoder", "decoder"}
    assert np.isfinite(out["encoder"]["weight_mse"])


@pytest.mark.slow
def test_benchmark_cli_chained(tmp_path, capsys):
    """Benchmark CLI end-to-end on a tiny config: reference JSON schema,
    on-device chained timing (no per-iteration sync)."""
    cfg_yaml = tmp_path / "model_config.yaml"
    cfg_yaml.write_text(
        """
model:
  encoder:
    z_channels: 8
    resolution: 32
    in_channels: 4
    ch: 32
    ch_mult: [ 1,2 ]
    num_res_blocks: 1
    use_dynamic_ops: True
    dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}
  decoder:
    z_channels: 8
    resolution: 32
    out_ch: 4
    ch: 32
    ch_mult: [ 1,2 ]
    num_res_blocks: 1
    use_dynamic_ops: True
    dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}
"""
    )
    from eovax.cli.benchmark import main as bench_main

    out_json = tmp_path / "bench.json"
    bench_main([
        "--config", str(cfg_yaml), "--resolution", "32", "--iters", "2",
        "--sr-steps", "2", "--batch", "1", "--output", str(out_json),
    ])
    result = json.loads(out_json.read_text())
    assert result["model_type"] == "eo-vae"
    timing = result["timing_ms"]
    for key in ("encode", "sr_forward", "decode", "total"):
        assert timing[key] > 0
    assert result["throughput_imgs_per_sec"] > 0
    assert result["parameters"]["total"] > 0


@pytest.mark.slow
def test_benchmark_int8_quality_table(tmp_path, capsys):
    """--int8-quality emits the per-modality PSNR/MS-SSIM delta table
    (bf16 vs int8 reconstruction) in JSON (VERDICT r3 item #5)."""
    import json

    from eovax.cli.benchmark import main as bench_main

    cfg_yaml = tmp_path / "model_config.yaml"
    cfg_yaml.write_text(
        """
model:
  encoder:
    z_channels: 8
    resolution: 96
    in_channels: 3
    ch: 128
    ch_mult: [ 1,2 ]
    num_res_blocks: 1
    use_dynamic_ops: True
    dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}
  decoder:
    z_channels: 8
    resolution: 96
    out_ch: 3
    ch: 128
    ch_mult: [ 1,2 ]
    num_res_blocks: 1
    use_dynamic_ops: True
    dynamic_conv_kwargs: {num_layers: 1, wv_planes: 64}
"""
    )
    out = tmp_path / "quality.json"
    bench_main([
        "--config", str(cfg_yaml), "--int8-quality",
        "--modalities", "S2RGB", "S1RTC",
        "--batch", "1", "--resolution", "96", "--output", str(out),
    ])
    result = json.loads(out.read_text())
    assert result["mode"] == "int8-quality"
    assert set(result["modalities"]) == {"S2RGB", "S1RTC"}
    for m in result["modalities"].values():
        for k in ("psnr_bf16", "psnr_int8", "psnr_delta",
                  "msssim_bf16", "msssim_int8", "msssim_delta"):
            assert np.isfinite(m[k]), (k, m)
    # stdout table printed
    assert "PSNR bf16" in capsys.readouterr().out
