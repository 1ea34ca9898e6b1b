"""Serving export: StableHLO artifact round-trip, symbolic batch,
numerical parity with the live model, loader independence."""

import numpy as np
import pytest

from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
from eovax.models.eo_flux_vae import EOFluxVAE

STEM = StemConfig(num_layers=1, wv_planes=64)
CFG = VAEConfig(
    encoder=EncoderConfig(resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
                          num_res_blocks=1, z_channels=8, use_dynamic_ops=True, stem=STEM),
    decoder=DecoderConfig(resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
                          num_res_blocks=1, z_channels=8, use_dynamic_ops=True, stem=STEM),
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from eovax.serving import export_model

    model = EOFluxVAE(CFG, seed=0)
    out = tmp_path_factory.mktemp("artifact")
    manifest = export_model(model, str(out), modalities=("S2RGB",), resolution=32)
    return model, str(out), manifest


@pytest.mark.slow
def test_manifest_and_files(artifact):
    import os

    model, out, manifest = artifact
    assert manifest["format"] == "eovax-serving-v1"
    assert len(manifest["functions"]) == 3
    for entry in manifest["functions"].values():
        assert os.path.exists(os.path.join(out, entry["file"]))
    assert os.path.exists(os.path.join(out, manifest["params"]))
    # latent fn signature: ch_mult (1,2) -> one downsample -> 16x16 latent
    dec = manifest["functions"]["decode_spatial_normalized.S2RGB"]
    assert dec["input_shape"] == ["b", 8, 16, 16]


@pytest.mark.slow
def test_served_matches_live_model(artifact):
    from eovax.serving import ServedModel

    model, out, _ = artifact
    served = ServedModel.load(out)
    assert served.modalities == ["S2RGB"]

    g = np.random.default_rng(0)
    x = g.standard_normal((2, 3, 32, 32)).astype(np.float32)
    wvs = [0.665, 0.56, 0.49]

    ref = np.asarray(model.reconstruct(x, wvs))
    got = np.asarray(served.reconstruct(x, modality="S2RGB"))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    z_ref = np.asarray(model.encode_spatial_normalized(x, wvs))
    z_got = np.asarray(served.encode_spatial_normalized(x, modality="S2RGB"))
    np.testing.assert_allclose(z_got, z_ref, atol=1e-5, rtol=1e-5)

    back = np.asarray(served.decode_spatial_normalized(z_got, modality="S2RGB"))
    back_ref = np.asarray(model.decode_spatial_normalized(z_ref, wvs))
    np.testing.assert_allclose(back, back_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_symbolic_batch(artifact):
    from eovax.serving import ServedModel

    _, out, _ = artifact
    served = ServedModel.load(out)
    g = np.random.default_rng(1)
    for b in (1, 3):
        x = g.standard_normal((b, 3, 32, 32)).astype(np.float32)
        assert served.reconstruct(x, modality="S2RGB").shape == (b, 3, 32, 32)


@pytest.mark.slow
def test_unknown_function_raises(artifact):
    from eovax.serving import ServedModel

    _, out, _ = artifact
    served = ServedModel.load(out)
    with pytest.raises(KeyError):
        served._fn("reconstruct", "S1RTC")


@pytest.mark.slow
def test_export_cli(tmp_path):
    import yaml

    from eovax.cli.export import main as export_main
    from eovax.serving import ServedModel

    cfg = {
        "model": {
            "encoder": {
                "z_channels": 8, "resolution": 32, "in_channels": 3, "ch": 32,
                "ch_mult": [1, 2], "num_res_blocks": 1, "use_dynamic_ops": True,
                "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64},
            },
            "decoder": {
                "z_channels": 8, "resolution": 32, "out_ch": 3, "ch": 32,
                "ch_mult": [1, 2], "num_res_blocks": 1, "use_dynamic_ops": True,
                "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64},
            },
        }
    }
    cfg_path = tmp_path / "model_config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "artifact"
    export_main([
        "--config", str(cfg_path), "--output", str(out),
        "--modalities", "S2RGB", "--resolution", "32", "--precision", "32-true",
    ])
    served = ServedModel.load(str(out))
    x = np.zeros((1, 3, 32, 32), np.float32)
    assert served.reconstruct(x, modality="S2RGB").shape == (1, 3, 32, 32)


@pytest.mark.slow
def test_export_int8_artifact(tmp_path):
    """`--precision int8` exports a quantized-graph artifact (int8 convs
    serialize through StableHLO) that loads and serves."""
    import yaml

    from eovax.cli.export import main as export_main
    from eovax.serving import ServedModel

    enc = {"z_channels": 8, "resolution": 32, "in_channels": 3, "ch": 128,
           "ch_mult": [1, 2], "num_res_blocks": 1, "use_dynamic_ops": True,
           "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64}}
    dec = dict(enc); dec.pop("in_channels"); dec["out_ch"] = 3
    cfg_path = tmp_path / "model_config.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": {"encoder": enc, "decoder": dec}}))
    out = tmp_path / "artifact"
    export_main([
        "--config", str(cfg_path), "--output", str(out),
        "--modalities", "S2RGB", "--resolution", "32", "--precision", "int8",
    ])
    served = ServedModel.load(str(out))
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    y = np.asarray(served.reconstruct(x, modality="S2RGB"))
    assert y.shape == (2, 3, 32, 32) and np.isfinite(y).all()
    # Weights were quantized ONCE at export: the artifact stores int8
    # kernels + per-channel scales (no per-call re-quantization), and the
    # manifest records it.
    import jax.numpy as jnp

    q = served._manifest["quantization"]
    assert q["weights"] == "int8-symmetric-per-out-channel"
    assert q["activations"] == "dynamic-per-tensor-absmax"
    assert q["quantized_convs"] > 0
    # Only the policy_conv3x3-dispatched convs (conv1/conv2) carry int8;
    # down/upsample convs keep fp32 (plain nn.Conv would misread int8).
    body_convs = [
        v for p, v in _iter_leaves(served._variables["params"])
        if p[-1] == "kernel" and p[-2] in ("conv1", "conv2")
        and getattr(v, "ndim", 0) == 4
        and v.shape[:2] == (3, 3) and min(v.shape[2], v.shape[3]) >= 128
    ]
    assert body_convs and all(v.dtype == jnp.int8 for v in body_convs)
    other_convs = [
        v for p, v in _iter_leaves(served._variables["params"])
        if p[-1] == "kernel" and p[-2] not in ("conv1", "conv2")
    ]
    assert all(v.dtype != jnp.int8 for v in other_convs)
    scales = [
        v for p, v in _iter_leaves(served._variables["params"])
        if p[-1] == "kernel_scale"
    ]
    assert len(scales) == q["quantized_convs"]
    assert all(v.dtype == jnp.float32 for v in scales)


def _iter_leaves(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_leaves(v, path + (k,))
    else:
        yield path, tree


@pytest.mark.slow
def test_export_int8_calibrated_artifact(tmp_path):
    """Percentile-calibrated int8 export: act_scale leaves land in the
    artifact, the manifest says so, and serving output stays close to the
    dynamically-scaled artifact on in-distribution data."""
    import yaml

    from eovax.cli.export import main as export_main
    from eovax.serving import ServedModel

    enc = {"z_channels": 8, "resolution": 32, "in_channels": 3, "ch": 128,
           "ch_mult": [1, 2], "num_res_blocks": 1, "use_dynamic_ops": True,
           "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64}}
    dec = dict(enc); dec.pop("in_channels"); dec["out_ch"] = 3
    cfg_path = tmp_path / "model_config.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": {"encoder": enc, "decoder": dec}}))
    g = np.random.default_rng(1)
    calib = g.standard_normal((8, 3, 32, 32)).astype(np.float32)
    np.savez(tmp_path / "calib.npz", images=calib)

    out_dyn = tmp_path / "dyn"
    out_cal = tmp_path / "cal"
    base = ["--config", str(cfg_path), "--modalities", "S2RGB",
            "--resolution", "32", "--precision", "int8"]
    export_main(base + ["--output", str(out_dyn)])
    export_main(base + ["--output", str(out_cal),
                        "--calibrate-npz", str(tmp_path / "calib.npz")])

    served = ServedModel.load(str(out_cal))
    assert served._manifest["quantization"]["activations"] == (
        "static-percentile-calibrated"
    )
    n_act = sum(
        1 for p, _ in _iter_leaves(served._variables["params"])
        if p[-1] == "act_scale"
    )
    assert n_act == served._manifest["quantization"]["quantized_convs"]

    x = g.standard_normal((2, 3, 32, 32)).astype(np.float32)
    y_cal = np.asarray(served.reconstruct(x, modality="S2RGB"), np.float32)
    y_dyn = np.asarray(
        ServedModel.load(str(out_dyn)).reconstruct(x, modality="S2RGB"),
        np.float32,
    )
    assert np.isfinite(y_cal).all()
    # Random-weights decoder amplifies the (percentile vs abs-max) scale
    # difference; on trained checkpoints the per-modality gate is
    # `cli/benchmark --int8-quality`. Here: same ballpark, not divergent.
    rms = float(np.sqrt(np.mean((y_cal - y_dyn) ** 2)) / (np.std(y_dyn) + 1e-8))
    assert rms < 0.35, rms


@pytest.mark.slow
def test_compact_weights_export(tmp_path):
    """--compact-weights stores bf16 params (half-size weights file) with
    fp32 BN stats; the artifact still serves within bf16 tolerance."""
    import os

    import jax.numpy as jnp

    from eovax.serving import ServedModel, export_model

    model = EOFluxVAE(CFG, seed=0)
    full = tmp_path / "full"
    compact = tmp_path / "compact"
    export_model(model, str(full), modalities=("S2RGB",), resolution=32)
    export_model(model, str(compact), modalities=("S2RGB",), resolution=32,
                 params_dtype=jnp.bfloat16)
    assert (
        os.path.getsize(compact / "params.msgpack")
        < 0.6 * os.path.getsize(full / "params.msgpack")
    )
    served = ServedModel.load(str(compact))
    # BN stats stayed fp32
    assert served._variables["batch_stats"]["bn"]["mean"].dtype == jnp.float32
    g = np.random.default_rng(0)
    x = g.standard_normal((1, 3, 32, 32)).astype(np.float32)
    y = np.asarray(served.reconstruct(x, modality="S2RGB"), np.float32)
    ref = np.asarray(ServedModel.load(str(full)).reconstruct(x, modality="S2RGB"),
                     np.float32)
    rms = float(np.sqrt(np.mean((y - ref) ** 2)) / (np.std(ref) + 1e-8))
    assert np.isfinite(y).all() and rms < 0.05, rms


@pytest.mark.slow
def test_with_mesh_data_parallel_serving(artifact):
    """Exported StableHLO functions run data-parallel over the 8-device
    mesh (params replicated, batch sharded) with identical results."""
    import jax
    from jax.sharding import PartitionSpec as P

    from eovax.parallel.mesh import DATA_AXIS, make_mesh
    from eovax.serving import ServedModel

    _, out, _ = artifact
    served = ServedModel.load(out)
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    sharded = served.with_mesh(mesh)

    g = np.random.default_rng(3)
    x = g.standard_normal((8, 3, 32, 32)).astype(np.float32)
    y = sharded.reconstruct(x, modality="S2RGB")
    assert y.sharding.spec == P(DATA_AXIS)
    ref = np.asarray(served.reconstruct(x, modality="S2RGB"))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5, rtol=2e-5)

    # non-divisible batch falls back to an unsharded input (still correct)
    x3 = g.standard_normal((3, 3, 32, 32)).astype(np.float32)
    y3 = np.asarray(sharded.reconstruct(x3, modality="S2RGB"))
    ref3 = np.asarray(served.reconstruct(x3, modality="S2RGB"))
    np.testing.assert_allclose(y3, ref3, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_with_mesh_custom_axis_name(artifact):
    """with_mesh works for any 1-D mesh axis name and rejects 2-D meshes."""
    import jax
    import numpy as np_
    from jax.sharding import Mesh

    from eovax.serving import ServedModel

    _, out, _ = artifact
    served = ServedModel.load(out)
    mesh = Mesh(np_.asarray(jax.devices()), ("batch",))
    sharded = served.with_mesh(mesh)
    x = np.zeros((8, 3, 32, 32), np.float32)
    assert sharded.reconstruct(x, modality="S2RGB").shape == (8, 3, 32, 32)

    devs = np_.asarray(jax.devices()).reshape(4, 2)
    with pytest.raises(ValueError, match="1-D mesh"):
        served.with_mesh(Mesh(devs, ("a", "b")))


@pytest.mark.slow
def test_export_sr_pipeline_matches_in_repo_sampler(tmp_path):
    """The exported encode→DDIM→decode StableHLO pipeline reproduces the
    in-repo composition on a fixed seed (VERDICT r3 item #7)."""
    import jax
    import jax.numpy as jnp

    from eovax.core.precision import FULL_PRECISION
    from eovax.models.sr_diffusion import (
        DDIMSampler,
        RectifiedSchedule,
        SimpleDenoiser,
    )
    from eovax.models.unet import UNet
    from eovax.serving import ServedModel, export_sr_pipeline

    model = EOFluxVAE(CFG, seed=0)  # fp32 policy, 3-ch, z=8
    z = model.config.encoder.z_channels
    unet = UNet(in_channels=z, out_channels=z, cond_channels=z,
                hid_channels=(32, 16), hid_blocks=(1, 1),
                policy=FULL_PRECISION)
    x0 = jnp.zeros((1, 4, 4, z))
    sr_params = unet.init(jax.random.PRNGKey(1), x0, jnp.zeros((1,)), x0)["params"]

    def apply_fn(params, x_t, t, cond=None):
        return unet.apply({"params": params}, x_t, t, cond)

    # Perturb away from the zero-init output convs so the denoiser (and
    # hence the pipeline) actually depends on the x1 seed draw.
    leaves, treedef = jax.tree_util.tree_flatten(sr_params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    sr_params = treedef.unflatten([
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])

    den = SimpleDenoiser(apply_fn=apply_fn, schedule=RectifiedSchedule())
    wvs = [0.665, 0.56, 0.49]
    out = tmp_path / "sr-artifact"
    manifest = export_sr_pipeline(
        model, den, sr_params, str(out), resolution=32, steps=4, wvs=wvs,
    )
    assert manifest["pipeline"] == "sr" and manifest["ddim_steps"] == 4
    # Round-4 export: per-sample seed vector (what makes SR batchable).
    assert manifest["functions"]["super_resolve"]["extra_args"] == [
        "seed:int32[b]"]

    g = np.random.default_rng(0)
    x_lr = g.standard_normal((2, 3, 32, 32)).astype(np.float32)
    served = ServedModel.load(str(out))
    assert served.per_sample_seed() and served.batchable("super_resolve")
    y = np.asarray(served.super_resolve(x_lr, seed=7), np.float32)
    assert y.shape == (2, 3, 32, 32) and np.isfinite(y).all()

    # In-repo composition, same seeds: a scalar seed expands to
    # per_sample_seeds(7, B) = [7, 8], each row's x1 drawn from its own
    # key (export.py sr_fn's vmapped init).
    from eovax.serving.export import per_sample_seeds

    wvs_arr = jnp.asarray(wvs, jnp.float32)
    z_lr = model.encode_spatial_normalized(x_lr, wvs_arr)
    cond = jnp.transpose(jnp.asarray(z_lr), (0, 2, 3, 1))
    sampler = DDIMSampler(den, steps=4)
    x1 = jnp.stack([
        sampler.init(jax.random.PRNGKey(int(s)), cond.shape[1:])
        for s in per_sample_seeds(7, cond.shape[0])
    ])
    z_hr = sampler(sr_params, x1, cond=cond)
    ref = np.asarray(model.decode_spatial_normalized(
        jnp.transpose(z_hr, (0, 3, 1, 2)), wvs_arr), np.float32)
    np.testing.assert_allclose(y, ref, atol=2e-4, rtol=2e-4)

    # Seed changes the draw; determinism per seed.
    y7 = np.asarray(served.super_resolve(x_lr, seed=7), np.float32)
    y8 = np.asarray(served.super_resolve(x_lr, seed=8), np.float32)
    np.testing.assert_array_equal(y, y7)
    assert not np.allclose(y7, y8)

    # Data-parallel serving: the exported pipeline (including the DDIM
    # scan) partitions over a 1-D mesh; the per-sample seed vector
    # shards along the batch axis with the payload.
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("batch",))
    xb = np.tile(x_lr, (4, 1, 1, 1))  # 8 = one per device
    ref_b = np.asarray(served.super_resolve(xb, seed=7), np.float32)
    got_b = np.asarray(
        served.with_mesh(mesh).super_resolve(xb, seed=7), np.float32
    )
    np.testing.assert_allclose(got_b, ref_b, atol=2e-5, rtol=2e-5)


def test_export_sr_pipeline_int8_requires_denoiser_policy(tmp_path):
    """Quantizing sr_params for a denoiser built under a non-int8 policy
    would bake raw int8 values into plain-conv math; the exporter demands
    an explicit denoiser_policy confirmation before touching either tree."""
    from eovax.core.precision import INT8_POLICY
    from eovax.serving import export_sr_pipeline

    model = EOFluxVAE(CFG, policy=INT8_POLICY, seed=0)
    with pytest.raises(ValueError, match="denoiser_policy"):
        export_sr_pipeline(model, None, {}, str(tmp_path / "a"))
    with pytest.raises(ValueError, match="denoiser_policy"):
        export_sr_pipeline(
            model, None, {}, str(tmp_path / "b"),
            denoiser_policy=model.policy.__class__(),  # non-int8 policy
        )


@pytest.mark.slow
def test_export_sr_pipeline_int8_cli(tmp_path):
    """`--sr-config --precision int8` quantizes BOTH trees at export: the
    VAE body convs and the UNet _TimeResBlock convs carry int8 kernels in
    the artifact, and the pipeline still serves finite output."""
    import jax.numpy as jnp
    import yaml

    from eovax.cli.export import main as export_main
    from eovax.serving import ServedModel

    enc = {"z_channels": 8, "resolution": 32, "in_channels": 4, "ch": 128,
           "ch_mult": [1, 2], "num_res_blocks": 1, "use_dynamic_ops": True,
           "dynamic_conv_kwargs": {"num_layers": 1, "wv_planes": 64}}
    dec = dict(enc); dec.pop("in_channels"); dec["out_ch"] = 4
    cfg_path = tmp_path / "model_config.yaml"
    cfg_path.write_text(yaml.safe_dump({"model": {"encoder": enc, "decoder": dec}}))
    sr_cfg = {
        "lightning_module": {
            "denoiser": {
                "backbone": {
                    "in_channels": 8, "out_channels": 8, "cond_channels": 8,
                    "hid_channels": [128], "hid_blocks": [1],
                },
                "schedule": {"_target_": "azula.noise.RectifiedSchedule"},
            },
        },
    }
    sr_path = tmp_path / "sr_config.yaml"
    sr_path.write_text(yaml.safe_dump(sr_cfg))
    out = tmp_path / "artifact"
    export_main([
        "--config", str(cfg_path), "--output", str(out),
        "--resolution", "32", "--precision", "int8",
        "--sr-config", str(sr_path), "--sr-steps", "2",
    ])
    served = ServedModel.load(str(out))
    q = served._manifest["quantization"]
    assert q["weights"] == "int8-symmetric-per-out-channel"
    assert q["quantized_convs"] > 0

    def _int8_kernels(tree):
        return [
            p for p, v in _iter_leaves(tree)
            if p[-1] == "kernel" and getattr(v, "dtype", None) == jnp.int8
        ]

    vae_q = _int8_kernels(served._variables["vae"]["params"])
    sr_q = _int8_kernels(served._variables["sr"])
    assert vae_q, "VAE body convs should be pre-quantized"
    assert sr_q, "UNet _TimeResBlock convs should be pre-quantized"
    assert all(p[-2] in ("conv1", "conv2") for p in vae_q + sr_q)
    n_scales = sum(
        1 for p, _ in _iter_leaves(served._variables)
        if p[-1] == "kernel_scale"
    )
    assert n_scales == q["quantized_convs"] == len(vae_q) + len(sr_q)

    x = np.random.default_rng(0).standard_normal((1, 4, 32, 32)).astype(np.float32)
    y = np.asarray(served.super_resolve(x, seed=3), np.float32)
    assert y.shape == (1, 4, 32, 32) and np.isfinite(y).all()


@pytest.mark.slow
def test_http_server_round_trip(artifact):
    """HTTP daemon: healthz/manifest, .npy round-trip matching the direct
    call, 404 on unknown function, 400 on a malformed payload."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    from eovax.serving import ServedModel
    from eovax.serving.server import make_server, warmup

    _, out, _ = artifact
    served = ServedModel.load(out)
    warmed = warmup(served, batch_sizes=(2,))
    assert "reconstruct.S2RGB@2" in warmed

    httpd = make_server(served, port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"{base}/v1/manifest", timeout=30) as r:
            assert json.load(r)["format"] == "eovax-serving-v1"

        x = np.random.default_rng(2).standard_normal((2, 3, 32, 32)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"{base}/v1/reconstruct?modality=S2RGB", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "application/x-npy"
            y = np.load(io.BytesIO(r.read()), allow_pickle=False)
        ref = np.asarray(served.reconstruct(x, modality="S2RGB"))
        np.testing.assert_allclose(y, ref, atol=1e-6)

        for url, code in [
            (f"{base}/v1/nope", 404),                        # unknown function
            (f"{base}/v1/reconstruct?modality=S1RTC", 404),  # not in artifact
        ]:
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(
                    urllib.request.Request(url, data=buf.getvalue()), timeout=30)
            assert ei.value.code == code

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/v1/reconstruct?modality=S2RGB", data=b"not npy"),
                timeout=30)
        assert ei.value.code == 400

        # /metrics: 1 ok call + 1 modality-miss error recorded under
        # "reconstruct" (the unknown-function and malformed-payload
        # requests never reach dispatch and are not per-function counted).
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            m = json.load(r)["reconstruct"]
        assert m["count"] == 2 and m["errors"] == 1 and m["p50_ms"] > 0

        # wrong per-sample shape → 400 naming the expected shape (caught
        # by pre-dispatch validation against the manifest, not by the
        # device call)
        badbuf = io.BytesIO()
        np.save(badbuf, x[:, :, :16, :16])
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/v1/reconstruct?modality=S2RGB",
                    data=badbuf.getvalue()), timeout=30)
        assert ei.value.code == 400
        assert b"per-sample shape" in ei.value.read()

        # HTTP/1.1 keep-alive: an error reply must DRAIN the request body,
        # or its bytes desync the next request on the same connection.
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        try:
            conn.request("POST", "/v1/nope", body=buf.getvalue())
            r1 = conn.getresponse()
            assert r1.status == 404 and r1.read()
            # bad query param → 400 (client error, not 500), same conn
            conn.request("POST", "/v1/reconstruct?modality=S2RGB&seed=abc",
                         body=buf.getvalue())
            r2 = conn.getresponse()
            assert r2.status == 400 and b"seed" in r2.read()
            # the connection is still in sync: a good request succeeds
            conn.request("POST", "/v1/reconstruct?modality=S2RGB",
                         body=buf.getvalue())
            r3 = conn.getresponse()
            assert r3.status == 200
            y2 = np.load(io.BytesIO(r3.read()), allow_pickle=False)
            np.testing.assert_allclose(y2, ref, atol=1e-6)
        finally:
            conn.close()
    finally:
        httpd.shutdown()
        t.join(timeout=10)


@pytest.mark.slow
def test_serve_cli_starts_serves_and_cleans_up(artifact, capsys, monkeypatch):
    """cli/serve wires load → warmup → make_server → serve_forever and, on
    exit, closes the listening socket and restores the SIGTERM handler.
    serve_forever is intercepted to answer one healthz request and then
    return (as a real SIGTERM-triggered shutdown() would)."""
    import json
    import signal
    import urllib.request

    from eovax.cli.serve import main as serve_main
    from eovax.serving import server as server_mod

    _, out, _ = artifact
    started = {}
    real_make_server = server_mod.make_server

    def capture_make_server(served, **kw):
        started["httpd"] = real_make_server(served, **kw)
        return started["httpd"]

    def serve_one_then_return(self):
        port = self.server_address[1]
        import threading

        def probe():
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                started["health"] = json.load(r)["status"]

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        self.handle_request()  # serve exactly the probe, then "shut down"
        t.join(timeout=10)

    prev_term = signal.getsignal(signal.SIGTERM)
    monkeypatch.setattr(server_mod, "make_server", capture_make_server)
    monkeypatch.setattr(
        "http.server.HTTPServer.serve_forever", serve_one_then_return)
    serve_main([out, "--port", "0", "--warmup", "1"])
    monkeypatch.undo()

    out_text = capsys.readouterr().out
    assert "warmed" in out_text and "shut down" in out_text
    assert started["health"] == "ok"
    # listening socket closed and the SIGTERM handler restored
    assert started["httpd"].socket.fileno() == -1
    assert signal.getsignal(signal.SIGTERM) is prev_term


@pytest.mark.slow
def test_http_server_concurrent_requests(artifact):
    """The daemon serializes device work under its lock but must serve
    overlapping requests correctly: N threads x M posts all succeed and
    /metrics counts exactly N*M."""
    import io
    import json
    import threading
    import urllib.request

    from eovax.serving import ServedModel
    from eovax.serving.server import make_server, warmup

    _, out, _ = artifact
    served = ServedModel.load(out)
    warmup(served, batch_sizes=(1,))
    httpd = make_server(served, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        x = np.random.default_rng(5).standard_normal((1, 3, 32, 32)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        body = buf.getvalue()
        ref = np.asarray(served.reconstruct(x, modality="S2RGB"))
        errors = []

        def client(n):
            try:
                for _ in range(n):
                    req = urllib.request.Request(
                        f"http://127.0.0.1:{port}/v1/reconstruct?modality=S2RGB",
                        data=body)
                    with urllib.request.urlopen(req, timeout=120) as r:
                        y = np.load(io.BytesIO(r.read()), allow_pickle=False)
                    np.testing.assert_allclose(y, ref, atol=1e-6)
            except Exception as e:  # propagate to the main thread
                errors.append(e)

        threads = [threading.Thread(target=client, args=(3,)) for _ in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errors, errors
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            m = json.load(r)["reconstruct"]
        assert m["count"] == 12 and m["errors"] == 0
    finally:
        httpd.shutdown()
        t.join(timeout=10)


@pytest.mark.slow
def test_export_sr_pipeline_dpmpp2m(tmp_path):
    """sampler="dpm++2m" exports a second-order pipeline whose output
    matches the in-repo DPM++(2M) composition on a fixed seed, and the
    manifest records the sampler."""
    import jax
    import jax.numpy as jnp

    from eovax.core.precision import FULL_PRECISION
    from eovax.models.sr_diffusion import (
        DPMSolverPlusPlus2M,
        RectifiedSchedule,
        SimpleDenoiser,
    )
    from eovax.models.unet import UNet
    from eovax.serving import ServedModel, export_sr_pipeline

    model = EOFluxVAE(CFG, seed=0)
    z = model.config.encoder.z_channels
    unet = UNet(in_channels=z, out_channels=z, cond_channels=z,
                hid_channels=(32, 16), hid_blocks=(1, 1),
                policy=FULL_PRECISION)
    x0 = jnp.zeros((1, 4, 4, z))
    sr_params = unet.init(jax.random.PRNGKey(1), x0, jnp.zeros((1,)), x0)["params"]

    def apply_fn(params, x_t, t, cond=None):
        return unet.apply({"params": params}, x_t, t, cond)

    den = SimpleDenoiser(apply_fn=apply_fn, schedule=RectifiedSchedule())
    wvs = [0.665, 0.56, 0.49]
    out = tmp_path / "sr-artifact"
    manifest = export_sr_pipeline(
        model, den, sr_params, str(out), resolution=32, steps=4, wvs=wvs,
        sampler="dpm++2m",
    )
    assert manifest["sampler"] == "dpm++2m"

    g = np.random.default_rng(1)
    x_lr = g.standard_normal((1, 3, 32, 32)).astype(np.float32)
    served = ServedModel.load(str(out))
    y = np.asarray(served.super_resolve(x_lr, seed=3), np.float32)

    wvs_arr = jnp.asarray(wvs, jnp.float32)
    z_lr = model.encode_spatial_normalized(x_lr, wvs_arr)
    cond = jnp.transpose(jnp.asarray(z_lr), (0, 2, 3, 1))
    sampler = DPMSolverPlusPlus2M(den, steps=4)
    x1 = sampler.init(jax.random.PRNGKey(3), cond.shape)
    z_hr = sampler(sr_params, x1, cond=cond)
    ref = np.asarray(model.decode_spatial_normalized(
        jnp.transpose(z_hr, (0, 3, 1, 2)), wvs_arr), np.float32)
    np.testing.assert_allclose(y, ref, atol=2e-4, rtol=2e-4)


def test_warmup_function_filter():
    """warmup(functions=...) restricts pre-compiles to those functions —
    the serve CLI uses this to bucket-warm only BATCHABLE functions
    (super_resolve never dispatches at bucket sizes, and its full-DDIM
    compile is the most expensive one in the artifact)."""
    from eovax.serving.server import warmup

    class _Fake:
        _manifest = {"functions": {
            "reconstruct.S2L2A": {"input_shape": [1, 3, 8, 8],
                                  "modality": "S2L2A"},
            "super_resolve.S2RGB": {"input_shape": [1, 4, 16, 16],
                                    "modality": "S2RGB"},
        }}

        def __init__(self):
            self.calls = []

        def reconstruct(self, x, modality=None):
            self.calls.append(("reconstruct", int(x.shape[0])))

        def super_resolve(self, x, seed=0):
            self.calls.append(("super_resolve", int(x.shape[0])))

    f = _Fake()
    warmed = warmup(f, batch_sizes=(1, 2), functions={"reconstruct"})
    assert warmed == ["reconstruct.S2L2A@1", "reconstruct.S2L2A@2"]
    assert f.calls == [("reconstruct", 1), ("reconstruct", 2)]

    f2 = _Fake()
    warmed = warmup(f2, batch_sizes=(1,))  # no filter: every function
    assert sorted(warmed) == ["reconstruct.S2L2A@1", "super_resolve.S2RGB@1"]


@pytest.fixture(scope="module")
def sr_artifact(tmp_path_factory):
    """Tiny SR-pipeline artifact (2-step DDIM, seed-sensitive denoiser)
    for the per-sample-seed contract tests."""
    import jax
    import jax.numpy as jnp

    from eovax.core.precision import FULL_PRECISION
    from eovax.models.sr_diffusion import RectifiedSchedule, SimpleDenoiser
    from eovax.models.unet import UNet
    from eovax.serving import export_sr_pipeline

    model = EOFluxVAE(CFG, seed=0)
    z = model.config.encoder.z_channels
    unet = UNet(in_channels=z, out_channels=z, cond_channels=z,
                hid_channels=(16,), hid_blocks=(1,), policy=FULL_PRECISION)
    x0 = jnp.zeros((1, 4, 4, z))
    sr_params = unet.init(jax.random.PRNGKey(1), x0, jnp.zeros((1,)),
                          x0)["params"]

    def apply_fn(params, x_t, t, cond=None):
        return unet.apply({"params": params}, x_t, t, cond)

    # Perturb away from the zero-init output convs so the pipeline
    # actually depends on the per-sample x1 draw.
    leaves, treedef = jax.tree_util.tree_flatten(sr_params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    sr_params = treedef.unflatten([
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])
    den = SimpleDenoiser(apply_fn=apply_fn, schedule=RectifiedSchedule())
    out = tmp_path_factory.mktemp("sr-psseed")
    export_sr_pipeline(model, den, sr_params, str(out), resolution=32,
                       steps=2, wvs=[0.665, 0.56, 0.49])
    return str(out)


@pytest.mark.slow
def test_sr_per_sample_seed_contract(sr_artifact):
    """Row i of a batched super_resolve draws the exact noise of the B=1
    call with seed[i]; an int seed expands to per_sample_seeds; seed
    count must match the batch (export.py sr_fn's vmapped init)."""
    from eovax.serving import ServedModel
    from eovax.serving.export import per_sample_seeds

    served = ServedModel.load(sr_artifact)
    g = np.random.default_rng(2)
    x = g.standard_normal((2, 3, 32, 32)).astype(np.float32)

    y = np.asarray(served.super_resolve(x, seed=[3, 5]), np.float32)
    y0 = np.asarray(served.super_resolve(x[:1], seed=[3]), np.float32)
    y1 = np.asarray(served.super_resolve(x[1:], seed=[5]), np.float32)
    # cross batch-composition: identical draws, fp-tolerance results
    np.testing.assert_allclose(y[0], y0[0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(y[1], y1[0], atol=1e-5, rtol=1e-5)
    # same composition, scalar vs its expansion: bitwise
    ys = np.asarray(served.super_resolve(x, seed=7), np.float32)
    yv = np.asarray(
        served.super_resolve(x, seed=per_sample_seeds(7, 2)), np.float32)
    np.testing.assert_array_equal(ys, yv)
    # a different seed changes the draw
    y0b = np.asarray(served.super_resolve(x[:1], seed=[5]), np.float32)
    assert not np.allclose(y0[0], y0b[0])

    with pytest.raises(ValueError, match="one seed per sample"):
        served.super_resolve(x, seed=[1, 2, 3])


@pytest.mark.slow
def test_sr_scalar_seed_artifact_back_compat(sr_artifact, tmp_path):
    """Pre-round-4 manifests (extra_args ["seed:int32"]) still load,
    report non-batchable, and reject seed vectors with a re-export hint."""
    import json
    import shutil

    from eovax.serving import ServedModel

    legacy = tmp_path / "legacy"
    shutil.copytree(sr_artifact, legacy)
    mpath = legacy / "manifest.json"
    m = json.loads(mpath.read_text())
    m["functions"]["super_resolve"]["extra_args"] = ["seed:int32"]
    mpath.write_text(json.dumps(m))

    served = ServedModel.load(str(legacy))
    assert not served.per_sample_seed()
    assert not served.batchable("super_resolve")
    assert served.batchable("reconstruct")  # static rule untouched
    with pytest.raises(ValueError, match="predates per-sample seeds"):
        served.super_resolve(np.zeros((2, 3, 32, 32), np.float32),
                             seed=[1, 2])


@pytest.mark.slow
def test_http_sr_batched_requests_keep_their_seeds(sr_artifact):
    """The daemon coalesces concurrent super_resolve requests on a
    per-sample-seed artifact, and each request's reply matches the direct
    unbatched call with its own seed (server and ServedModel share the
    per_sample_seeds derivation)."""
    import io
    import json
    import threading
    import urllib.request

    from eovax.serving import ServedModel
    from eovax.serving.server import make_server

    served = ServedModel.load(sr_artifact)
    httpd = make_server(served, port=0, max_batch=4, batch_wait_ms=300.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        g = np.random.default_rng(3)
        x = g.standard_normal((1, 3, 32, 32)).astype(np.float32)
        # pre-compile the coalesced size so neither request times out on
        # a first-call XLA compile inside the window
        served.super_resolve(np.tile(x, (2, 1, 1, 1)), seed=0)
        results, errors = {}, []

        def post(seed):
            try:
                buf = io.BytesIO()
                np.save(buf, x)
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/v1/super_resolve?seed={seed}",
                    data=buf.getvalue())
                with urllib.request.urlopen(req, timeout=300) as r:
                    results[seed] = np.load(io.BytesIO(r.read()),
                                            allow_pickle=False)
            except Exception as e:
                errors.append(e)

        ts = [threading.Thread(target=post, args=(s,)) for s in (3, 9)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=600)
        assert not errors, errors
        for s in (3, 9):
            ref = np.asarray(served.super_resolve(x, seed=s), np.float32)
            np.testing.assert_allclose(results[s], ref,
                                       atol=1e-5, rtol=1e-5)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
            snap = json.load(r)
        b = snap["_batching"]["super_resolve"]
        assert b["requests"] == 2 and b["samples"] == 2
    finally:
        httpd.shutdown()
        t.join(timeout=10)
        httpd.server_close()


def test_npy_frame_bit_identical_to_np_save():
    """The zero-copy response framing (server._npy_frame: header + the
    array's own buffer, VERDICT r4 next-item 7) must be byte-identical on
    the wire to a full np.save — including the f32 wire cast for bf16
    outputs and non-contiguous inputs."""
    import io

    import jax.numpy as jnp

    from eovax.serving.server import _npy_frame

    g = np.random.default_rng(0)
    cases = [
        g.standard_normal((2, 3, 8, 8)).astype(np.float32),
        g.standard_normal((4, 5)).astype(np.float64),
        jnp.asarray(g.standard_normal((2, 4, 4, 3)), jnp.bfloat16),  # wire cast
        np.transpose(g.standard_normal((2, 3, 4)).astype(np.float32),
                     (2, 0, 1)),  # non-contiguous view
    ]
    for arr in cases:
        header, out = _npy_frame(arr)
        wire = header + bytes(out.data)
        ref_arr = np.asarray(arr)
        if ref_arr.dtype not in (np.float32, np.float64):
            ref_arr = ref_arr.astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, ref_arr)
        assert wire == buf.getvalue()
        back = np.load(io.BytesIO(wire), allow_pickle=False)
        np.testing.assert_array_equal(back, ref_arr)


def test_npy_parse_zero_copy_and_rejections():
    """Request-side mirror (server._npy_parse): same array np.load would
    produce, but as a view over the request bytes; pickle payloads and
    malformed bodies raise (-> 400 in the handler)."""
    import io

    from eovax.serving.server import _npy_parse

    g = np.random.default_rng(1)
    a = g.standard_normal((3, 2, 5)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, a)
    raw = buf.getvalue()
    x = _npy_parse(raw)
    np.testing.assert_array_equal(x, a)
    assert not x.flags.writeable  # view over the request bytes
    assert x.base is not None

    # Fortran-order bodies fall back to np.load (still correct).
    buf = io.BytesIO()
    np.save(buf, np.asfortranarray(a))
    np.testing.assert_array_equal(_npy_parse(buf.getvalue()), a)

    # Object/pickle payloads rejected like allow_pickle=False.
    buf = io.BytesIO()
    np.save(buf, np.array([{"x": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(ValueError):
        _npy_parse(buf.getvalue())

    # Truncated body raises instead of returning garbage.
    with pytest.raises(ValueError):
        _npy_parse(raw[: len(raw) - 8])

    # Garbage raises.
    with pytest.raises(Exception):
        _npy_parse(b"not an npy at all")
