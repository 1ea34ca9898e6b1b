"""Multi-host batch assembly (VERDICT round-1 missing #2): the
jax.make_array_from_process_local_data path, exercised on the virtual
8-device CPU mesh (single-process: local slice == global batch; real
multi-process splits are structurally identical per the JAX contract)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from eovax.parallel.mesh import (
    DATA_AXIS,
    ShardingFallbackWarning,
    global_batch_from_local,
    make_mesh,
    place_batch,
    shard_batch,
)


def _batch():
    g = np.random.default_rng(0)
    return {
        "image": g.standard_normal((16, 8, 8, 3), dtype=np.float32),
        "wvs": np.asarray([0.665, 0.56, 0.49], np.float32),
    }


def test_global_batch_from_local_shards_images_replicates_wvs():
    mesh = make_mesh()
    batch = _batch()
    out = global_batch_from_local(batch, mesh)
    assert out["image"].shape == batch["image"].shape
    assert out["image"].sharding.spec == P(DATA_AXIS)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    assert out["wvs"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out["wvs"]), batch["wvs"])
    # Each device holds B/8 rows of the image.
    shard0 = out["image"].addressable_shards[0]
    assert shard0.data.shape[0] == 16 // mesh.shape[DATA_AXIS]


def test_place_batch_matches_shard_batch_single_process():
    mesh = make_mesh()
    batch = _batch()
    a = place_batch(batch, mesh)
    b = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    assert a["image"].sharding == b["image"].sharding


def test_shard_batch_warns_on_nondivisible_per_sample_leaf():
    """VERDICT r3 #4: a per-sample (ndim ≥ 2) leaf whose leading dim
    doesn't divide the mesh must warn (it trains at 1/N efficiency);
    per-batch constants like `wvs` stay silently replicated."""
    mesh = make_mesh()
    g = np.random.default_rng(0)
    bad = {
        "image": g.standard_normal((6, 8, 8, 3), dtype=np.float32),  # 6 % 8 != 0
        "wvs": np.asarray([0.665, 0.56, 0.49], np.float32),
    }
    with pytest.warns(ShardingFallbackWarning, match="not divisible"):
        out = shard_batch(bad, mesh)
    assert out["image"].sharding.is_fully_replicated  # still correct, just slow
    import warnings as _w

    # Escalation must fire even though the same mismatch already warned
    # above: a must-fail-loudly guard (dryrun_multichip) relies on
    # simplefilter("error") beating any warn-once dedup (r4 review).
    with _w.catch_warnings():
        _w.simplefilter("error", ShardingFallbackWarning)
        with pytest.raises(ShardingFallbackWarning):
            shard_batch(bad, mesh)
        # wvs (1-D constant) never warns, even escalated.
        shard_batch({"wvs": bad["wvs"]}, mesh)
    # Under default filters, a repeat of the SAME mismatch stays quiet
    # (stdlib registry dedup) — no warning spam once per train step.
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("default")
        shard_batch(bad, mesh)
        shard_batch(bad, mesh)
    assert sum(issubclass(w.category, ShardingFallbackWarning) for w in rec) == 1


def test_place_batch_multiprocess_route(monkeypatch):
    """With process_count > 1 the trainer feed path must go through
    make_array_from_process_local_data (per-host local batches), not
    device_put of a would-be-global array."""
    calls = []
    import eovax.parallel.mesh as mesh_mod

    real = jax.make_array_from_process_local_data

    def spy(sharding, x, *a, **kw):
        calls.append(np.asarray(x).shape)
        return real(sharding, x, *a, **kw)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", spy)
    mesh = make_mesh()
    out = mesh_mod.place_batch(_batch(), mesh)
    assert (16, 8, 8, 3) in calls and (3,) in calls
    assert out["image"].sharding.spec == P(DATA_AXIS)


@pytest.mark.slow
def test_trainer_step_runs_through_multiprocess_path(monkeypatch):
    """One stage-2 train step with the multi-host feed path forced on
    (single process, so local == global) — the full step must compile and
    execute with globally-assembled arrays."""
    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.data.synthetic import synthetic_terramesh_batches
    from eovax.losses import EOConsistencyLoss
    from eovax.models.eo_flux_vae import EOFluxVAE
    from eovax.train.stage2 import Stage2Trainer

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    stem = StemConfig(num_layers=1, wv_planes=32)
    cfg = VAEConfig(
        encoder=EncoderConfig(
            resolution=32, in_channels=3, ch=32, ch_mult=(1, 2),
            num_res_blocks=1, z_channels=4, use_dynamic_ops=True, stem=stem,
        ),
        decoder=DecoderConfig(
            resolution=32, out_ch=3, ch=32, ch_mult=(1, 2),
            num_res_blocks=1, z_channels=4, use_dynamic_ops=True, stem=stem,
        ),
        base_lr=1e-4,
    )
    model = EOFluxVAE(cfg, seed=0)
    trainer = Stage2Trainer(
        model=model, loss_obj=EOConsistencyLoss(pixel_weight=1.0, msssim_weight=0.0),
        cfg=cfg, max_steps=1, log_every=0, seed=0,
    )
    state = trainer.fit(
        synthetic_terramesh_batches(
            batch_size=8, target_size=(32, 32), modalities=("S2RGB",),
            seed=0, num_batches=1,
        )
    )
    assert int(state.step) == 1


@pytest.mark.slow
def test_real_two_process_training():
    """GENUINE multi-process data parallelism: two OS processes, 4 virtual
    CPU devices each (global mesh = 8), Gloo collectives across the
    process boundary. Each process feeds different local data; after two
    Stage-2 steps both processes' replicated params must be bit-identical
    (the gradient all-reduce crossed processes) and differ from init."""
    import socket
    import subprocess
    import sys
    import tempfile
    import os

    # Ephemeral coordinator port: a hardcoded one collides with concurrent
    # runs/stale processes and the failure mode is a slow opaque timeout.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"proc{i}.txt") for i in range(2)]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "tests._mp_train_worker",
                 str(i), f"localhost:{port}", outs[i]],
                env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(2)
        ]
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-3000:]
        vals = [open(o).read().split() for o in outs]
        ck0, init0 = float(vals[0][0]), float(vals[0][1])
        ck1, _ = float(vals[1][0]), float(vals[1][1])
        assert ck0 == ck1, (ck0, ck1)  # replicas in lockstep across hosts
        assert abs(ck0 - init0) > 1e-6  # training actually moved params


def test_global_batch_rejects_ambiguous_1d_leaf():
    """A 1-D per-sample leaf (labels/weights) must not be silently
    assembled as 'replicated' — hosts could hold different values while
    XLA assumes identical contents (divergent gradients, no error)."""
    mesh = make_mesh()
    batch = {**_batch(), "labels": np.arange(16, dtype=np.float32)}
    with pytest.raises(ValueError, match="labels"):
        global_batch_from_local(batch, mesh)
    # scalars and the known replicated key still pass
    ok = global_batch_from_local(
        {**_batch(), "tau": np.float32(0.5)}, mesh
    )
    assert ok["tau"].sharding.is_fully_replicated


def test_init_distributed_noop_without_env_raises_with(monkeypatch):
    """Without a coordinator env this is a no-op; WITH one, a real
    initialize() failure must PROPAGATE — the round-3 review found the
    old blanket except left pods silently running N single-host jobs."""
    from eovax.parallel.mesh import init_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "CLOUD_TPU_TASK_ID", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    init_distributed()  # no env, backend already up → silently no-op
    assert jax.process_count() == 1
    # single-host TPU VMs set TPU_WORKER_HOSTNAMES with ONE entry (the
    # tunnel host here sets "localhost") — still a no-op; only a
    # multi-entry list marks a pod.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    init_distributed()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    with pytest.raises(RuntimeError):
        init_distributed()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    # The test process's backend is already initialized, so initialize()
    # must raise — swallowing this is exactly the audited failure mode.
    with pytest.raises(RuntimeError):
        init_distributed()


@pytest.mark.slow
def test_real_two_process_training_device_prep():
    """The device_prep collate contract across a REAL process boundary:
    two OS processes with different per-host D4 draws and per-sample
    descriptors, assembled via make_array_from_process_local_data. Each
    worker asserts its OWN shard of the jitted device_prepare equals the
    host numpy prep with its own draw (per-sample leaves carried each
    host's values), then trains 2 steps — replicas must stay bit-identical
    and move from init."""
    import socket
    import subprocess
    import sys
    import tempfile
    import os

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, f"proc{i}.txt") for i in range(2)]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "tests._mp_train_worker",
                 str(i), f"localhost:{port}", outs[i], "device_prep"],
                env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(2)
        ]
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-3000:]
        assert "device_prep shard parity OK" in logs[0]
        assert "device_prep shard parity OK" in logs[1]
        vals = [open(o).read().split() for o in outs]
        ck0, init0 = float(vals[0][0]), float(vals[0][1])
        ck1, _ = float(vals[1][0]), float(vals[1][1])
        assert ck0 == ck1, (ck0, ck1)
        assert abs(ck0 - init0) > 1e-6
