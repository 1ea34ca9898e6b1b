"""TerraMesh pipeline tests: native blosc decode, zarr-zip reader, tar
streaming, shard splitting, harmonization, collate integration."""

import os

import numpy as np
import pytest

from tests._zarr_helpers import (
    blosc_frame,
    lz4_literal_encode,
    write_terramesh_shard,
    write_zarr_zip,
)


def test_native_lz4_roundtrip():
    from eovax import native

    g = np.random.default_rng(0)
    data = g.integers(0, 255, 1000, dtype=np.uint8).tobytes()
    comp = lz4_literal_encode(data)
    assert native.lz4_decompress(comp, len(data)) == data


@pytest.mark.parametrize("codec", ["lz4", "blosclz", "memcpy"])
@pytest.mark.parametrize("typesize", [1, 4])
def test_native_blosc_roundtrip(codec, typesize):
    from eovax import native

    g = np.random.default_rng(1)
    data = g.integers(0, 255, 4096, dtype=np.uint8).tobytes()
    frame = blosc_frame(
        data, typesize=typesize, codec=codec, shuffle=codec != "memcpy"
    )
    assert native.blosc_decompress(frame) == data


def test_native_blosc_multiblock():
    from eovax import native

    g = np.random.default_rng(2)
    data = g.integers(0, 255, 10_000, dtype=np.uint8).tobytes()
    frame = blosc_frame(data, typesize=4, codec="lz4", blocksize=4096)
    assert native.blosc_decompress(frame) == data


def test_unshuffle_identity():
    from eovax import native
    from tests._zarr_helpers import shuffle_bytes

    g = np.random.default_rng(3)
    data = g.integers(0, 255, 403, dtype=np.uint8).tobytes()  # non-divisible tail
    assert native.unshuffle(4, shuffle_bytes(data, 4)) == data


@pytest.mark.parametrize("compressor", ["lz4", "blosclz", "memcpy", "zlib", "blosc-zlib", None])
def test_zarrzip_reader(compressor):
    from eovax.data.zarrzip import ZarrZipGroup

    g = np.random.default_rng(4)
    bands = g.normal(size=(1, 3, 8, 8)).astype("<f4")
    t = np.asarray([1_700_000_000_000_000_000], "<i8")
    blob = write_zarr_zip({"bands": bands, "time": t}, compressor)
    group = ZarrZipGroup(blob)
    np.testing.assert_array_equal(group["bands"], bands)
    np.testing.assert_array_equal(group["time"], t)


def test_harmonization_offset():
    from eovax.data.terramesh import S2L2A_BASELINE_CUTOFF_NS
    from eovax.data.zarrzip import decode_zarr_zip_bands

    bands = np.ones((1, 12, 4, 4), "<f4") * 100.0
    pre = write_zarr_zip(
        {"bands": bands, "time": np.asarray([S2L2A_BASELINE_CUTOFF_NS - 1], "<i8")}
    )
    post = write_zarr_zip(
        {"bands": bands, "time": np.asarray([S2L2A_BASELINE_CUTOFF_NS], "<i8")}
    )
    np.testing.assert_allclose(
        decode_zarr_zip_bands(pre, harmonize_s2l2a=True).max(), 100.0
    )
    np.testing.assert_allclose(
        decode_zarr_zip_bands(post, harmonize_s2l2a=True).min(), 1100.0
    )


def test_expand_braces_and_split():
    from eovax.data.terramesh import expand_braces, split_shards

    urls = expand_braces("shard_{000001..000012}.tar")
    assert len(urls) == 12 and urls[0] == "shard_000001.tar"

    shards = [f"s{i}" for i in range(16)]
    a = split_shards(shards, process_index=0, process_count=2, worker_id=0, num_workers=2)
    b = split_shards(shards, process_index=0, process_count=2, worker_id=1, num_workers=2)
    c = split_shards(shards, process_index=1, process_count=2, worker_id=0, num_workers=2)
    d = split_shards(shards, process_index=1, process_count=2, worker_id=1, num_workers=2)
    assert sorted(a + b + c + d) == sorted(shards)
    # pairwise disjoint (not just a-vs-rest): overlaps between two
    # worker/process splits are exactly the double-read bug this guards.
    import itertools

    for u, v in itertools.combinations((a, b, c, d), 2):
        assert not set(u) & set(v)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    """Synthetic TerraMesh layout: {root}/val/{MODALITY}/shard.tar."""
    root = tmp_path_factory.mktemp("terramesh")
    g = np.random.default_rng(5)
    for modality, c in (("S2RGB", 3), ("S1RTC", 2)):
        d = root / "val" / modality
        d.mkdir(parents=True)
        samples = [
            {"bands": g.normal(100, 30, (1, c, 16, 16)).astype("<f4"), "time": 0}
            for _ in range(6)
        ]
        write_terramesh_shard(str(d / "shard_000001.tar"), samples, compressor="lz4")
    return str(root)


def test_single_modality_stream(shard_dir):
    from eovax.data.terramesh import build_terramesh_dataset

    batches = list(
        build_terramesh_dataset(
            shard_dir, "S2RGB", "val", batch_size=4, partial=True,
            urls=[os.path.join(shard_dir, "val", "S2RGB", "shard_000001.tar")],
        )
    )
    assert len(batches) == 2  # 6 samples → 4 + 2
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[0]["image"].dtype == np.float32


def test_multimodal_merge_stream(shard_dir):
    from eovax.data.terramesh import iter_multi_tar_samples

    shards = [
        os.path.join(shard_dir, "val", m, "shard_000001.tar")
        for m in ("S2RGB", "S1RTC")
    ]
    samples = list(iter_multi_tar_samples(shards))
    assert len(samples) == 6
    assert "S2RGB.zarr.zip" in samples[0] and "S1RTC.zarr.zip" in samples[0]


def test_pipeline_with_collate(shard_dir):
    from eovax.data.terramesh import build_terramesh_dataset
    from eovax.data.collate import deterministic_modality_collate

    collate = deterministic_modality_collate(
        "S2RGB", normalize=True, target_size=(32, 32), mode="eval"
    )
    raw = build_terramesh_dataset(
        shard_dir, "S2RGB", "val", batch_size=2,
        urls=[os.path.join(shard_dir, "val", "S2RGB", "shard_000001.tar")],
    )
    batch = collate(next(iter(raw)))
    assert batch["image"].shape == (2, 32, 32, 3)
    np.testing.assert_allclose(batch["wvs"], [0.665, 0.56, 0.49], rtol=1e-6)
    # z-scored around 0 given synthetic stats near the legacy mean scale
    assert abs(float(batch["image"].mean())) < 3.0


def test_multimodal_resync_on_missing_sample(tmp_path):
    """A modality shard missing one sample key skips that sample and
    continues (reference drops the whole shard via warn_and_continue)."""
    import warnings as _warnings

    from eovax.data.terramesh import iter_multi_tar_samples

    g = np.random.default_rng(0)
    roots = {}
    keys_a = ["sample_0000", "sample_0001", "sample_0002", "sample_0003"]
    keys_b = ["sample_0000", "sample_0002", "sample_0003"]  # 0001 missing
    for mod, keys in (("S2RGB", keys_a), ("S1RTC", keys_b)):
        d = tmp_path / "val" / mod
        d.mkdir(parents=True)
        c = 3 if mod == "S2RGB" else 2
        samples = [
            {"bands": g.normal(0, 1, (1, c, 8, 8)).astype("<f4"), "time": 0}
            for _ in keys
        ]
        write_terramesh_shard(str(d / "shard_000001.tar"), samples, keys=keys)
        roots[mod] = str(d / "shard_000001.tar")

    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        merged = list(iter_multi_tar_samples([roots["S2RGB"], roots["S1RTC"]]))
    assert [s["__key__"] for s in merged] == ["sample_0000", "sample_0002", "sample_0003"]
    assert any("resyncing" in str(x.message) for x in w)


@pytest.fixture(scope="module")
def mixed_root(tmp_path_factory):
    """Both TerraMesh subsets present: majortom bands ≈ +100, ssl4eos12
    bands ≈ −100 so batch provenance is readable from the sign."""
    root = tmp_path_factory.mktemp("terramesh_mix")
    d = root / "val" / "S2RGB"
    d.mkdir(parents=True)
    g = np.random.default_rng(7)

    def shard(path, value):
        samples = [
            {"bands": (value + g.normal(0, 1, (1, 3, 8, 8))).astype("<f4"), "time": 0}
            for _ in range(4)
        ]
        write_terramesh_shard(str(path), samples)

    for i in range(1, 9):  # SPLIT_FILES majortom val: {000001..000008}
        shard(d / f"majortom_shard_{i:06d}.tar", +100.0)
    shard(d / "ssl4eos12_shard_000009.tar", -100.0)  # ssl4eos12 val
    return str(root)


def test_subset_batch_mix_ratio(mixed_root):
    """Batches interleave majortom/ssl4eos12 at ~0.8/0.2 and stay
    subset-pure (wds.RandomMix parity, terramesh.py:553-557)."""
    from eovax.data.terramesh import build_terramesh_dataset

    it = build_terramesh_dataset(
        mixed_root, "S2RGB", "val", batch_size=2, repeat=True, seed=3,
    )
    n = 200
    majortom = 0
    for _ in range(n):
        batch = next(it)
        means = batch["image"].mean(axis=(1, 2, 3))
        # Subset-pure batch: all samples share the provenance sign.
        assert (means > 0).all() or (means < 0).all()
        majortom += int(means[0] > 0)
    frac = majortom / n
    assert 0.7 < frac < 0.9, frac


def test_subset_mix_exhausts_both_sources(mixed_root):
    """Without repeat, the mixed val stream yields every batch from both
    subsets (RandomMix longest=True semantics for eval)."""
    from eovax.data.terramesh import build_terramesh_dataset

    batches = list(
        build_terramesh_dataset(
            mixed_root, "S2RGB", "val", batch_size=2, seed=0, partial=True,
        )
    )
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 8 * 4 + 4  # 8 majortom shards ×4 samples + 1 ssl shard ×4
    signs = {float(np.sign(b["image"].mean())) for b in batches}
    assert signs == {1.0, -1.0}


def test_empty_shard_assignment_terminates(tmp_path):
    """A process assigned zero shards (subset smaller than process_count)
    must yield an empty stream, not busy-spin the repeat loop forever."""
    import warnings as _warnings

    from eovax.data.terramesh import build_terramesh_dataset

    from tests._zarr_helpers import write_terramesh_shard

    shard = tmp_path / "shard_000001.tar"
    samples = [
        {"bands": np.random.default_rng(0).normal(100, 30, (1, 12, 8, 8)).astype("<f4"),
         "time": 0}
        for _ in range(2)
    ]
    write_terramesh_shard(str(shard), samples, compressor="lz4")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        it = build_terramesh_dataset(
            str(tmp_path), "S2L2A", urls=[str(shard)], batch_size=2,
            repeat=True, process_index=5, process_count=8,
        )
        assert list(it) == []
    assert any("No shards assigned" in str(w.message) for w in caught)


def test_prefetch_close_stops_producer_thread(tmp_path):
    """Closing an abandoned reader (early-stopped fit: preemption,
    max_steps) must terminate the prefetch producer thread — it used to
    stay blocked on the full queue forever, pinning decoded batches."""
    import threading
    import time as _time

    from tests._zarr_helpers import write_terramesh_shard

    from eovax.data.terramesh import build_terramesh_dataset

    g = np.random.default_rng(2)
    shard = tmp_path / "majortom_shard_000001.tar"
    samples = [
        {"bands": g.integers(0, 100, (1, 3, 8, 8)).astype("<i2"), "time": 0}
        for _ in range(16)
    ]
    write_terramesh_shard(str(shard), samples, compressor="lz4")

    before = set(threading.enumerate())
    it = build_terramesh_dataset(
        str(tmp_path), "S2RGB", urls=[str(shard)], batch_size=2,
        repeat=True, prefetch_depth=2,
    )
    next(it)  # reader live: producer spun up and the queue fills
    spawned = [t for t in threading.enumerate() if t not in before]
    assert spawned, "prefetch produced no background thread?"
    it.close()
    deadline = _time.time() + 5.0
    while any(t.is_alive() for t in spawned) and _time.time() < deadline:
        _time.sleep(0.05)
    assert not any(t.is_alive() for t in spawned), (
        "producer thread still alive after close()"
    )


def test_prefetch_propagates_producer_exception():
    """A producer-side failure (shard open error, decode bug, OOM in the
    stack) must re-raise in the CONSUMER — the old behavior enqueued the
    clean end-of-stream sentinel, so a long fit would quietly "finish" at
    whatever step the data pipeline died (r4 review)."""
    from eovax.data.terramesh import _prefetch

    def exploding():
        yield 1
        yield 2
        raise RuntimeError("shard 37 unreadable")

    it = _prefetch(exploding, depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="shard 37 unreadable"):
        next(it)

    # A factory that fails before yielding anything must also raise, not
    # present as an empty stream.
    def broken_factory():
        raise OSError("no shards match pattern")

    it2 = _prefetch(broken_factory, depth=2)
    with pytest.raises(OSError, match="no shards"):
        next(it2)
