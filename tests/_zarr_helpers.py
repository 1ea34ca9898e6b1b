"""Test-side writers for blosc frames, zarr-v2 zip stores, and tar shards.

These generate the on-disk formats the eovax readers consume (the real
TerraMesh shards are not available in this environment), covering every
compressor path: blosc-lz4 (shuffled/split), blosc-memcpy, blosclz, zlib,
and raw.
"""

from __future__ import annotations

import io
import json
import struct
import tarfile
import zipfile
import zlib

import numpy as np


def lz4_literal_encode(data: bytes) -> bytes:
    """Valid LZ4 block holding one all-literal sequence."""
    out = bytearray()
    n = len(data)
    out.append(min(n, 15) << 4)
    if n >= 15:
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data
    return bytes(out)


def blosclz_literal_encode(data: bytes) -> bytes:
    """Valid blosclz stream of literal runs only."""
    out = bytearray([0x00])  # version/token byte
    i = 0
    while i < len(data):
        run = min(32, len(data) - i)
        out.append(run - 1)
        out += data[i : i + run]
        i += run
    return bytes(out)


def shuffle_bytes(data: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return data
    n = len(data)
    elems = n // typesize
    arr = np.frombuffer(data[: elems * typesize], np.uint8).reshape(elems, typesize)
    out = arr.T.tobytes() + data[elems * typesize :]
    return out


def blosc_frame(
    data: bytes,
    *,
    typesize: int = 4,
    codec: str = "lz4",  # 'lz4' | 'blosclz' | 'memcpy' | 'zlib'
    shuffle: bool = True,
    blocksize: int | None = None,
) -> bytes:
    """Assemble a blosc1 frame around the given raw bytes."""
    nbytes = len(data)
    blocksize = blocksize or nbytes
    codec_ids = {"blosclz": 0, "lz4": 1, "zlib": 3}

    if codec == "memcpy":
        flags = 0x2
        header = struct.pack(
            "<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, nbytes + 16
        )
        return header + data

    cid = codec_ids[codec]
    flags = (0x1 if shuffle else 0x0) | (cid << 5)
    nblocks = -(-nbytes // blocksize)
    split = (
        shuffle and typesize > 1 and codec in ("lz4", "blosclz")
        and (blocksize // typesize) >= 32
    )

    body = bytearray()
    bstarts = []
    # bstarts occupy 4*nblocks bytes right after the 16-byte header.
    base = 16 + 4 * nblocks
    for b in range(nblocks):
        block = data[b * blocksize : (b + 1) * blocksize]
        if shuffle:
            block = shuffle_bytes(block, typesize)
        bstarts.append(base + len(body))
        nstreams = typesize if split else 1
        stream_len = len(block) // nstreams
        off = 0
        for s in range(nstreams):
            want = len(block) - off if s == nstreams - 1 else stream_len
            raw = block[off : off + want]
            off += want
            if codec == "lz4":
                comp = lz4_literal_encode(raw)
            elif codec == "blosclz":
                comp = blosclz_literal_encode(raw)
            else:  # zlib
                comp = zlib.compress(raw)
            if len(comp) >= want:  # store verbatim (csize == want)
                body += struct.pack("<i", want) + raw
            else:
                body += struct.pack("<i", len(comp)) + comp
    cbytes = base + len(body)
    header = struct.pack(
        "<BBBBiii", 2, 1, flags, typesize, nbytes, blocksize, cbytes
    )
    return header + b"".join(struct.pack("<i", s) for s in bstarts) + bytes(body)


def write_zarr_zip(arrays: dict[str, np.ndarray], compressor: str = "lz4") -> bytes:
    """Write a consolidated zarr-v2 group into a zip archive (one chunk per
    array)."""
    comp_meta = {
        "lz4": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        "blosclz": {"id": "blosc", "cname": "blosclz", "clevel": 5, "shuffle": 1},
        "memcpy": {"id": "blosc", "cname": "lz4", "clevel": 0, "shuffle": 0},
        "zlib": {"id": "zlib", "level": 1},
        "blosc-zlib": {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 1},
        None: None,
    }[compressor]

    buf = io.BytesIO()
    metadata = {".zgroup": {"zarr_format": 2}}
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(".zgroup", json.dumps({"zarr_format": 2}))
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            zarray = {
                "zarr_format": 2,
                "shape": list(arr.shape),
                "chunks": list(arr.shape) if arr.shape else [],
                "dtype": arr.dtype.str,
                "compressor": comp_meta,
                "fill_value": 0,
                "order": "C",
                "filters": None,
            }
            metadata[f"{name}/.zarray"] = zarray
            zf.writestr(f"{name}/.zarray", json.dumps(zarray))
            raw = arr.tobytes()
            if compressor in ("lz4", "blosclz", "memcpy"):
                chunk = blosc_frame(
                    raw, typesize=arr.dtype.itemsize,
                    codec="memcpy" if compressor == "memcpy" else compressor,
                    shuffle=compressor != "memcpy",
                )
            elif compressor == "blosc-zlib":
                chunk = blosc_frame(
                    raw, typesize=arr.dtype.itemsize, codec="zlib", shuffle=True
                )
            elif compressor == "zlib":
                chunk = zlib.compress(raw, 1)
            else:
                chunk = raw
            key = "0" if not arr.shape else ".".join("0" for _ in arr.shape)
            zf.writestr(f"{name}/{key}", chunk)
        zf.writestr(".zmetadata", json.dumps({"metadata": metadata, "zarr_consolidated_format": 1}))
    return buf.getvalue()


def write_terramesh_shard(
    path: str,
    samples: list[dict[str, np.ndarray | int]],
    *,
    compressor: str = "lz4",
    key_prefix: str = "sample",
    keys: list[str] | None = None,
) -> None:
    """Write a TerraMesh-like tar shard: one '{key}.zarr.zip' member per
    sample with 'bands' [1,C,H,W] and 'time' arrays. Explicit ``keys``
    override the sequential naming (for key-misalignment tests)."""
    with tarfile.open(path, "w") as tf:
        for i, s in enumerate(samples):
            if keys is not None:
                key_name = keys[i]
            else:
                key_name = f"{key_prefix}_{i:04d}"
            arrays = {
                "bands": np.asarray(s["bands"]),
                "time": np.asarray([s.get("time", 0)], dtype="<i8"),
                "center_lon": np.asarray([0.0], "<f8"),
                "center_lat": np.asarray([0.0], "<f8"),
            }
            blob = write_zarr_zip(arrays, compressor)
            info = tarfile.TarInfo(name=f"{key_name}.zarr.zip")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
