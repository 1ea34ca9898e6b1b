"""Native (C++) data-path kernels, built on first use and bound via ctypes.

`blosc_decompress(frame, ...)` decodes a blosc1 frame (LZ4 / blosclz /
memcpy codecs + byte-shuffle) — the chunk format of the TerraMesh zip-zarr
shards. zlib/zstd-coded blosc frames fall back to the Python layer
(eovax/data/zarrzip.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "blosc.cc")
_LOCK = threading.Lock()
_LIB = None


class NativeBuildError(RuntimeError):
    pass


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("EOVAX_NATIVE_CACHE", os.path.expanduser("~/.cache/eovax")),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libeovaxblosc-{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise NativeBuildError(f"native build failed: {e.stderr}") from e
    os.replace(tmp, lib_path)
    return lib_path


def _lib():
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                lib = ctypes.CDLL(_build())
                lib.eovax_blosc_decompress.restype = ctypes.c_long
                lib.eovax_blosc_decompress.argtypes = [
                    ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_void_p, ctypes.c_long,
                ]
                lib.eovax_lz4_decompress.restype = ctypes.c_int
                lib.eovax_lz4_decompress.argtypes = [
                    ctypes.c_char_p, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_int,
                ]
                lib.eovax_unshuffle.restype = None
                lib.eovax_unshuffle.argtypes = [
                    ctypes.c_int, ctypes.c_long,
                    ctypes.c_char_p, ctypes.c_void_p,
                ]
                _LIB = lib
    return _LIB


def blosc_header(frame: bytes) -> dict:
    """Parse the 16-byte blosc1 header."""
    import struct

    if len(frame) < 16:
        raise ValueError("truncated blosc frame")
    version, versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", frame, 4)
    return {
        "version": version,
        "versionlz": versionlz,
        "flags": flags,
        "typesize": typesize,
        "nbytes": nbytes,
        "blocksize": blocksize,
        "cbytes": cbytes,
        "codec": (flags >> 5) & 0x7,
        "byte_shuffle": bool(flags & 0x1),
        "memcpyed": bool(flags & 0x2),
        "bit_shuffle": bool(flags & 0x4),
    }


def blosc_decompress(frame: bytes) -> bytes:
    """Decode a blosc1 frame natively. Raises on unsupported codec —
    caller may then fall back to a Python path (zlib)."""
    hdr = blosc_header(frame)
    out = ctypes.create_string_buffer(hdr["nbytes"])
    r = _lib().eovax_blosc_decompress(frame, len(frame), out, hdr["nbytes"])
    if r == -2:
        raise NotImplementedError(
            f"blosc codec id {hdr['codec']} not handled natively"
        )
    if r != hdr["nbytes"]:
        raise ValueError(f"blosc decode failed (rc={r}, expected {hdr['nbytes']})")
    return out.raw


def lz4_decompress(block: bytes, out_size: int) -> bytes:
    out = ctypes.create_string_buffer(out_size)
    r = _lib().eovax_lz4_decompress(block, len(block), out, out_size)
    if r != out_size:
        raise ValueError(f"lz4 decode failed (rc={r}, expected {out_size})")
    return out.raw


def unshuffle(typesize: int, data: bytes) -> bytes:
    out = ctypes.create_string_buffer(len(data))
    _lib().eovax_unshuffle(typesize, len(data), data, out)
    return out.raw
