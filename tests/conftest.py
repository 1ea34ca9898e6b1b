"""Test environment: virtual 8-device CPU mesh.

Per the build plan (SURVEY.md §4), multi-device behavior is tested on a
CPU-simulated mesh; the real TPU chip is exercised by bench.py.

This host registers a TPU PJRT plugin from sitecustomize at interpreter
start (which also pins JAX_PLATFORMS), so plain env vars set here are too
late — but the backend itself is not yet initialized, and
``jax.config.update`` still wins.
"""

import os
import re

flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(r"--?xla_force_host_platform_device_count=(\d+)", flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
elif _m.group(1) != "8":
    # A pre-existing different count would silently give the session the
    # wrong mesh width and fail every sharding test confusingly — the
    # suite is written for 8, so enforce it.
    os.environ["XLA_FLAGS"] = flags.replace(
        _m.group(0), _m.group(0).split("=")[0] + "=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

