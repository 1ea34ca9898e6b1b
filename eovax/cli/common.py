"""Shared CLI plumbing: experiment dirs, config snapshots, logging setup."""

from __future__ import annotations

import os
import shutil
import time


def create_experiment_dir(base_dir: str, experiment_name: str) -> str:
    """Timestamped experiment directory (train.py:19-30 parity)."""
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(base_dir, f"{experiment_name}_{stamp}")
    os.makedirs(path, exist_ok=True)
    return path


def snapshot_config(config_path: str, exp_dir: str) -> None:
    """Copy the run config into the experiment dir (train.py:169-172)."""
    shutil.copy(config_path, os.path.join(exp_dir, "config.yaml"))


def enable_compile_cache(path: str = "/tmp/eovax_jax_cache") -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
