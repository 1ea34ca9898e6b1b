"""Profiling / tracing utilities (SURVEY.md §5 aux subsystems).

The reference has no profiler beyond a CUDA-event stopwatch
(benchmark_compute.py); the TPU-native equivalents here are:
- `trace(...)`: context manager around `jax.profiler` writing a
  TensorBoard-loadable trace (op-level timeline, HBM usage).
- `device_barrier(x)`: a tunnel-safe synchronization point (scalar fetch —
  see bench.py for why `block_until_ready` alone can be insufficient).
- `enable_nan_checks()`: turns on jax debug_nans — the framework's
  numerical-sanitizer switch (the reference's closest analogues are the
  FFL NaN guards and logvar clamping).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/eovax_trace", *, host_tracer_level: int = 2):
    """Capture a TensorBoard-loadable profiler trace around the block.

    ``host_tracer_level``: 0 disables host (python) tracing, 1 traces
    only significant host events, 2 (default) is verbose — forwarded to
    ``jax.profiler.ProfileOptions`` when this jax version supports it.
    """
    import jax

    kwargs = {}
    if hasattr(jax.profiler, "ProfileOptions"):  # jax ≥ 0.4.33
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = host_tracer_level
        kwargs["profiler_options"] = opts
    jax.profiler.start_trace(log_dir, **kwargs)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_barrier(x) -> float:
    """Force execution of everything `x` depends on; returns a scalar."""
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(jnp.asarray(x))[:1]))


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def stopwatch(label: str = ""):
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        box["seconds"] = time.perf_counter() - t0
        if label:
            print(f"[{label}] {box['seconds'] * 1000:.1f} ms")


def memory_stats() -> dict:
    """Device memory counters (peak/current HBM) where the backend exposes
    them — the analogue of torch.cuda.max_memory_allocated
    (benchmark_compute.py:223,233)."""
    import jax

    try:
        return dict(jax.local_devices()[0].memory_stats() or {})
    except Exception:
        return {}
