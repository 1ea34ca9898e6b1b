"""Throughput of the exported serving artifact (flagship shapes).

Answers "what does the StableHLO artifact path cost vs the live model?"
with bench.py's methodology: the exported `reconstruct` is called inside
an on-device `lax.fori_loop` dependency chain (exported functions are
traceable), one dispatch + one 4-byte fetch. Two chain lengths; the
difference cancels dispatch/tunnel overhead (slope method). Also reports
the per-dispatch mode (one `ServedModel.reconstruct` call per iteration,
output fed back as input) — the shape a request-at-a-time server sees;
async dispatch pipelines the tunnel round-trip away in the steady state.

Usage: python scripts/bench_serving.py [--int8] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

# PYTHONPATH breaks the axon tunnel plugin on this host — put the repo
# root on sys.path here instead (same as the ablate_* scripts).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--int8", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, nargs=2, default=(10, 50),
                   help="short and long chain lengths for the slope")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eovax_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig, VAEConfig
    from eovax.core.precision import DEFAULT_POLICY, INT8_POLICY
    from eovax.models.backbone import EOVAECore

    policy = INT8_POLICY if args.int8 else DEFAULT_POLICY
    stem = StemConfig(num_layers=4, wv_planes=256)
    enc = EncoderConfig(in_channels=12, stem=stem)
    dec = DecoderConfig(out_ch=12, stem=stem)
    core = EOVAECore(encoder_cfg=enc, decoder_cfg=dec, policy=policy)

    # Host-side variable materialization (bench.py rationale: device-side
    # PRNG init of 95M params costs minutes over the tunnel).
    import bench as _bench

    wvs = jnp.asarray([0.49 + 0.05 * i for i in range(12)], jnp.float32)
    x1 = jnp.zeros((1, 256, 256, 12), jnp.float32)
    variables = _bench._host_init_variables(core, x1, wvs)

    class _Shim:
        """Duck-typed stand-in for EOFluxVAE in export_model."""

        def __init__(self):
            self.core = core
            self.variables = variables
            self.config = VAEConfig(encoder=enc, decoder=dec)
            self.policy = policy

    import atexit
    import shutil
    import tempfile

    from eovax.serving import ServedModel, export_model

    out = tempfile.mkdtemp(prefix="eovax_bench_artifact_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)  # ~0.5 GB/run
    t0 = time.perf_counter()
    export_model(_Shim(), out, modalities=("S2L2A",), resolution=256)
    print(f"# export: {time.perf_counter() - t0:.1f}s -> {out}")

    served = ServedModel.load(out)
    exp = served._fn("reconstruct", "S2L2A")
    B = args.batch
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, 12, 256, 256), dtype=np.float32)
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(variables, x, iters):
        def body(_, y):
            return jnp.tanh(exp.call(variables, y)).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, x)

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        y = chain(served._variables, x, iters)
        float(jnp.sum(y[0, 0, 0]))
        return time.perf_counter() - t0

    lo, hi = args.iters
    if hi <= lo:
        raise SystemExit(f"--iters must be increasing, got {lo} {hi}")
    run(lo), run(hi)  # compile both lengths
    run(lo), run(hi)  # warm both (deferred autotuning / first-pass cost)
    # min-of-2 per length: a single tunnel hiccup in one sample would
    # skew the slope (same protocol as scripts/ablate_decode.py).
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    per_iter = (t_hi - t_lo) / (hi - lo)
    tag = "int8" if args.int8 else "bf16"
    print(f"artifact_chained_{tag}: {B / per_iter:.1f} imgs/s "
          f"({per_iter * 1000:.1f} ms/iter @B={B}, slope {lo}->{hi})")

    # Per-dispatch mode: one exported-call dispatch per iteration, chained
    # through the output so the runtime can't dedupe; single final fetch.
    def run_dispatch(iters: int) -> float:
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = jnp.tanh(served.reconstruct(y)).astype(jnp.float32)
        float(jnp.sum(jnp.asarray(y)[0, 0, 0]))
        return time.perf_counter() - t0

    run_dispatch(3)  # compile (served.reconstruct jit has its own cache)
    run_dispatch(lo)  # warm
    t_lo = min(run_dispatch(lo), run_dispatch(lo))
    t_hi = min(run_dispatch(hi), run_dispatch(hi))
    per_iter = (t_hi - t_lo) / (hi - lo)
    print(f"artifact_per_dispatch_{tag}: {B / per_iter:.1f} imgs/s "
          f"({per_iter * 1000:.1f} ms/dispatch @B={B})")


if __name__ == "__main__":
    main()
