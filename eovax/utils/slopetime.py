"""Slope-method TPU timing — the one shared implementation.

The build host reaches its TPU through a ~26-30 ms network tunnel, and
`block_until_ready` can return early for chains of independent dispatches
— so every committed perf number (bench.py, scripts/ablate_*.py,
`eovax.cli.benchmark --all`) times through THIS recipe:

  * the workload is chained through a data dependency inside one
    on-device ``lax.fori_loop``;
  * two chain lengths are run (``lo`` and ``hi``), each warmed twice
    (compile, then deferred autotune) and timed twice (min taken);
  * the only host sync is a single 4-byte scalar fetch;
  * ms/iter = (t_hi - t_lo) / (hi - lo) — the constant dispatch + fetch
    round-trip cancels in the difference.

The methodology is load-bearing for cross-round comparability: change it
here, nowhere else. One more host rule rides along: big operands (param
trees, images) must enter the loop as jit ARGUMENTS (via
``functools.partial``), never closures — closed-over arrays are
serialized into the remote-compile request body, and past ~400 MB the
compile service rejects it with HTTP 413.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["slope_ms", "chained_ms", "scalar_chained_ms", "random_variables"]


def slope_ms(loop: Callable, x0, lo: int = 8, hi: int = 24) -> float:
    """ms per iteration of ``loop(x0, n)`` by the two-length slope method.

    ``loop`` must run its workload n times chained on device and return a
    value whose first leaf depends on the whole chain.
    """

    def run(n):
        t0 = time.perf_counter()
        y = loop(x0, n)
        leaf = jax.tree_util.tree_leaves(y)[0]
        float(jnp.sum(jnp.ravel(leaf)[:1]))  # 4-byte fetch = the barrier
        return time.perf_counter() - t0

    for n in (lo, hi):
        run(n)  # compile
        run(n)  # warm (deferred autotune)
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    return (t_hi - t_lo) / (hi - lo) * 1e3


def chained_ms(fn: Callable, x0, consts=None, lo: int = 8, hi: int = 24) -> float:
    """Slope-time ``fn(consts, x) -> x`` (same-shaped carry, e.g. tanh'd).

    Big operands ride in ``consts`` — a jit argument, not fn's closure
    (HTTP-413 rule, module docstring).
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(c, x, n):
        return jax.lax.fori_loop(0, n, lambda _, y: fn(c, y), x)

    return slope_ms(functools.partial(loop, consts), x0, lo, hi)


def scalar_chained_ms(
    fn_scalar: Callable, consts=None, lo: int = 8, hi: int = 24
) -> float:
    """Slope-time ``fn_scalar(consts, s f32 scalar) -> f32 scalar``.

    The scalar must depend on the full computation — reduce everything
    into it, or XLA dead-code-eliminates the work being measured.
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(c, s, n):
        return jax.lax.fori_loop(0, n, lambda _, y: fn_scalar(c, y), s)

    return slope_ms(
        functools.partial(loop, consts), jnp.zeros((), jnp.float32), lo, hi
    )


def random_variables(init_fn: Callable[[], dict], rng=None) -> dict:
    """N(0, 0.02) variables for a flax init laid out by ``jax.eval_shape``
    (no on-device init program — the big trees never round-trip the
    tunnel). BN running stats, if present at the conventional
    ``batch_stats/bn`` path, are reset to identity (mean 0 / var 1) so
    timed eval paths see sane normalization."""
    rng = rng if rng is not None else np.random.default_rng(0)
    shapes = jax.eval_shape(init_fn)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            rng.normal(0, 0.02, size=s.shape).astype(np.dtype(s.dtype))
        ),
        shapes,
    )
    bn = variables.get("batch_stats", {}).get("bn") if isinstance(variables, dict) else None
    if bn is not None:
        bn["mean"] = jnp.zeros_like(bn["mean"])
        bn["var"] = jnp.ones_like(bn["var"])
    return variables
