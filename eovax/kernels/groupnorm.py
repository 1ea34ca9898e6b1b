"""Fused GroupNorm statistics — Pallas TPU kernel. **Experimental; not
wired into the model (measured negative result).**

Motivation was SURVEY.md §7 step 9 (GN+swish+conv fusion): a decode-step
profile *attributed* 35 of 59 ms to the GN `convert_reduce_fusion` ops.
Round-2 measurements on v5e showed that attribution is an artifact of the
sequencer timeline: ablating the stats pass entirely (constant mean/var)
changed the B=16 decode by only 2.2 ms (63.2 → 61.0), i.e. XLA already
overlaps the reduces with MXU convolutions; and dispatching stats through
this kernel made the decode 1.56× slower (98 ms) because the pallas_call
boundary forces layout copies of the tile-laid-out bf16 activations.

The kernel itself is correct (see tests/test_groupnorm_kernel.py) and is
kept for future use — a profitable version must fuse the *apply* and
ideally the neighboring conv into the same kernel so the activation is
read once in its native layout.

Gradients: `group_norm` carries a custom VJP with the closed-form GN
backward (reductions expressed in jnp — unchanged from the XLA baseline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, sum_ref, sq_ref):
    """One (batch, row-tile) block: accumulate per-channel fp32 partials.

    The outputs are whole [B, C] arrays (TPU block-alignment rules forbid
    single-row blocks); each grid step accumulates into its batch row."""
    i = pl.program_id(0)
    tile = x_ref[...].astype(jnp.float32)  # [1, th, W, C]
    s = jnp.sum(tile, axis=(0, 1, 2))
    s2 = jnp.sum(tile * tile, axis=(0, 1, 2))

    @pl.when(pl.program_id(1) == 0)
    def _init():
        sum_ref[pl.ds(i, 1), :] = jnp.zeros_like(s)[None]
        sq_ref[pl.ds(i, 1), :] = jnp.zeros_like(s2)[None]

    sum_ref[pl.ds(i, 1), :] += s[None]
    sq_ref[pl.ds(i, 1), :] += s2[None]


def _row_tile(h: int, w: int, c: int, budget_bytes: int = 4 << 20) -> int:
    """Largest power-of-two row count whose bf16 tile fits the budget."""
    th = max(1, budget_bytes // max(w * c * 2, 1))
    th = 1 << (th.bit_length() - 1)
    while h % th:
        th //= 2
    return max(th, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gn_channel_sums(x: jax.Array, *, interpret: bool = False):
    """Per-(batch, channel) (sum, sum_of_squares) in fp32 for an NHWC
    activation — one streaming pass over HBM."""
    b, h, w, c = x.shape
    th = _row_tile(h, w, c)
    grid = (b, h // th)
    out_shape = (
        jax.ShapeDtypeStruct((b, c), jnp.float32),
        jax.ShapeDtypeStruct((b, c), jnp.float32),
    )
    return pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=(
            pl.BlockSpec((b, c), lambda i, j: (0, 0)),
            pl.BlockSpec((b, c), lambda i, j: (0, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(x)


def _stats(x: jax.Array, groups: int, *, use_pallas: bool, interpret: bool = False):
    """(mean, var) per (batch, group), fp32."""
    b, h, w, c = x.shape
    n = h * w * (c // groups)
    if use_pallas:
        s, s2 = gn_channel_sums(x, interpret=interpret)
        sg = s.reshape(b, groups, c // groups).sum(-1)
        s2g = s2.reshape(b, groups, c // groups).sum(-1)
        mean = sg / n
        var = s2g / n - mean * mean
    else:
        xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
        mean = jnp.mean(xf, axis=(1, 2, 4))
        var = jnp.var(xf, axis=(1, 2, 4))
    return mean, var


def _apply(x, mean, var, scale, bias, groups, eps):
    b, h, w, c = x.shape
    rstd = jax.lax.rsqrt(var + eps)  # [B,G]
    mean_c = jnp.repeat(mean, c // groups, axis=-1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, c // groups, axis=-1).reshape(b, 1, 1, c)
    y = (x.astype(jnp.float32) - mean_c) * rstd_c
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm(x, scale, bias, groups: int = 32, eps: float = 1e-6,
               use_pallas: bool = True):
    """GroupNorm over NHWC with Pallas-accelerated statistics (TPU) and a
    plain-XLA fallback; output fp32 (cast at the call site)."""
    mean, var = _stats(x, groups, use_pallas=use_pallas)
    return _apply(x, mean, var, scale, bias, groups, eps)


def _gn_fwd(x, scale, bias, groups, eps, use_pallas):
    mean, var = _stats(x, groups, use_pallas=use_pallas)
    y = _apply(x, mean, var, scale, bias, groups, eps)
    return y, (x, mean, var, scale)


def _gn_bwd(groups, eps, use_pallas, res, dy):
    x, mean, var, scale = res
    b, h, w, c = x.shape
    cg = c // groups
    n = h * w * cg
    dy = dy.astype(jnp.float32)
    rstd = jax.lax.rsqrt(var + eps)  # [B,G]
    mean_c = jnp.repeat(mean, cg, axis=-1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=-1).reshape(b, 1, 1, c)
    xhat = (x.astype(jnp.float32) - mean_c) * rstd_c

    dbias = jnp.sum(dy, axis=(0, 1, 2))
    dscale = jnp.sum(dy * xhat, axis=(0, 1, 2))

    g = dy * scale.astype(jnp.float32)  # [B,H,W,C]
    gg = g.reshape(b, h, w, groups, cg)
    xg = xhat.reshape(b, h, w, groups, cg)
    g_mean = jnp.mean(gg, axis=(1, 2, 4))  # [B,G]
    gx_mean = jnp.mean(gg * xg, axis=(1, 2, 4))
    g_mean_c = jnp.repeat(g_mean, cg, axis=-1).reshape(b, 1, 1, c)
    gx_mean_c = jnp.repeat(gx_mean, cg, axis=-1).reshape(b, 1, 1, c)
    dx = rstd_c * (g - g_mean_c - xhat * gx_mean_c)
    del n
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


group_norm.defvjp(_gn_fwd, _gn_bwd)
