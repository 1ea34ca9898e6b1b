"""Pallas TPU kernel: 3×3 stride-1 SAME convolution as 9 VMEM-resident
tap-matmuls.

Why: the ResnetBlock 3×3 convs carry ~85% of the VAE's FLOPs (reference
conv stacks: /root/reference/eo_vae/models/model.py:126-147,273-293). XLA's
direct conv emitter runs them at 32% MFU at 32² and 54-65% at the square-
channel shapes (measured on v5e, B=16 — see ARCHITECTURE.md round-2 notes);
every XLA-composed alternative (im2col, 9-shift dot, Winograd) is slower
because the rearranged operands round-trip through HBM.

This kernel keeps everything on-chip: per grid step it DMAs one padded
row-slab ``[tile_h+2, W+2, C]`` into VMEM (double-buffered across grid
steps, so the copy for step s+1 overlaps step s's matmuls), then computes

    acc[th·W, O] (fp32)  =  Σ_{dy,dx}  slab[dy:dy+th, dx:dx+W, :] @ w[dy,dx]

— nine MXU matmuls with a fp32 VMEM accumulator — and writes the bf16
result through a standard (auto-pipelined) output block. Input traffic is
1× + halo rows; there is no im2col materialization anywhere.

Gradients: ``conv3x3`` is wrapped in jax.custom_vjp — the data gradient is
this same kernel with the spatially-flipped, transposed kernel (a 3×3 SAME
conv again); the weight gradient goes through jax.linear_transpose of the
XLA conv (a contraction over B·H·W that XLA already handles well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(h: int, w: int, ci: int, co: int) -> int:
    """Largest H-tile whose buffers fit comfortably in VMEM (~12 MB budget:
    2 input slabs + weights + fp32 accumulator + 2 output blocks)."""
    wpad = -(-(w + 2) // 8) * 8
    for th in (64, 32, 16, 8):
        if h % th:
            continue
        slab = (th + 2) * wpad * ci * 2
        acc = th * w * co * 4
        out = th * w * co * 2
        weights = 9 * ci * co * 2
        if 2 * slab + acc + 2 * out + weights <= 12 * 1024 * 1024:
            return th
    return 0


def _kernel(xp_ref, w_ref, b_ref, out_ref, slab, acc, sems, *, th, wd, ci, co, has_bias):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_h = pl.num_programs(1)
    n_b = pl.num_programs(0)
    step = b * n_h + i

    def dma(slot, bb, ii):
        # Full padded-width rows: W is the sublane dim, so the slab's W
        # extent must be 8-aligned — xp is pre-padded to `wpad` columns.
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * th, th + 2)], slab.at[slot], sems.at[slot]
        )

    @pl.when(step == 0)
    def _():
        dma(0, b, i).start()

    @pl.when(step + 1 < n_b * n_h)
    def _():
        nxt = step + 1
        dma((step + 1) % 2, nxt // n_h, nxt % n_h).start()

    dma(step % 2, b, i).wait()
    s = slab.at[step % 2]

    for dy in range(3):
        for dx in range(3):
            xs = s[dy : dy + th, dx : dx + wd, :].reshape(th * wd, ci)
            d = jnp.dot(xs, w_ref[dy, dx], preferred_element_type=jnp.float32)
            if dy == 0 and dx == 0:
                acc[:] = d
            else:
                acc[:] += d

    y = acc[:]
    if has_bias:
        y = y + b_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype).reshape(th, wd, co)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def _conv3x3_pallas(x, w, bias, tile_h):
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    # Pad W up to an 8-aligned slab width (Mosaic sublane tiling); the
    # extra right columns are zeros that no tap ever reads.
    wpad = -(-(wd + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wpad - wd - 1), (0, 0)))
    th = tile_h
    n_h = h // th

    has_bias = bias is not None
    bias_arg = (bias if has_bias else jnp.zeros((co,), x.dtype)).reshape(1, co)

    kernel = functools.partial(
        _kernel, th=th, wd=wd, ci=ci, co=co, has_bias=has_bias
    )
    flops = 2 * b * h * wd * 9 * ci * co
    return pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, ci, co), lambda bb, ii: (0, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda bb, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wd, co), lambda bb, ii: (bb, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wpad, ci), x.dtype),
            pltpu.VMEM((th * wd, co), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + w.size * 2 + b * h * wd * co * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, w.astype(x.dtype), bias_arg.astype(x.dtype))


def supports_pallas_conv3x3(x_shape, kernel_shape, strides, compute_dtype) -> bool:
    """Dispatch rule: 3×3 stride-1 bf16 convs at the VAE level shapes."""
    if compute_dtype != jnp.bfloat16:
        return False
    if kernel_shape[:2] != (3, 3) or tuple(strides) != (1, 1):
        return False
    _, h, w, ci = x_shape
    co = kernel_shape[-1]
    if min(ci, co) < 128 or ci % 128 or co % 128 or w % 16:
        return False
    return _pick_tile_h(h, w, ci, co) > 0


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x,
        w,
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


@jax.custom_vjp
def conv3x3(x: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """3×3 stride-1 SAME conv (NHWC / HWIO) via the Pallas tap-matmul kernel.

    ``w`` and ``bias`` are cast to ``x.dtype`` (the compute dtype). Falls
    back to the XLA conv when the shape is outside the kernel's envelope.
    """
    if not supports_pallas_conv3x3(x.shape, w.shape, (1, 1), x.dtype):
        y = _lax_conv(x, w.astype(x.dtype))
        return y if bias is None else y + bias.astype(y.dtype)
    th = _pick_tile_h(x.shape[1], x.shape[2], x.shape[3], w.shape[-1])
    return _conv3x3_pallas(x, w.astype(x.dtype), None if bias is None else bias.astype(x.dtype), th)


def _fwd(x, w, bias):
    return conv3x3(x, w, bias), (x, w, bias)


def _bwd(res, g):
    x, w, bias = res
    wc = w.astype(x.dtype)
    # Data grad: 3×3 SAME conv of g with the flipped, in/out-transposed kernel.
    w_flip = jnp.transpose(wc[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3(g, w_flip, None)
    # Weight grad: transpose of the (linear-in-w) XLA conv — emitted directly
    # as the standard conv-weight-grad contraction, no forward re-evaluation.
    dw = jax.linear_transpose(lambda ww: _lax_conv(x, ww), wc)(g)[0]
    db = None if bias is None else jnp.sum(g, axis=(0, 1, 2)).astype(bias.dtype)
    return dx, dw.astype(w.dtype), db


conv3x3.defvjp(_fwd, _bwd)
