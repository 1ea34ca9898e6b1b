"""int8 (W8A8) quantized 3×3 conv for inference serving.

The v5e MXU runs int8 at 2× the bf16 rate (394 vs 197 TOPS); measured on
the VAE's conv shapes the int8 path reaches 319 TF/s at 64²·512ch —
1.83× the bf16 conv (slope-method microbenchmark, ARCHITECTURE.md
round-2 notes). This module quantizes the ResnetBlock 3×3 convs (the
~85%-of-FLOPs carriers) on the fly:

- activations: dynamic per-tensor symmetric abs-max → int8 (no
  calibration pass needed; one cheap VPU reduction per conv),
- weights: per-output-channel symmetric abs-max → int8, recomputed per
  call (parameters are traced jit arguments in the serving/sampler call
  sites; the re-quantization is a trivial VPU pass over the kernels),
- accumulation in int32 on the MXU, dequantized with the combined
  ``s_x · s_w[c]`` scale, bias added in fp32.

Everything else (GroupNorm, swish, residuals, attention, the dynamic
wavelength stems) stays bf16/fp32 — the quality-sensitive ops never see
int8. Select with ``Policy.conv_algorithm = "int8"`` (INT8_POLICY);
inference-only: ``jnp.round`` has zero gradient, so training policies
must stay on the direct path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jax.Array, axis=None) -> tuple[jax.Array, jax.Array]:
    """Symmetric abs-max int8 quantization. Returns (q, scale) with
    ``x ≈ q · scale``; scale has the reduced shape (keepdims)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


@jax.custom_vjp
def _int8_conv3x3_core(x: jax.Array, w: jax.Array) -> jax.Array:
    xq, sx = quantize_symmetric(x)  # per-tensor
    wq, sw = quantize_symmetric(w, axis=(0, 1, 2))  # per-out-channel [1,1,1,O]
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (sx.reshape(()) * sw.reshape(1, 1, 1, -1)).astype(jnp.float32)
    return y.astype(jnp.float32) * scale


def _int8_fwd(x, w):
    return _int8_conv3x3_core(x, w), None


def _int8_bwd(res, g):
    raise NotImplementedError(
        "int8_conv3x3 is inference-only: gradients through the round() "
        "quantization are zero. Train with the 'direct' conv algorithm "
        "(DEFAULT_POLICY / '16-mixed') and switch to INT8_POLICY for "
        "serving/export."
    )


_int8_conv3x3_core.defvjp(_int8_fwd, _int8_bwd)


def int8_conv3x3(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None,
    *,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """3×3 stride-1 SAME conv with on-the-fly W8A8 quantization.

    ``x``: NHWC activations (bf16/fp32); ``w``: HWIO fp32 parameters.
    Inference-only: differentiating through it raises (custom_vjp bwd) —
    silently-zero gradients through round() would otherwise train a
    broken model from any non-CLI caller.
    """
    out = _int8_conv3x3_core(x, w)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(compute_dtype)


def should_use_int8(x_shape, kernel_shape, strides, compute_dtype) -> bool:
    """Same envelope as the other conv-algorithm dispatches: the large
    3×3 stride-1 body convs; stems/1×1/strided convs stay bf16."""
    if compute_dtype != jnp.bfloat16:
        return False
    if kernel_shape[:2] != (3, 3) or tuple(strides) != (1, 1):
        return False
    ci, co = x_shape[-1], kernel_shape[-1]
    return min(ci, co) >= 128
