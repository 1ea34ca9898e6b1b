"""int8 (W8A8) quantized 3×3 conv for inference serving.

The v5e MXU runs int8 at 2× the bf16 rate (394 vs 197 TOPS); measured on
the VAE's conv shapes the int8 path reaches 319 TF/s at 64²·512ch —
1.83× the bf16 conv (slope-method microbenchmark, ARCHITECTURE.md
round-2 notes). This module quantizes the ResnetBlock 3×3 convs (the
~85%-of-FLOPs carriers):

- activations: per-tensor symmetric → int8. Either **dynamic** abs-max
  (no calibration; one VPU reduction per conv) or **static** from a
  percentile-calibration pass (:func:`calibration_sow` +
  :func:`act_scales_from_calibration`) — the static scale removes the
  per-call reduction and saturates outliers at the calibrated range.
- weights: per-output-channel symmetric abs-max → int8. Either on the
  fly (fp32 kernels in the tree) or **pre-quantized once at export**
  (:func:`quantize_params_int8` stores int8 kernels + ``kernel_scale``
  leaves in the artifact — no per-call re-quantization, half the weight
  HBM traffic),
- accumulation in int32 on the MXU, dequantized with the combined
  ``s_x · s_w[c]`` scale, bias added in fp32.

Everything else (GroupNorm, swish, residuals, attention, the dynamic
wavelength stems) stays bf16/fp32 — the quality-sensitive ops never see
int8. Select with ``Policy.conv_algorithm = "int8"`` (INT8_POLICY);
inference-only: ``jnp.round`` has zero gradient, so training policies
must stay on the direct path.
"""

from __future__ import annotations

import re

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


# ---------------------------------------------------------------------------
# Pre-quantized weights (quantize once at export) + calibrated activations
# ---------------------------------------------------------------------------


def _int8_conv_prequant(x, wq, w_scale, amax):
    """int8 conv with weights already quantized (int8 HWIO + per-out-channel
    scale [O]); ``amax`` is the per-tensor activation range — a calibrated
    static scalar (outliers saturate at ±127) or the dynamic abs-max."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (sx * w_scale.reshape(1, 1, 1, -1)).astype(jnp.float32)
    return y.astype(jnp.float32) * scale


@jax.custom_vjp
def _int8_conv3x3_prequant_core(x, wq, w_scale, act_scale):
    # act_scale None (static Python check — presence is a tree-structure
    # fact at trace time) → dynamic abs-max; else the calibrated range,
    # with no wasted per-call reduction.
    amax = jnp.max(jnp.abs(x.astype(jnp.float32))) if act_scale is None else act_scale
    return _int8_conv_prequant(x, wq, w_scale, amax)


def _int8_pre_fwd(x, wq, w_scale, act_scale):
    return _int8_conv3x3_prequant_core(x, wq, w_scale, act_scale), None


_int8_conv3x3_prequant_core.defvjp(_int8_pre_fwd, lambda res, g: _int8_bwd(res, g))


def int8_conv3x3_prequant(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array | None,
    *,
    act_scale: jax.Array | None = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """3×3 stride-1 SAME conv with export-time-quantized int8 weights.

    No per-call weight quantization (VERDICT r2 weak #2): ``wq`` int8
    HWIO + ``w_scale`` fp32 [O] come straight from the artifact
    (:func:`quantize_params_int8`). Activations use the calibrated
    static scale when ``act_scale`` is given, else dynamic abs-max.
    Inference-only (backward raises, same guard as :func:`int8_conv3x3`).
    """
    if wq.dtype != jnp.int8:
        raise ValueError(f"prequant conv expects int8 weights, got {wq.dtype}")
    a = None if act_scale is None else jnp.asarray(act_scale, jnp.float32).reshape(())
    out = _int8_conv3x3_prequant_core(x, wq, w_scale.reshape(-1), a)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(compute_dtype)


#: Module names whose convs are declared through the policy-dispatched
#: ``policy_conv3x3`` (nn/blocks.py ResnetBlock, models/unet.py blocks).
#: ONLY these may carry int8 kernels: any other conv (down/upsample,
#: stems, 1×1, the multi_stage refinement blocks' identically-named
#: plain nn.Convs) is applied by nn.Conv, which would read a raw int8
#: kernel as numbers — silently wrong output, not an error. The parent
#: pattern pins the OWNING block type (ResnetBlock/_TimeResBlock param
#: scopes: down_i_block_j / up_i_block_j / mid_block_k), excluding
#: same-named convs in other modules.
_PREQUANT_CONV_NAMES = ("conv1", "conv2")
_PREQUANT_PARENT_RE = re.compile(r"^(down|up)_\d+_block_\d+$|^mid_block_\d+$")


def _eligible_kernel(path, leaf) -> bool:
    """Export-time analogue of :func:`should_use_int8`: the conv input
    channel count equals the kernel's I dim, so shape eligibility is
    decidable from the kernel; dispatch reachability from the conv name
    AND its parent block scope (stride is invisible here — the stride-2
    Downsample conv has an identically-shaped kernel — and plain-conv
    modules may reuse the conv1/conv2 names)."""
    import numpy as _np

    return (
        len(path) >= 2
        and path[-1] in _PREQUANT_CONV_NAMES
        and _PREQUANT_PARENT_RE.match(path[-2]) is not None
        and hasattr(leaf, "shape")
        and getattr(leaf, "ndim", 0) == 4
        and tuple(leaf.shape[:2]) == (3, 3)
        and min(leaf.shape[2], leaf.shape[3]) >= 128
        # Float kernels only: re-exporting an already-quantized tree must
        # pass int8 kernels (and their kernel_scale) through untouched —
        # re-quantizing the raw int8 integers and then overwriting the new
        # scale with the stale one would silently corrupt the weights.
        and _np.issubdtype(_np.dtype(leaf.dtype), _np.floating)
    )


def quantize_params_int8(params, act_scales=None):
    """Quantize eligible body-conv kernels ONCE (export time).

    Walks a flax ``params`` tree; every eligible ``kernel`` leaf is
    replaced by its int8 per-out-channel quantization, with companion
    leaves ``kernel_scale`` (fp32 [O]) and — when ``act_scales`` provides
    one for the module path — ``act_scale`` (fp32 scalar, the calibrated
    amax) stored alongside in the same module dict. The conv dispatch
    (nn/blocks.py) detects the int8 dtype and takes the prequant path.

    Returns (new_params, n_quantized).
    """
    act_scales = act_scales or {}
    n = 0

    def walk(tree, path):
        nonlocal n
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "kernel" and _eligible_kernel(path, v):
                wq, sw = quantize_symmetric(jnp.asarray(v), axis=(0, 1, 2))
                out["kernel"] = wq
                out["kernel_scale"] = sw.reshape(-1)
                amax = act_scales.get(path)
                if amax is not None:
                    out["act_scale"] = jnp.asarray(amax, jnp.float32).reshape(())
                n += 1
            else:
                out[k] = walk(v, path + (k,)) if isinstance(v, dict) else v
        return out

    return walk(params, ()), n


def act_scales_from_calibration(calib_trees):
    """Reduce per-batch calibration collections to static activation
    scales.

    ``calib_trees``: list of ``calib`` variable collections from
    ``core.apply(..., mutable=["calib"])`` runs under a policy with
    ``conv_algorithm="int8-calib"`` — each leaf is a tuple of per-call
    fp32 percentile-amax scalars (flax ``sow`` appends per call; the
    percentile itself is ``policy.calib_percentile``). Returns
    {module_path_tuple: amax} taking the max over batches and calls —
    the amax such that the percentile mass of every calibration batch is
    within the non-saturating range.
    """
    out: dict = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:  # sow leaf: tuple of scalars, name "<conv>_amax"
                assert k.endswith("_amax"), k
                key = path + (k[: -len("_amax")],)
                vals = [float(x) for x in (v if isinstance(v, (tuple, list)) else (v,))]
                out[key] = max(out.get(key, 0.0), *vals)

    for tree in calib_trees:
        walk(tree, ())
    return out
