"""Core conv/attention blocks of the Flux-derived VAE (NHWC, TPU-first).

Re-design of /root/reference/eo_vae/models/modules/layers.py (ResnetBlock,
AttnBlock, Upsample, Downsample) and the AdaIN WavelengthConditioner from
/root/reference/eo_vae/models/model.py:35-64.

Layout: NHWC throughout — channels ride the TPU lane dimension, convs lower
directly onto the MXU. Normalizations run in fp32 (`Policy.norm_dtype`);
convs run in the policy compute dtype (bf16 in production).

Numerical-parity details preserved from the reference:
- GroupNorm: 32 groups, eps=1e-6 (layers.py:14-18).
- Downsample: asymmetric (0,1,0,1) pad then VALID 3×3 stride-2 conv
  (layers.py:33-37).
- Upsample: nearest ×2 then 3×3 conv (layers.py:47-50).
- AttnBlock: single-head SDPA over the flattened H·W tokens with residual
  1×1 output projection (layers.py:128-142).
- AdaIN emb_proj init: zero weights, bias = [1]*C ++ [0]*C (layers.py:71-76).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.precision import FULL_PRECISION, Policy


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def _conv(features: int, kernel: int, stride: int, padding, policy: Policy, name: str):
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        precision=policy.precision,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
        name=name,
    )


def policy_conv3x3(
    module: nn.Module,
    x: jax.Array,
    features: int,
    name: str,
    policy: Policy,
    kernel_init=None,
) -> jax.Array:
    """Declare a 3×3 stride-1 SAME conv (standard nn.Conv parameter
    layout/names) and apply it via the policy's conv algorithm —
    "direct" (XLA), "winograd", or "int8" (W8A8 MXU, inference only).
    Callable from any compact module; used by the VAE ResnetBlock and the
    SR UNet's time-conditioned blocks."""
    kw = dict(
        features=features,
        kernel_size=(3, 3),
        padding=((1, 1), (1, 1)),
        precision=policy.precision,
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
        name=name,
    )
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    conv = nn.Conv(**kw)
    algo = policy.conv_algorithm
    if not module.is_initializing() and algo != "direct":
        params = module.get_variable("params", name)
        kernel, bias = params["kernel"], params["bias"]
        if algo == "winograd":
            from eovax.kernels.winograd import should_use_winograd, winograd_conv3x3

            if should_use_winograd(x.shape, kernel.shape, (1, 1), policy.compute_dtype):
                return winograd_conv3x3(x, kernel, bias, compute_dtype=policy.compute_dtype)
        elif algo == "int8":
            if kernel.dtype == jnp.int8:
                # Export-time pre-quantized weights: int8 kernel +
                # kernel_scale (+ optional calibrated act_scale) stored
                # in the artifact by quantize_params_int8 — no per-call
                # weight quantization.
                from eovax.kernels.qconv import int8_conv3x3_prequant

                return int8_conv3x3_prequant(
                    x, kernel, params["kernel_scale"], bias,
                    act_scale=params.get("act_scale"),
                    compute_dtype=policy.compute_dtype,
                )
            from eovax.kernels.qconv import int8_conv3x3, should_use_int8

            if should_use_int8(x.shape, kernel.shape, (1, 1), policy.compute_dtype):
                return int8_conv3x3(x, kernel, bias, compute_dtype=policy.compute_dtype)
        elif algo == "int8-calib":
            from eovax.kernels.qconv import should_use_int8

            if should_use_int8(x.shape, kernel.shape, (1, 1), policy.compute_dtype):
                # Offline calibration pass: record this conv's activation
                # percentile-amax (fp32) for static int8 scales, then run
                # the normal bf16 conv so downstream activations are clean.
                amax = jnp.percentile(
                    jnp.abs(x.astype(jnp.float32)), policy.calib_percentile
                )
                module.sow("calib", f"{name}_amax", amax)
    return conv(x)


def _group_norm(policy: Policy, name: str):
    """GroupNorm with fp32 statistics, output cast back to the compute
    dtype — keeps the big spatial activations in bf16 between ops (the
    fp32 island is internal to the normalization, matching the reference's
    AMP behavior).

    Measured (round 2, v5e): XLA's GN lowering is already overlapped with
    the MXU — ablating the stats pass entirely saves only 2.2 of 63 ms on
    the B=16 decode, and routing stats through the Pallas kernel
    (eovax.kernels.groupnorm) was 1.56× *slower* end-to-end because the
    call forces layout copies of the bf16 activations. Keep nn.GroupNorm.
    """
    norm = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=policy.norm_dtype, name=name)
    return lambda x: norm(x).astype(policy.compute_dtype)


def sincos_embed_microns(embed_dim: int, wvs: jax.Array) -> jax.Array:
    """Sincos embedding of raw µm wavelengths (model.py:17-32 — note: no
    µm→nm scaling here, unlike the dynamic-conv embedding)."""
    from eovax.nn.dynamic_conv import precise_sin_cos

    half = embed_dim // 2
    omega = jnp.arange(half, dtype=jnp.float32) / float(half)
    omega = 1.0 / (10000.0**omega)
    out = jnp.einsum("n,d->nd", wvs.reshape(-1).astype(jnp.float32), omega)
    s, c = precise_sin_cos(out)
    return jnp.concatenate([s, c], axis=-1)  # [N, D]


class WavelengthConditioner(nn.Module):
    """Wavelength set → global AdaIN style vector (model.py:35-64)."""

    embed_dim: int = 512

    @nn.compact
    def __call__(self, wvs: jax.Array) -> jax.Array:
        emb = sincos_embed_microns(self.embed_dim, wvs)  # [N, D]
        emb = emb.mean(axis=0)  # [D] — modality "fingerprint"
        # torch Sequential indices: mlp.0 / mlp.2 / mlp.4 (SiLU at 1, 3).
        h = nn.Dense(self.embed_dim * 2, name="mlp_0", dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)(emb)
        h = jax.nn.silu(h)
        h = nn.Dense(self.embed_dim, name="mlp_2", dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.embed_dim, name="mlp_4", dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)(h)


class Downsample(nn.Module):
    """Stride-2 conv with asymmetric (right/bottom) padding.

    The (0,1,0,1) pad rides inside the conv (lax supports asymmetric
    per-dim padding) instead of a jnp.pad — same math, but XLA never
    materializes the padded copy of the full-resolution activation.
    """

    in_channels: int
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _conv(self.in_channels, 3, 2, ((0, 1), (0, 1)), self.policy, "conv")(x)


class Upsample(nn.Module):
    """Nearest ×2 upsample + 3×3 conv, computed as one transposed conv.

    TPU optimization: nearest-×2 followed by a SAME 3×3 conv is
    algebraically a stride-2 transposed convolution with a 4×4 tap-sum
    kernel; expressed via ``lhs_dilation`` XLA runs it on its
    backward-of-strided-conv path with no 4× upsampled intermediate (see
    :func:`subpixel_upsample_conv` for the derivation and round-3
    measurements). Parameters stay in the reference 3×3 layout
    (checkpoint-compatible).
    """

    in_channels: int
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = _conv(self.in_channels, 3, 1, ((1, 1), (1, 1)), self.policy, "conv")
        if self.is_initializing():
            # Declare the 3×3 parameters via the reference path once.
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return conv(up)
        params = self.get_variable("params", "conv")
        return subpixel_upsample_conv(x, params["kernel"], params["bias"], self.policy)


def subpixel_upsample_conv(
    x: jax.Array, w3: jax.Array, bias: jax.Array, policy: Policy
) -> jax.Array:
    """conv3x3(nearest_up2(x)) as ONE input-dilated (transposed) conv.

    Nearest-×2 followed by a SAME 3×3 conv is algebraically a stride-2
    transposed convolution with a 4×4 kernel whose taps are sums of the
    3×3 taps: along each axis, output 2i+phase reads input offsets
    d∈{phase−1, phase}, giving kernel order [w0, w0+w1, w1+w2, w2]
    (verified exactly against a float64 model). Expressed directly as
    `lhs_dilation=(2,2), padding=(2,2)` — the same lowering XLA uses for
    the backward of a strided conv, which the TPU backend runs FAR better
    than hand-decomposed per-phase convs: measured (round 3, v5e, B=16)
    3.2 vs 5.4 ms at 64²→128²·512ch and 3.4 vs 8.3 ms at
    128²→256²·256ch — −7.2 ms on the flagship decode. No 4× upsampled
    intermediate and no interleave pass exist at all. Matches
    nearest+conv up to fp reassociation of the tap sums; parameters stay
    in the reference 3×3 layout (checkpoint-compatible).
    """
    w3f = w3.astype(jnp.float32)
    rows = jnp.stack(
        [w3f[0], w3f[0] + w3f[1], w3f[1] + w3f[2], w3f[2]], axis=0
    )  # [4, 3, I, O]
    k4 = jnp.stack(
        [rows[:, 0], rows[:, 0] + rows[:, 1], rows[:, 1] + rows[:, 2], rows[:, 2]],
        axis=1,
    )  # [4, 4, I, O]
    out = jax.lax.conv_general_dilated(
        policy.cast_to_compute(x),
        policy.cast_to_compute(k4),
        window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision,
        preferred_element_type=policy.compute_dtype,
    )
    return out + bias.astype(out.dtype)


class ResnetBlock(nn.Module):
    """GN→swish→conv ×2 with optional AdaIN modulation after norm2.

    The two 3×3 convs carry ~85% of the VAE's FLOPs; under
    ``policy.conv_algorithm == "winograd"`` they run as F(2×2,3×3)
    batched matmuls (eovax.kernels.winograd) with identical parameters —
    the nn.Conv declares the variables, the Winograd path reads them.
    """

    in_channels: int
    out_channels: int
    cond_dim: int | None = None
    policy: Policy = FULL_PRECISION

    def _conv3x3(self, x: jax.Array, name: str) -> jax.Array:
        return policy_conv3x3(self, x, self.out_channels, name, self.policy)

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array | None = None) -> jax.Array:
        h = _group_norm(self.policy, "norm1")(x)
        h = swish(h)
        h = self._conv3x3(h, "conv1")

        h = _group_norm(self.policy, "norm2")(h)
        if self.cond_dim is not None and emb is not None:
            # AdaIN: emb [B, cond] or [cond] → per-channel scale/shift.
            style = nn.Dense(
                2 * self.out_channels,
                name="emb_proj",
                dtype=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype: jnp.concatenate(
                    [jnp.ones(self.out_channels, dtype), jnp.zeros(self.out_channels, dtype)]
                ),
            )(emb)
            scale, shift = jnp.split(style, 2, axis=-1)
            if scale.ndim == 1:  # shared across batch
                scale, shift = scale[None, None, None, :], shift[None, None, None, :]
            else:  # [B, C] → [B,1,1,C]
                scale, shift = scale[:, None, None, :], shift[:, None, None, :]
            h = h * scale.astype(h.dtype) + shift.astype(h.dtype)

        h = swish(h)
        h = self._conv3x3(h, "conv2")

        if self.in_channels != self.out_channels:
            x = _conv(self.out_channels, 1, 1, "VALID", self.policy, "nin_shortcut")(x)
        return x.astype(h.dtype) + h


class AttnBlock(nn.Module):
    """Single-head self-attention over H·W tokens with residual projection.

    Only used at the VAE mid-block (32×32 = 1024 tokens at 256² input —
    model.py:154,268). Softmax in fp32. For large inputs XLA's fused
    attention is sufficient at this scale; a Pallas flash kernel is
    available in eovax.kernels.attention for high-resolution inference.
    """

    in_channels: int
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        h_ = _group_norm(self.policy, "norm")(x)
        q = _conv(c, 1, 1, "VALID", self.policy, "q")(h_)
        k = _conv(c, 1, 1, "VALID", self.policy, "k")(h_)
        v = _conv(c, 1, 1, "VALID", self.policy, "v")(h_)

        q = q.reshape(b, h * w, c)
        k = k.reshape(b, h * w, c)
        v = v.reshape(b, h * w, c)

        from eovax.kernels.attention import sdpa_auto

        out = sdpa_auto(q, k, v, precision=self.policy.precision)
        out = out.reshape(b, h, w, c)
        out = _conv(c, 1, 1, "VALID", self.policy, "proj_out")(out)
        return x.astype(out.dtype) + out
