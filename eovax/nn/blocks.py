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


def _group_norm(policy: Policy, name: str):
    # fp32 statistics regardless of compute dtype.
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=policy.norm_dtype, name=name)


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
    """Stride-2 conv with asymmetric (right/bottom) padding."""

    in_channels: int
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(self.in_channels, 3, 2, "VALID", self.policy, "conv")(x)


class Upsample(nn.Module):
    """Nearest ×2 upsample + 3×3 conv."""

    in_channels: int
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(self.in_channels, 3, 1, ((1, 1), (1, 1)), self.policy, "conv")(x)


class ResnetBlock(nn.Module):
    """GN→swish→conv ×2 with optional AdaIN modulation after norm2."""

    in_channels: int
    out_channels: int
    cond_dim: int | None = None
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array | None = None) -> jax.Array:
        h = _group_norm(self.policy, "norm1")(x)
        h = swish(h)
        h = _conv(self.out_channels, 3, 1, ((1, 1), (1, 1)), self.policy, "conv1")(h)

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
        h = _conv(self.out_channels, 3, 1, ((1, 1), (1, 1)), self.policy, "conv2")(h)

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

        scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k,
            precision=self.policy.precision,
            preferred_element_type=self.policy.norm_dtype,
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v, precision=self.policy.precision)
        out = out.reshape(b, h, w, c)
        out = _conv(c, 1, 1, "VALID", self.policy, "proj_out")(out)
        return x.astype(out.dtype) + out
