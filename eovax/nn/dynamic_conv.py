"""Wavelength-conditioned dynamic convolutions (hypernetwork stems).

TPU-native re-design of the reference's DynamicConv / DynamicConv_decoder
(/root/reference/eo_vae/models/modules/dynamic_conv.py:369-710). One model
handles any sensor: a tiny transformer hypernetwork maps per-band
wavelengths (µm) to the weights of the input/output 3×3 conv stems, so the
same VAE encodes S2RGB (3ch), S1RTC (2ch), S2L2A (12ch), S2L1C (13ch).

Design notes (TPU):
- Weight generation is a ≤142-token transformer — negligible FLOPs. It runs
  in fp32; since it depends only on ``wvs`` (constant across a batch) XLA
  schedules it once, off the image-conv hot path.
- The generated kernel feeds a single NHWC `lax.conv_general_dilated`,
  lowered onto the MXU.
- Semantics replicated exactly for checkpoint fidelity: sincos embedding of
  wvs*1000 (µm→nm, dynamic_conv.py:511), `scaler=0.1` on weight and bias
  (dynamic_conv.py:523-525), and the decoder's **double bias scaling**
  (dynamic_conv.py:693,697) in the forward path but single scaling in the
  distillation path (dynamic_conv.py:660).
"""

from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.precision import FULL_PRECISION, Policy
from eovax.nn.transformer import TransformerEncoder

# Reference init for all Linears inside the generators: xavier-uniform
# weights, bias = 0.01 (dynamic_conv.py:443-457).
_HI = jax.lax.Precision.HIGHEST
_XAVIER = nn.initializers.xavier_uniform()
_BIAS001 = nn.initializers.constant(0.01)


def _split_two_pi() -> tuple[float, float, float]:
    """Split 2π into three fp32 parts; the first two have ≤12 significand
    bits so n·P1 and n·P2 are exact for n < 2^11 (wavelength args reach
    ~12000 rad → n ≤ 1910)."""
    import numpy as np

    val = 2.0 * np.pi
    parts = []
    rem = val
    for _ in range(2):
        f = np.float32(rem)
        bits = f.view(np.uint32) & np.uint32(0xFFFFF000)  # keep 11 mantissa bits
        p = bits.view(np.float32)
        parts.append(float(p))
        rem = rem - float(p)
    parts.append(float(np.float32(rem)))
    return tuple(parts)


_P1, _P2, _P3 = _split_two_pi()
_INV_TWO_PI = 1.0 / (2.0 * 3.141592653589793)


def precise_sin_cos(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """fp32 sin/cos with exact additive range reduction.

    XLA's fp32 sin/cos lose ~1e-3 accuracy for arguments of O(10³) rad
    (sloppy range reduction), while torch's SLEEF path is ~1 ulp. The
    wavelength embeddings use wvs·1000 ≈ up to 12000 rad, so we reduce
    x → r ∈ [-π, π] with a 3-part 2π split before calling sin/cos,
    restoring bit-near parity with the reference.
    """
    x = x.astype(jnp.float32)
    n = jnp.round(x * _INV_TWO_PI)
    r = x - n * _P1
    r = r - n * _P2
    r = r - n * _P3
    return jnp.sin(r), jnp.cos(r)


def sincos_wavelength_embed(embed_dim: int, pos: jax.Array) -> jax.Array:
    """1D sin/cos positional embedding of wavelength positions.

    Parity with dynamic_conv.py:37-59: omega = 1/10000^(2i/D), out[m,d] =
    pos[m]*omega[d], embedding = [sin(out), cos(out)].

    Args:
        embed_dim: output dim D (even).
        pos: positions [M] (already scaled to nm by the caller).

    Returns:
        [M, D] fp32 embedding.
    """
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / (10000.0**omega)
    out = jnp.einsum("m,d->md", pos.reshape(-1).astype(jnp.float32), omega)
    s, c = precise_sin_cos(out)
    return jnp.concatenate([s, c], axis=1)


def apply_dynamic_kernel(
    x: jax.Array,
    kernel_hwio: jax.Array,
    bias: jax.Array,
    *,
    stride: int = 1,
    padding: int = 1,
    policy: Policy = FULL_PRECISION,
) -> jax.Array:
    """Apply a generated HWIO kernel + bias as an NHWC conv (pure fn — used
    both by the stem modules and by kernel-space loss closures)."""
    y = jax.lax.conv_general_dilated(
        policy.cast_to_compute(x),
        policy.cast_to_compute(kernel_hwio),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=policy.precision,
        preferred_element_type=policy.compute_dtype,
    )
    return y + bias.astype(y.dtype)


class FCResLayer(nn.Module):
    """Fully-connected residual layer (dynamic_conv.py:336-366)."""

    linear_size: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = dict(dtype=jnp.float32, kernel_init=_XAVIER, bias_init=_BIAS001, precision=_HI)
        y = jax.nn.relu(nn.Dense(self.linear_size, name="w1", **d)(x))
        y = jax.nn.relu(nn.Dense(self.linear_size, name="w2", **d)(y))
        return x + y


class TransformerWeightGenerator(nn.Module):
    """Transformer hypernetwork emitting conv weights per wavelength token.

    Parity with dynamic_conv.py:62-183. Sequence = [128 learned weight
    tokens; N wavelength tokens; 1 bias token] through a post-norm torch-style
    encoder. Weights are read from the wavelength-token outputs (+ residual
    wavelength features); the bias from the final bias token (encoder
    variant) or from per-wavelength features + bias token (decoder variant,
    one scalar per output channel).
    """

    input_dim: int  # wv_planes (transformer d_model)
    output_dim: int  # K*K*embed_dim
    embed_dim: int
    num_heads: int = 4
    num_layers: int = 1
    variant: Literal["encoder", "decoder"] = "encoder"
    wt_num: int = 128

    @nn.compact
    def __call__(self, waves: jax.Array) -> tuple[jax.Array, jax.Array]:
        # waves: [N, input_dim] wavelength features.
        weight_tokens = self.param(
            "weight_tokens",
            nn.initializers.normal(stddev=0.02),
            (self.wt_num, self.input_dim),
            jnp.float32,
        )
        bias_token = self.param(
            "bias_token",
            nn.initializers.normal(stddev=0.02),
            (1, self.input_dim),
            jnp.float32,
        )
        x = jnp.concatenate([weight_tokens, waves, bias_token], axis=0)
        out = TransformerEncoder(
            d_model=self.input_dim,
            nhead=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=2048,  # torch TransformerEncoderLayer default
            norm_first=False,
            dense_init=_XAVIER,
            bias_init=_BIAS001,
            name="transformer_encoder",
        )(x)

        dense_kw = dict(dtype=jnp.float32, kernel_init=_XAVIER, bias_init=_BIAS001, precision=_HI)
        fc_weight = nn.Dense(self.output_dim, name="fc_weight", **dense_kw)
        weights = fc_weight(out[self.wt_num : -1] + waves)  # [N, output_dim]

        if self.variant == "encoder":
            fc_bias = nn.Dense(self.embed_dim, name="fc_bias", **dense_kw)
            bias = fc_bias(out[-1])  # [embed_dim]
        else:
            # Decoder: one scalar bias per wavelength channel, computed from
            # the wavelength-token outputs + the (input) bias token
            # (dynamic_conv.py:179-183).
            fc_bias = nn.Dense(1, name="fc_bias", **dense_kw)
            n = waves.shape[0]
            bias = fc_bias(out[self.wt_num : -1] + jnp.tile(bias_token, (n, 1)))  # [N,1]
        return weights, bias


class FactorizedWeightGenerator(nn.Module):
    """Low-rank factorized hypernetwork head (dynamic_conv.py:186-302).

    Pre-norm transformer (ff = 4*d_model, dropout 0.1) with a
    Linear→GELU→Linear weight head. (The reference zero-inits the head's
    last layer but immediately clobbers it with the xavier re-init pass at
    dynamic_conv.py:456 — we reproduce the post-clobber state: xavier.)
    """

    input_dim: int
    output_dim: int
    embed_dim: int
    num_heads: int = 4
    num_layers: int = 2
    rank_ratio: int = 4
    variant: Literal["encoder", "decoder"] = "encoder"
    wt_num: int = 128

    @nn.compact
    def __call__(
        self, waves: jax.Array, *, deterministic: bool = True
    ) -> tuple[jax.Array, jax.Array]:
        weight_tokens = self.param(
            "weight_tokens",
            nn.initializers.normal(stddev=0.02),
            (self.wt_num, self.input_dim),
            jnp.float32,
        )
        bias_token = self.param(
            "bias_token",
            nn.initializers.normal(stddev=0.02),
            (1, self.input_dim),
            jnp.float32,
        )
        x = jnp.concatenate([weight_tokens, waves, bias_token], axis=0)
        out = TransformerEncoder(
            d_model=self.input_dim,
            nhead=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=self.input_dim * 4,
            norm_first=True,
            dropout_rate=0.1,
            dense_init=_XAVIER,
            bias_init=_BIAS001,
            name="transformer_encoder",
        )(x, deterministic=deterministic)

        features = out[self.wt_num : -1] + waves

        dense_kw = dict(dtype=jnp.float32, kernel_init=_XAVIER, bias_init=_BIAS001, precision=_HI)
        rank = max(32, self.output_dim // self.rank_ratio)
        h = nn.Dense(rank, name="fc_weight_0", **dense_kw)(features)
        h = jax.nn.gelu(h, approximate=False)
        weights = nn.Dense(self.output_dim, name="fc_weight_2", **dense_kw)(h)

        if self.variant == "encoder":
            bias = nn.Dense(self.embed_dim, name="fc_bias", **dense_kw)(out[-1])
        else:
            n = waves.shape[0]
            bias_features = features + jnp.tile(bias_token, (n, 1))
            bias = nn.Dense(1, name="fc_bias", **dense_kw)(bias_features)
        return weights, bias


class _DynamicConvBase(nn.Module):
    """Shared machinery for the encoder/decoder dynamic stems.

    Subclasses set ``_VARIANT`` ('encoder'/'decoder'); all public methods
    (`__call__`, `generate`, `get_distillation_weight`) are usable via
    ``module.apply(variables, ..., method=...)``.
    """

    wv_planes: int
    embed_dim: int = 128
    inter_dim: int = 128  # kept for config parity; unused (as in the reference)
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    num_layers: int = 1
    num_heads: int = 4
    generator_type: Literal["transformer", "factorized"] = "transformer"
    rank_ratio: int = 4
    policy: Policy = FULL_PRECISION

    SCALER: float = 0.1
    _VARIANT: str = "encoder"

    def setup(self):
        num_kernel = self.kernel_size * self.kernel_size * self.embed_dim
        if self.generator_type == "factorized":
            self.weight_generator = FactorizedWeightGenerator(
                input_dim=self.wv_planes,
                output_dim=num_kernel,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                num_layers=self.num_layers,
                rank_ratio=self.rank_ratio,
                variant=self._VARIANT,
            )
        else:
            self.weight_generator = TransformerWeightGenerator(
                input_dim=self.wv_planes,
                output_dim=num_kernel,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                num_layers=self.num_layers,
                variant=self._VARIANT,
            )
        self.fclayer = FCResLayer(self.wv_planes)

    def _wave_features(self, wvs: jax.Array) -> jax.Array:
        # µm → nm scaling before the sincos embed (dynamic_conv.py:511).
        waves = sincos_wavelength_embed(self.wv_planes, wvs * 1000.0)
        return self.fclayer(waves)

    def _raw_weight_bias(self, wvs: jax.Array) -> tuple[jax.Array, jax.Array]:
        waves = self._wave_features(wvs)
        if isinstance(self.weight_generator, FactorizedWeightGenerator):
            # The factorized generator carries the reference's 0.1
            # transformer dropout (ref dynamic_conv.py:210), active in
            # torch train mode. Flax convention: dropout engages exactly
            # when the caller supplies a "dropout" RNG (train steps do;
            # inference apply()s don't) — no train-flag plumbing needed.
            return self.weight_generator(
                waves, deterministic=not self.has_rng("dropout")
            )
        return self.weight_generator(waves)

    def _conv(self, x: jax.Array, kernel_hwio: jax.Array, bias: jax.Array) -> jax.Array:
        return apply_dynamic_kernel(
            x, kernel_hwio, bias,
            stride=self.stride, padding=self.padding, policy=self.policy,
        )


class DynamicConv(_DynamicConvBase):
    """Encoder input stem: [B,H,W,N_wv] → [B,H,W,embed_dim].

    Generated kernel layout: the reference builds torch OIHW [embed, N, K, K]
    (dynamic_conv.py:514-517); we build HWIO [K, K, N, embed] directly.
    """

    _VARIANT: str = "encoder"

    def generate(self, wvs: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Generate (kernel [K,K,N,E], bias [E]) already scaled by 0.1."""
        weight, bias = self._raw_weight_bias(wvs)
        n = wvs.shape[0]
        k = self.kernel_size
        kernel = weight.reshape(n, k, k, self.embed_dim).transpose(1, 2, 0, 3)
        return kernel * self.SCALER, bias.reshape(self.embed_dim) * self.SCALER

    def get_distillation_weight(self, wvs_microns: jax.Array):
        """Torch-layout (weight [E,N,K,K], bias [E]) ·0.1 for the stage-1
        distillation loss (dynamic_conv.py:471-497)."""
        kernel, bias = self.generate(wvs_microns)
        return kernel.transpose(3, 2, 0, 1), bias

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        kernel, bias = self.generate(wvs)
        return self._conv(x, kernel, bias)


class DynamicConvDecoder(_DynamicConvBase):
    """Decoder output stem: [B,H,W,embed_dim] → [B,H,W,N_wv].

    Replicates the reference's decoder-bias double scaling in the forward
    path (·0.1 at dynamic_conv.py:693 and again at :697) while the
    distillation path scales once (:660). Checkpoint-compatible.
    """

    num_layers: int = 2  # decoder default differs (dynamic_conv.py:549)
    _VARIANT: str = "decoder"

    def generate(self, wvs: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Generate (kernel [K,K,E,N] ·0.1, bias [N] ·0.01 — double-scaled)."""
        kernel, bias = self._generate_raw(wvs)
        return kernel * self.SCALER, bias * (self.SCALER * self.SCALER)

    def _generate_raw(self, wvs: jax.Array) -> tuple[jax.Array, jax.Array]:
        weight, bias = self._raw_weight_bias(wvs)
        n = wvs.shape[0]
        k = self.kernel_size
        # torch OIHW [N, E, K, K] (dynamic_conv.py:684-687) → HWIO [K, K, E, N]
        kernel = weight.reshape(n, k, k, self.embed_dim).transpose(1, 2, 3, 0)
        return kernel, bias.reshape(n)

    def get_distillation_weight(self, wvs_microns: jax.Array):
        """Torch-layout (weight [N,E,K,K], bias [N]) ·0.1 — single bias scale
        (dynamic_conv.py:638-664)."""
        kernel, bias = self._generate_raw(wvs_microns)
        return (
            kernel.transpose(3, 2, 0, 1) * self.SCALER,
            bias * self.SCALER,
        )

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        kernel, bias = self.generate(wvs)
        return self._conv(x, kernel, bias)
