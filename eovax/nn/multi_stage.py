"""Multi-stage dynamic decoder heads — experimental stem variants.

Re-design of /root/reference/eo_vae/models/modules/multi_stage_dynamic_conv.py
(SURVEY.md §2.1 "orphan/experimental" — the paper's explored alternatives to
the single dynamic output stem, ported as capability flags). All variants
expose ``get_distillation_weight`` (final projection only,
multi_stage_dynamic_conv.py:487-539) for stage-1 compatibility.

Variants:
- ``MultiStageDynamicDecoder`` (324-539): shared refinement convs → FiLM
  conditioning on the mean wavelength → wavelength-specific final
  projection from a factorized spatial⊗channel generator.
- ``StackedDynamicDecoder`` (825-1041): stacked depthwise dynamic convs
  with residuals → final projection.
- ``ProgressiveMultiStageDynamicDecoder`` (541-703): shared pre-conv →
  progressive wavelength-conditioned stages, last stage projecting to the
  output bands.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.precision import FULL_PRECISION, Policy
from eovax.nn.dynamic_conv import (
    FCResLayer,
    TransformerWeightGenerator,
    apply_dynamic_kernel,
    sincos_wavelength_embed,
)

_XAVIER = nn.initializers.xavier_uniform()
_B001 = nn.initializers.constant(0.01)
SCALER = 0.1


def _gn(dim: int, name: str):
    return nn.GroupNorm(num_groups=min(32, dim), epsilon=1e-5, dtype=jnp.float32, name=name)


class SharedRefinementBlock(nn.Module):
    """Wavelength-agnostic residual conv block (170-205)."""

    embed_dim: int
    expansion: int = 2
    kernel_size: int = 3
    use_residual: bool = True
    policy: Policy = FULL_PRECISION

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.policy
        hid = self.embed_dim * self.expansion
        pad = self.kernel_size // 2
        conv = lambda f, name: nn.Conv(  # noqa: E731
            f, (self.kernel_size, self.kernel_size), padding=((pad, pad), (pad, pad)),
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
            precision=p.precision, name=name,
        )
        h = conv(hid, "conv1")(p.cast_to_compute(x))
        h = jax.nn.silu(_gn(hid, "norm1")(h)).astype(p.compute_dtype)
        h = conv(self.embed_dim, "conv2")(h)
        h = _gn(self.embed_dim, "norm2")(h).astype(p.compute_dtype)
        if self.use_residual:
            h = h + x.astype(h.dtype)
        return jax.nn.silu(h)


class WavelengthAdaptiveWeightGenerator(nn.Module):
    """Factorized spatial⊗channel weight generator (208-322): deep wave
    processor → pre-norm cross-wavelength transformer with 64 learned
    tokens → outer-product of a K·K spatial pattern and an in_channels
    mixing vector per wavelength."""

    wv_planes: int
    in_channels: int
    kernel_size: int = 3
    num_heads: int = 4
    num_layers: int = 2
    wt_num: int = 64

    @nn.compact
    def __call__(self, waves: jax.Array) -> tuple[jax.Array, jax.Array]:
        from eovax.nn.transformer import TransformerEncoder

        d = dict(dtype=jnp.float32, kernel_init=_XAVIER,
                 bias_init=nn.initializers.zeros,
                 precision=jax.lax.Precision.HIGHEST)
        h = nn.Dense(self.wv_planes * 2, name="wp_0", **d)(waves)
        h = nn.LayerNorm(name="wp_ln1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.wv_planes, name="wp_3", **d)(h)
        h = nn.LayerNorm(name="wp_ln2")(h)

        tokens = self.param(
            "weight_tokens", nn.initializers.normal(0.02),
            (self.wt_num, self.wv_planes), jnp.float32,
        )
        seq = jnp.concatenate([tokens, h], axis=0)
        out = TransformerEncoder(
            d_model=self.wv_planes, nhead=self.num_heads,
            num_layers=self.num_layers, dim_feedforward=self.wv_planes * 4,
            norm_first=True, dropout_rate=0.1, name="transformer",
            # dropout engages iff the caller supplies a "dropout" RNG
            # (train steps); matches the torch train/eval mode switch.
        )(seq, deterministic=not self.has_rng("dropout"))
        feats = out[self.wt_num :]

        spatial = nn.Dense(self.wv_planes, name="spatial_0", **d)(feats)
        spatial = nn.Dense(
            self.kernel_size**2, name="spatial_2", **d
        )(jax.nn.gelu(spatial, approximate=False))
        channel = nn.Dense(self.wv_planes, name="channel_0", **d)(feats)
        channel = nn.Dense(
            self.in_channels, name="channel_2", **d
        )(jax.nn.gelu(channel, approximate=False))
        weights = jnp.einsum("ns,nc->nsc", spatial, channel).reshape(feats.shape[0], -1)
        biases = nn.Dense(1, name="bias_head", **d)(feats)
        return weights, biases


class _DecoderHeadBase(nn.Module):
    """Common: wavelength features + final projection + distillation API."""

    wv_planes: int = 128
    embed_dim: int = 128
    kernel_size: int = 3
    num_heads: int = 4
    num_layers: int = 2
    policy: Policy = FULL_PRECISION

    def _final_projection(self, waves: jax.Array, wvs: jax.Array):
        """(kernel [K,K,E,N], bias [N]) ·0.1 from the final generator."""
        weight, bias = self.final_generator(waves)
        n = wvs.shape[0]
        k = self.kernel_size
        kernel = weight.reshape(n, k, k, self.embed_dim).transpose(1, 2, 3, 0)
        return kernel * SCALER, bias.reshape(n) * SCALER

    def _waves(self, wvs: jax.Array) -> jax.Array:
        return self.wave_encoder(sincos_wavelength_embed(self.wv_planes, wvs * 1000.0))

    def get_distillation_weight(self, wvs_microns: jax.Array):
        waves = self._waves(wvs_microns)
        kernel, bias = self._final_projection(waves, wvs_microns)
        return kernel.transpose(3, 2, 0, 1), bias  # torch [N, E, K, K]


class MultiStageDynamicDecoder(_DecoderHeadBase):
    """Shared refinement → FiLM → wavelength projection (324-539)."""

    num_shared_blocks: int = 2
    expansion: int = 2
    use_enhanced_generator: bool = True

    def setup(self):
        self.shared_blocks = [
            SharedRefinementBlock(
                embed_dim=self.embed_dim, expansion=self.expansion,
                kernel_size=self.kernel_size, policy=self.policy,
                name=f"shared_{i}",
            )
            for i in range(self.num_shared_blocks)
        ]
        d = dict(dtype=jnp.float32, kernel_init=_XAVIER, bias_init=_B001)
        self.film_0 = nn.Dense(self.wv_planes * 2, **d)
        self.film_2 = nn.Dense(self.embed_dim * 2, **d)
        pad = self.kernel_size // 2
        self.mid_conv = nn.Conv(
            self.embed_dim, (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)), dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype, precision=self.policy.precision,
        )
        self.mid_norm = nn.GroupNorm(num_groups=min(32, self.embed_dim),
                                     epsilon=1e-5, dtype=jnp.float32)
        if self.use_enhanced_generator:
            self.final_generator = WavelengthAdaptiveWeightGenerator(
                wv_planes=self.wv_planes, in_channels=self.embed_dim,
                kernel_size=self.kernel_size, num_heads=self.num_heads,
                num_layers=self.num_layers,
            )
        else:
            self.final_generator = TransformerWeightGenerator(
                input_dim=self.wv_planes,
                output_dim=self.kernel_size**2 * self.embed_dim,
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                num_layers=self.num_layers, variant="decoder",
            )
        self.wave_encoder = FCResLayer(self.wv_planes)

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        waves = self._waves(wvs)
        for block in self.shared_blocks:
            x = block(x)
        # FiLM on the mean wavelength (431-459).
        mean_wave = waves.mean(axis=0)
        film = self.film_2(jax.nn.gelu(self.film_0(mean_wave), approximate=False))
        gamma, beta = jnp.split(film, 2)
        x = self.mid_conv(self.policy.cast_to_compute(x))
        x = self.mid_norm(x)
        x = x * (1.0 + gamma) + beta
        x = jax.nn.silu(x).astype(self.policy.compute_dtype)
        kernel, bias = self._final_projection(waves, wvs)
        return apply_dynamic_kernel(
            x, kernel, bias, padding=self.kernel_size // 2, policy=self.policy
        )


class StackedDynamicDecoder(_DecoderHeadBase):
    """Stacked depthwise dynamic convs + final projection (825-1041)."""

    num_stack_layers: int = 3
    generator_layers: int = 1

    def setup(self):
        self.wave_encoder = FCResLayer(self.wv_planes)
        self.inter_gens = [
            TransformerWeightGenerator(
                input_dim=self.wv_planes,
                output_dim=self.kernel_size**2 * self.embed_dim,
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                num_layers=self.generator_layers, variant="decoder",
                name=f"inter_gen_{i}",
            )
            for i in range(self.num_stack_layers - 1)
        ]
        self.inter_norms = [
            nn.GroupNorm(num_groups=min(32, self.embed_dim), epsilon=1e-5,
                         dtype=jnp.float32, name=f"inter_norm_{i}")
            for i in range(self.num_stack_layers - 1)
        ]
        self.final_generator = TransformerWeightGenerator(
            input_dim=self.wv_planes,
            output_dim=self.kernel_size**2 * self.embed_dim,
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            num_layers=self.generator_layers, variant="decoder",
        )

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        p = self.policy
        waves = self._waves(wvs)
        mean_wave = waves.mean(axis=0, keepdims=True)
        k = self.kernel_size
        pad = k // 2
        for gen, norm in zip(self.inter_gens, self.inter_norms):
            residual = x
            weight, _ = gen(mean_wave)  # [1, K*K*E]
            # Depthwise kernel [K, K, 1, E] (groups = embed_dim, 926-965).
            w = weight.reshape(1, k, k, self.embed_dim).transpose(1, 2, 0, 3)
            y = jax.lax.conv_general_dilated(
                p.cast_to_compute(x), p.cast_to_compute(w * SCALER),
                (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.embed_dim,
                precision=p.precision,
                preferred_element_type=p.compute_dtype,
            )
            y = norm(y).astype(p.compute_dtype)
            x = jax.nn.silu(y + residual.astype(y.dtype))
        kernel, bias = self._final_projection(waves, wvs)
        return apply_dynamic_kernel(x, kernel, bias, padding=pad, policy=p)


class ProgressiveMultiStageDynamicDecoder(_DecoderHeadBase):
    """Shared pre-conv → progressive stages → output projection (541-703)."""

    num_stages: int = 3

    def setup(self):
        pad = self.kernel_size // 2
        p = self.policy
        conv_kw = dict(
            dtype=p.compute_dtype, param_dtype=p.param_dtype, precision=p.precision,
            padding=((1, 1), (1, 1)),
        )
        self.pre_conv_0 = nn.Conv(self.embed_dim, (3, 3), **conv_kw)
        self.pre_norm_0 = nn.GroupNorm(num_groups=min(32, self.embed_dim),
                                       epsilon=1e-5, dtype=jnp.float32)
        self.pre_conv_1 = nn.Conv(self.embed_dim, (3, 3), **conv_kw)
        self.pre_norm_1 = nn.GroupNorm(num_groups=min(32, self.embed_dim),
                                       epsilon=1e-5, dtype=jnp.float32)
        self.wave_fc_0 = FCResLayer(self.wv_planes)
        self.wave_fc_1 = FCResLayer(self.wv_planes)
        self.stage_blocks = [
            SharedRefinementBlock(
                embed_dim=self.embed_dim, kernel_size=self.kernel_size,
                policy=p, name=f"stage_{i}",
            )
            for i in range(self.num_stages - 1)
        ]
        self.final_generator = TransformerWeightGenerator(
            input_dim=self.wv_planes,
            output_dim=self.kernel_size**2 * self.embed_dim,
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            num_layers=self.num_layers, variant="decoder",
        )

    @property
    def wave_encoder(self):
        return lambda e: self.wave_fc_1(self.wave_fc_0(e))

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        p = self.policy
        waves = self._waves(wvs)
        h = self.pre_conv_0(p.cast_to_compute(x))
        h = jax.nn.silu(self.pre_norm_0(h)).astype(p.compute_dtype)
        h = self.pre_conv_1(h)
        h = jax.nn.silu(self.pre_norm_1(h)).astype(p.compute_dtype)
        for stage in self.stage_blocks:
            h = stage(h)
        kernel, bias = self._final_projection(waves, wvs)
        return apply_dynamic_kernel(
            h, kernel, bias, padding=self.kernel_size // 2, policy=p
        )
