"""Shared-basis dynamic stems — alternative hypernetwork design.

Re-design of /root/reference/eo_vae/models/modules/dynamic_basis.py:28-217
(one of the paper's explored stem variants, SURVEY.md §2.1 "orphan"
modules — ported as a capability flag): a GLOBAL bank of K×K basis kernels
modulated by per-channel coefficients from a deep MLP hypernetwork. Both
layers expose ``get_distillation_weight`` so they are drop-in compatible
with the stage-1 distillation loop.

NHWC; the basis reconstruction is a tiny einsum, the conv rides the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.precision import FULL_PRECISION, Policy
from eovax.nn.dynamic_conv import apply_dynamic_kernel, sincos_wavelength_embed

_XAVIER = nn.initializers.xavier_uniform()


def _torch_kaiming_uniform_basis(key, shape, dtype):
    """torch init.kaiming_uniform_(a=sqrt(5)) on a [num_bases, 1, K, K]
    bank (ref dynamic_basis.py:82-85): fan_in = 1*K*K, so
    bound = sqrt(1/3)*sqrt(3/fan_in) = 1/K. Flax variance_scaling would
    treat the leading num_bases dim as receptive field (fan_in = K*num_bases),
    shrinking the init ~sqrt(num_bases/K)x vs the reference."""
    bound = 1.0 / shape[-1]
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ScalableHyperNet(nn.Module):
    """Deep MLP hypernetwork with a low-rank expansion head
    (dynamic_basis.py:28-58): xavier weights, zero biases, expansion head
    initialized N(0, 0.001) to start near the mean basis."""

    in_dim: int
    rank_dim: int
    out_dim: int
    depth: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kw = dict(dtype=jnp.float32, kernel_init=_XAVIER,
                  bias_init=nn.initializers.zeros,
                  precision=jax.lax.Precision.HIGHEST)
        h = jax.nn.gelu(nn.Dense(self.in_dim * 2, name="backbone_0", **kw)(x),
                        approximate=False)
        for i in range(self.depth):
            h = jax.nn.gelu(
                nn.Dense(self.in_dim * 2, name=f"backbone_{i + 1}", **kw)(h),
                approximate=False,
            )
        h = nn.Dense(self.rank_dim, name="backbone_out", **kw)(h)
        return nn.Dense(
            self.out_dim, name="expansion", dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=0.001),
            bias_init=nn.initializers.zeros,
            precision=jax.lax.Precision.HIGHEST,
        )(h)


class _SharedBasisBase(nn.Module):
    num_bases: int = 64
    rank_dim: int = 64
    kernel_size: int = 3
    wv_dim: int = 128
    policy: Policy = FULL_PRECISION

    def _embed(self, wvs: jax.Array) -> jax.Array:
        emb = sincos_wavelength_embed(self.wv_dim, wvs * 1000.0)
        return self.wv_proj(emb)

    def _basis(self):
        # [num_bases, K, K] (the torch singleton dim dropped).
        return self.basis_bank


class DynamicInputLayer(_SharedBasisBase):
    """N variable bands → fixed channels via shared-basis modulation
    (dynamic_basis.py:60-137)."""

    out_channels: int = 128

    def setup(self):
        k = self.kernel_size
        self.basis_bank = self.param(
            "basis_bank", _torch_kaiming_uniform_basis,
            (self.num_bases, k, k), jnp.float32,
        )
        self.hypernet = ScalableHyperNet(
            in_dim=self.wv_dim, rank_dim=self.rank_dim,
            out_dim=self.out_channels * self.num_bases,
        )
        self.wv_proj = nn.Dense(self.wv_dim, dtype=jnp.float32)
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
        )

    def generate(self, wvs: jax.Array):
        """(kernel [K,K,N,out], bias [out])."""
        emb = self._embed(wvs)
        coeffs = self.hypernet(emb).reshape(-1, self.out_channels, self.num_bases)
        # [N,out,K,K] = Σ_b coeffs[n,o,b] · basis[b]
        w = jnp.einsum("nob,bxy->noxy", coeffs, self._basis())
        return w.transpose(2, 3, 0, 1), self.bias  # HWIO

    def get_distillation_weight(self, wvs: jax.Array):
        """Torch layout [out, N, K, K] + bias (dynamic_basis.py:97-120)."""
        kernel, bias = self.generate(wvs)
        return kernel.transpose(3, 2, 0, 1), bias

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        kernel, bias = self.generate(wvs)
        return apply_dynamic_kernel(
            x, kernel, bias, padding=self.kernel_size // 2, policy=self.policy
        )


class DynamicOutputLayer(_SharedBasisBase):
    """Fixed channels → N variable bands, with a generated per-band bias
    (dynamic_basis.py:139-217)."""

    in_channels: int = 128

    def setup(self):
        k = self.kernel_size
        self.basis_bank = self.param(
            "basis_bank", _torch_kaiming_uniform_basis,
            (self.num_bases, k, k), jnp.float32,
        )
        self.hypernet = ScalableHyperNet(
            in_dim=self.wv_dim, rank_dim=self.rank_dim,
            out_dim=self.in_channels * self.num_bases,
        )
        self.wv_proj = nn.Dense(self.wv_dim, dtype=jnp.float32)
        self.bias_generator_0 = nn.Dense(32, dtype=jnp.float32)
        self.bias_generator_2 = nn.Dense(1, dtype=jnp.float32)

    def generate(self, wvs: jax.Array):
        """(kernel [K,K,in,N], bias [N])."""
        emb = self._embed(wvs)
        coeffs = self.hypernet(emb).reshape(-1, self.in_channels, self.num_bases)
        w = jnp.einsum("nib,bxy->nixy", coeffs, self._basis())  # [N,in,K,K]
        bias = self.bias_generator_2(
            jax.nn.relu(self.bias_generator_0(emb))
        ).reshape(-1)
        return w.transpose(2, 3, 1, 0), bias  # HWIO

    def get_distillation_weight(self, wvs: jax.Array):
        """Torch layout [N, in, K, K] + bias (dynamic_basis.py:181-198)."""
        kernel, bias = self.generate(wvs)
        return kernel.transpose(3, 2, 0, 1), bias

    def __call__(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        kernel, bias = self.generate(wvs)
        return apply_dynamic_kernel(
            x, kernel, bias, padding=self.kernel_size // 2, policy=self.policy
        )
