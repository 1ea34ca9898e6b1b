"""Diagonal Gaussian VAE posterior (functional, NHWC).

Re-design of /root/reference/eo_vae/models/modules/distributions.py:19-150.
Moments are split on the **last** (channel) axis — the NHWC equivalent of the
reference's dim=1 chunk — and logvar is clamped to [-30, 20]
(distributions.py:29). Sampling takes an explicit JAX PRNG key.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    """Diagonal Gaussian with NHWC mean/logvar tensors."""

    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, moments: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean=mean, logvar=jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jax.Array:
        """KL to N(0,1) (or to `other`), summed over all non-batch axes."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Elementwise KL between two Gaussians (distributions.py:113-150)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )
