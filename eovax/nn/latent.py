"""Latent patch shuffle + BatchNorm normalizer (NHWC, functional state).

The reference packs the [B,32,H/8,W/8] latent into [B,128,H/16,W/16] with a
2×2 patch shuffle and normalizes it with an affine-free BatchNorm2d whose
running stats are part of the public checkpoint contract
(/root/reference/eo_vae/models/new_autoencoder.py:123-129, 533-543).

Parity notes:
- Packed channel order is (c, pi, pj) — index = c*4 + pi*2 + pj — matching
  the reference's einops pattern (new_autoencoder.py:466-468). Our NHWC
  shuffle produces the identical packed index so torch BN stats transfer 1:1.
- Asymmetric epsilons replicated: the BN itself uses torch's default
  eps=1e-5 for forward normalization, while the *inverse* transform uses
  bn_eps=1e-4 (new_autoencoder.py:124 vs the BatchNorm2d default) — a
  reference quirk we keep for checkpoint fidelity.
- torch updates running_var with the **unbiased** batch variance but
  normalizes with the biased one; replicated here (flax BatchNorm does not
  do this, hence the custom module).
- Under a data-parallel mesh the batch statistics computed inside jit are
  global (XLA inserts the cross-replica reduction automatically), i.e.
  sync-BN semantics. The reference's single-device runs see exactly the
  full-batch statistics, so this is the faithful equivalent.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def patch_shuffle(z: jax.Array, ps: tuple[int, int] = (2, 2)) -> jax.Array:
    """[B, H, W, C] → [B, H/pi, W/pj, C*pi*pj] with (c, pi, pj) channel order."""
    b, h, w, c = z.shape
    pi, pj = ps
    z = z.reshape(b, h // pi, pi, w // pj, pj, c)
    # → [B, i, j, c, pi, pj] then flatten last three (c slowest — torch parity)
    z = z.transpose(0, 1, 3, 5, 2, 4)  # b, i, j, c, pi, pj
    return z.reshape(b, h // pi, w // pj, c * pi * pj)


def patch_unshuffle(z: jax.Array, ps: tuple[int, int] = (2, 2)) -> jax.Array:
    """Inverse of :func:`patch_shuffle`."""
    b, i, j, cp = z.shape
    pi, pj = ps
    c = cp // (pi * pj)
    z = z.reshape(b, i, j, c, pi, pj)
    z = z.transpose(0, 1, 4, 2, 5, 3)  # b, i, pi, j, pj, c
    return z.reshape(b, i * pi, j * pj, c)


class LatentBatchNorm(nn.Module):
    """Affine-free BatchNorm over packed latent channels with explicit state.

    State lives in the ``batch_stats`` collection as ``mean``/``var`` (the
    torch ``running_mean``/``running_var``). ``var`` stores the unbiased
    batch variance during training updates, exactly like torch.
    """

    num_features: int
    eps: float = 1e-5  # torch BatchNorm2d default — forward normalization
    inv_eps: float = 1e-4  # reference bn_eps — inverse transform only
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x: jax.Array, *, use_running_average: bool) -> jax.Array:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.num_features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.num_features, jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))  # all but channel
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased — used to normalize
            n = xf.size // xf.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return y.astype(x.dtype)

    def inverse(self, z: jax.Array) -> jax.Array:
        """De-normalize with running stats: z*sqrt(var+1e-4)+mean
        (new_autoencoder.py:538-543)."""
        mean = self.get_variable("batch_stats", "mean")
        var = self.get_variable("batch_stats", "var")
        zf = z.astype(jnp.float32)
        y = zf * jnp.sqrt(var + self.inv_eps) + mean
        return y.astype(z.dtype)
