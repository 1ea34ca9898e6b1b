"""Timestep / positional embedding modules (reference orphan module).

JAX re-design of /root/reference/eo_vae/models/modules/embeddings.py
(312 LoC, vendored diffusers/Meta UViT utilities). The reference file is
unimportable upstream — it imports a `.uvit_torch_utils` module that does
not exist (embeddings.py:13) and nothing references it — but its working
pieces are rebuilt here so the capability surface is complete:

- ``get_timestep_embedding`` / ``Timesteps``: diffusers-style DDPM
  sinusoidal timestep embedding (embeddings.py:20-98) with the
  `flip_sin_to_cos`, `downscale_freq_shift`, `scale`, odd-dim zero-pad
  semantics intact. (The in-repo SR UNet uses its own simpler embedding,
  eovax/models/unet.py:27 — this one matches diffusers checkpoints.)
- ``TimestepEmbedding``: Linear→act→Linear MLP with optional bias-free
  conditioning projection and post-activation (embeddings.py:101-153).
- ``RelativePositionBias``: Swin-style learnable relative position bias
  over a 2D window, with extrapolation to larger grids by −1e7 padding of
  the bias table (embeddings.py:155-247).
- ``LearnedPositionalEmbedding``: zero-mean σ=0.02 learned additive
  positional table, with the [C,H,W] → [(H·W),C] flatten-compat rearrange
  (embeddings.py:296-311).

``RelativeBiasAttentionWrapper`` (embeddings.py:250-293) wraps a diffusers
``Attention`` processor object and is not portable without diffusers'
class hierarchy; add the returned bias to attention logits directly
(`logits + RelativePositionBias(...)((B, H, W))`) instead.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
}


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10_000,
) -> jax.Array:
    """DDPM sinusoidal timestep embedding, diffusers semantics
    (embeddings.py:20-72): [N] → [N, embedding_dim]."""
    if timesteps.ndim != 1:
        raise ValueError("Timesteps should be a 1d-array")
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Timesteps(nn.Module):
    """Stateless wrapper module (embeddings.py:75-98)."""

    num_channels: int
    flip_sin_to_cos: bool = False
    downscale_freq_shift: float = 1.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        return get_timestep_embedding(
            timesteps,
            self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
            scale=self.scale,
        )


class TimestepEmbedding(nn.Module):
    """Linear→act→Linear time-embedding MLP (embeddings.py:101-153)."""

    time_embed_dim: int
    act_fn: str = "silu"
    out_dim: int | None = None
    post_act_fn: str | None = None
    cond_proj_dim: int | None = None
    sample_proj_bias: bool = True

    @nn.compact
    def __call__(self, sample: jax.Array, condition: jax.Array | None = None) -> jax.Array:
        if condition is not None:
            if self.cond_proj_dim is None:
                raise ValueError("condition given but cond_proj_dim is None")
            sample = sample + nn.Dense(
                sample.shape[-1], use_bias=False, name="cond_proj"
            )(condition)
        h = nn.Dense(self.time_embed_dim, use_bias=self.sample_proj_bias, name="linear_1")(sample)
        h = _ACTIVATIONS[self.act_fn](h)
        h = nn.Dense(
            self.out_dim or self.time_embed_dim,
            use_bias=self.sample_proj_bias,
            name="linear_2",
        )(h)
        if self.post_act_fn is not None:
            h = _ACTIVATIONS[self.post_act_fn](h)
        return h


def _relative_position_index(h: int, w: int) -> np.ndarray:
    """Static Swin-style index map [(H·W), (H·W)] into a flattened
    (2H−1)·(2W−1) bias table (embeddings.py:181-201). Computed host-side
    in numpy — it is a compile-time constant per grid shape."""
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, HW)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, HW, HW)
    rel = rel.transpose(1, 2, 0).copy()  # (HW, HW, 2)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # (HW, HW)


class RelativePositionBias(nn.Module):
    """Learnable 2D relative position bias (embeddings.py:155-247).

    Call with a grid shape ``(B, H, W)``; returns ``[B·num_heads, HW, HW]``
    ready to add to attention logits. Grids larger than ``window_size``
    extrapolate by padding the table with −1e7 (≈ −inf after softmax),
    matching the reference (embeddings.py:203-221).
    """

    window_size: tuple[int, int] | int
    num_heads: int

    @nn.compact
    def __call__(self, grid_shape: tuple[int, int, int]) -> jax.Array:
        ws = self.window_size
        win = (ws, ws) if isinstance(ws, int) else tuple(ws)
        b, h, w = grid_shape
        table = self.param(
            "relative_bias_table",
            nn.initializers.zeros,
            (2 * win[0] - 1, 2 * win[1] - 1, self.num_heads),
        )
        if h < win[0] or w < win[1]:
            raise NotImplementedError("grid smaller than window: not supported")
        pad_h, pad_w = h - win[0], w - win[1]
        table = jnp.pad(
            table,
            ((pad_h, pad_h), (pad_w, pad_w), (0, 0)),
            constant_values=-(10.0**7),
        )  # (2H−1, 2W−1, heads)
        idx = _relative_position_index(h, w)  # (HW, HW) numpy constant
        bias = table.reshape(-1, self.num_heads)[idx.reshape(-1)]
        bias = bias.reshape(h * w, h * w, self.num_heads)
        bias = jnp.transpose(bias, (2, 0, 1))  # (heads, HW, HW)
        return jnp.tile(bias, (b, 1, 1))  # (B·heads, HW, HW)


class LearnedPositionalEmbedding(nn.Module):
    """Additive learned positional table, N(0, 0.02) init
    (embeddings.py:296-311)."""

    embeds_shape: tuple[int, ...]

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        embeds = self.param(
            "embeds",
            nn.initializers.normal(stddev=0.02),
            tuple(self.embeds_shape),
        )
        if embeds.ndim == 3 and hidden_states.ndim - 1 == 2:
            c, h, w = embeds.shape
            embeds = embeds.reshape(c, h * w).T  # C H W → (H·W) C
        if hidden_states.shape[1:] != embeds.shape:
            raise ValueError(
                f"positional table {embeds.shape} does not match hidden "
                f"states {hidden_states.shape[1:]}"
            )
        return hidden_states + embeds[None].astype(hidden_states.dtype)
