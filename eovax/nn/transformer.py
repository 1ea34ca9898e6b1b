"""Transformer encoder with PyTorch-compatible semantics.

The reference's hypernetwork weight generators run wavelength tokens through
``torch.nn.TransformerEncoderLayer`` (post-norm, erf-GELU, 4 heads —
/root/reference/eo_vae/models/modules/dynamic_conv.py:86-96). Checkpoint
fidelity requires matching those semantics exactly: packed qkv projection,
post-norm residual order, erf GELU, LayerNorm eps 1e-5.

These sequences are tiny (≤142 tokens), so this is *not* a hot path — the
generated conv kernels feed the hot path. Everything here runs in fp32.

Init parity: the reference re-initializes every ``nn.Linear`` inside the
generators with xavier-uniform weights and bias=0.01 (dynamic_conv.py:443-457)
— that covers linear1/linear2 and attention out_proj, but NOT the packed
``in_proj_weight`` (a raw Parameter, which keeps torch MHA's default
xavier-uniform with zero bias). ``dense_init``/``bias_init`` expose the
former; in_proj is fixed at xavier/zeros.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

Initializer = Callable[..., jax.Array]


class MultiheadSelfAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention (packed qkv).

    Parameter layout mirrors torch: ``in_proj`` is one Dense producing
    [q; k; v] stacked on the output axis, ``out_proj`` the output Dense.
    """

    embed_dim: int
    num_heads: int
    out_proj_kernel_init: Initializer = nn.initializers.xavier_uniform()
    out_proj_bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [S, E] (unbatched sequence, as used by the weight generators)
        seq, e = x.shape
        assert e == self.embed_dim
        head_dim = self.embed_dim // self.num_heads

        qkv = nn.Dense(
            3 * self.embed_dim,
            name="in_proj",
            dtype=jnp.float32,
            precision=_HI,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [S, E] -> [H, S, hd]
            return t.reshape(seq, self.num_heads, head_dim).transpose(1, 0, 2)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        logits = jnp.einsum("hsd,htd->hst", q, k, precision=_HI) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hst,htd->hsd", probs, v, precision=_HI)
        out = out.transpose(1, 0, 2).reshape(seq, self.embed_dim)
        return nn.Dense(
            self.embed_dim,
            name="out_proj",
            dtype=jnp.float32,
            precision=_HI,
            kernel_init=self.out_proj_kernel_init,
            bias_init=self.out_proj_bias_init,
        )(out)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer parity (gelu activation).

    ``norm_first=False`` (post-norm) is the reference's encoder-generator
    configuration; ``norm_first=True`` (pre-norm) is used by the factorized
    generators (dynamic_conv.py:203-211).
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    norm_first: bool = False
    dropout_rate: float = 0.0
    dense_init: Initializer = nn.initializers.xavier_uniform()
    bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        attn = MultiheadSelfAttention(
            self.d_model,
            self.nhead,
            out_proj_kernel_init=self.dense_init,
            out_proj_bias_init=self.bias_init,
            name="self_attn",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        lin1 = nn.Dense(
            self.dim_feedforward,
            name="linear1",
            dtype=jnp.float32,
            precision=_HI,
            kernel_init=self.dense_init,
            bias_init=self.bias_init,
        )
        lin2 = nn.Dense(
            self.d_model,
            name="linear2",
            dtype=jnp.float32,
            precision=_HI,
            kernel_init=self.dense_init,
            bias_init=self.bias_init,
        )
        drop = lambda t: nn.Dropout(self.dropout_rate, deterministic=deterministic)(t)  # noqa: E731

        def ff(t):
            # torch default GELU is exact (erf), not tanh-approximated.
            return lin2(drop(jax.nn.gelu(lin1(t), approximate=False)))

        if self.norm_first:
            x = x + drop(attn(norm1(x)))
            x = x + ff(norm2(x))
        else:
            x = norm1(x + drop(attn(x)))
            x = norm2(x + ff(x))
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (no final norm, matching torch default)."""

    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 2048
    norm_first: bool = False
    dropout_rate: float = 0.0
    dense_init: Initializer = nn.initializers.xavier_uniform()
    bias_init: Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                norm_first=self.norm_first,
                dropout_rate=self.dropout_rate,
                dense_init=self.dense_init,
                bias_init=self.bias_init,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
        return x
