"""Conditional diffusion UNet (NHWC) for latent super-resolution.

In-repo replacement for the external ``azula.nn.unet.UNet`` the reference
instantiates via config (`configs_superres/eo_vae_latent.yaml:35-42`:
in=out=32, cond=32, hid_channels=[256,128,64], hid_blocks=[3,3,3],
spatial=2). The reference treats azula as a closed box (SURVEY.md §7 hard
part #7), so this is an original design with the same interface contract:
``unet(x_t, t, cond) → prediction`` with per-level widths/blocks from
config.

Structure: cond is channel-concatenated to x_t; sinusoidal time embedding →
SiLU MLP modulates every residual block (scale/shift after the second
norm); symmetric encoder/decoder with skip connections and stride-2
down / nearest-up transitions; self-attention at the innermost level.
All convs NHWC on the MXU; GroupNorm in fp32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.precision import FULL_PRECISION, Policy
from eovax.nn.blocks import policy_conv3x3


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10_000.0) -> jax.Array:
    """Sinusoidal embedding of continuous t ∈ [0, 1] (scaled by 1000)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32).reshape(-1, 1) * 1000.0 * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _TimeResBlock(nn.Module):
    out_ch: int
    policy: Policy

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        p = self.policy
        groups = min(32, self.out_ch)
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         dtype=p.norm_dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = policy_conv3x3(self, p.cast_to_compute(h), self.out_ch, "conv1", p)

        # FiLM-style time modulation.
        scale_shift = nn.Dense(2 * self.out_ch, dtype=jnp.float32, name="temb_proj")(
            jax.nn.silu(temb)
        )
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-6,
                         dtype=p.norm_dtype, name="norm2")(h)
        h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        h = jax.nn.silu(h)
        h = policy_conv3x3(
            self, p.cast_to_compute(h), self.out_ch, "conv2", p,
            kernel_init=nn.initializers.zeros,
        )
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=p.compute_dtype,
                        param_dtype=p.param_dtype, precision=p.precision,
                        name="skip")(p.cast_to_compute(x))
        return x.astype(h.dtype) + h


class _SelfAttention(nn.Module):
    channels: int
    policy: Policy

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.policy
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6,
                         dtype=p.norm_dtype, name="norm")(x)
        qkv = nn.Conv(3 * c, (1, 1), dtype=p.compute_dtype,
                      param_dtype=p.param_dtype, precision=p.precision,
                      name="qkv")(p.cast_to_compute(y))
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=p.norm_dtype,
                            precision=p.precision) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v, precision=p.precision)
        out = nn.Conv(c, (1, 1), dtype=p.compute_dtype,
                      param_dtype=p.param_dtype, precision=p.precision,
                      kernel_init=nn.initializers.zeros,
                      name="proj")(out.reshape(b, h, w, c))
        return x.astype(out.dtype) + out


class UNet(nn.Module):
    """Conditional UNet: (x_t [B,H,W,Cin], t [B], cond [B,H,W,Ccond]) → [B,H,W,Cout].

    The forward is split into ``encode_path`` (conv_in + down blocks +
    bottleneck) and ``decode_path`` (up blocks + head) so samplers can
    cache the encoder features across adjacent timesteps ("encoder
    propagation", Li et al., arXiv:2312.09608 — see
    eovax.models.sr_diffusion.CachedDDIMSampler).
    """

    in_channels: int = 32
    out_channels: int = 32
    cond_channels: int = 0
    hid_channels: tuple[int, ...] = (256, 128, 64)
    hid_blocks: tuple[int, ...] = (3, 3, 3)
    attention_at_bottom: bool = True
    policy: Policy = FULL_PRECISION

    def setup(self):
        p = self.policy
        ch = self.hid_channels
        temb_dim = ch[0] * 4
        self.temb_0 = nn.Dense(temb_dim, dtype=jnp.float32)
        self.temb_2 = nn.Dense(temb_dim, dtype=jnp.float32)
        conv_kw = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype,
                       precision=p.precision)
        self.conv_in = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), **conv_kw)

        levels = len(ch)
        down_blocks, downsamples = {}, {}
        for i in range(levels):
            for j in range(self.hid_blocks[i]):
                down_blocks[(i, j)] = _TimeResBlock(
                    ch[i], p, name=f"down_{i}_block_{j}"
                )
            if i != levels - 1:
                downsamples[i] = nn.Conv(
                    ch[i + 1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name=f"down_{i}_downsample", **conv_kw,
                )
        self._down_blocks = down_blocks
        self._downsamples = downsamples

        self.mid_block_1 = _TimeResBlock(ch[-1], p)
        if self.attention_at_bottom:
            self.mid_attn = _SelfAttention(ch[-1], p)
        self.mid_block_2 = _TimeResBlock(ch[-1], p)

        up_blocks, upsamples = {}, {}
        for i in reversed(range(levels)):
            for j in range(self.hid_blocks[i] + 1):
                up_blocks[(i, j)] = _TimeResBlock(ch[i], p, name=f"up_{i}_block_{j}")
            if i != 0:
                upsamples[i] = nn.Conv(
                    ch[i - 1], (3, 3), padding=((1, 1), (1, 1)),
                    name=f"up_{i}_upsample", **conv_kw,
                )
        self._up_blocks = up_blocks
        self._upsamples = upsamples

        self.norm_out = nn.GroupNorm(
            num_groups=min(32, ch[0]), epsilon=1e-6, dtype=p.norm_dtype
        )
        self.conv_out = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros, **conv_kw,
        )

    def _temb(self, t: jax.Array) -> jax.Array:
        temb = timestep_embedding(t, self.hid_channels[0])
        return self.temb_2(jax.nn.silu(self.temb_0(temb)))

    def encode_path(
        self, x: jax.Array, t: jax.Array, cond: jax.Array | None = None
    ) -> tuple[jax.Array, tuple[jax.Array, ...]]:
        """conv_in → down blocks → bottleneck. Returns (h_mid, skips)."""
        p = self.policy
        temb = self._temb(t)
        if cond is not None:
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        h = self.conv_in(p.cast_to_compute(x))

        skips = [h]
        levels = len(self.hid_channels)
        for i in range(levels):
            for j in range(self.hid_blocks[i]):
                h = self._down_blocks[(i, j)](h, temb)
                skips.append(h)
            if i != levels - 1:
                h = self._downsamples[i](h)
                skips.append(h)

        h = self.mid_block_1(h, temb)
        if self.attention_at_bottom:
            h = self.mid_attn(h)
        h = self.mid_block_2(h, temb)
        return h, tuple(skips)

    def decode_path(
        self, h: jax.Array, skips: tuple[jax.Array, ...], t: jax.Array
    ) -> jax.Array:
        """Up blocks + output head consuming the skip pyramid."""
        temb = self._temb(t)
        skips = list(skips)
        levels = len(self.hid_channels)
        for i in reversed(range(levels)):
            # blocks+1 skips per level: the extra one is the previous level's
            # downsample output (or the conv_in stem at the top level).
            for j in range(self.hid_blocks[i] + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = self._up_blocks[(i, j)](h, temb)
            if i != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = self._upsamples[i](h)

        h = self.norm_out(h)
        h = jax.nn.silu(h)
        return self.conv_out(self.policy.cast_to_compute(h))

    def __call__(
        self, x: jax.Array, t: jax.Array, cond: jax.Array | None = None
    ) -> jax.Array:
        h, skips = self.encode_path(x, t, cond)
        return self.decode_path(h, skips, t)
