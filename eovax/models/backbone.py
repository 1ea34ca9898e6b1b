"""Flux-derived VAE encoder/decoder backbone (NHWC flax modules).

Re-design of /root/reference/eo_vae/models/model.py (Encoder 67-220,
Decoder 223-376) and the latent plumbing of new_autoencoder.py. The module
tree is named so torch checkpoint keys map 1:1 (see
eovax.utils.torch_convert): ``down.0.block.1`` ↔ ``down_0_block_1`` etc.

Shipped architecture (configs/eo-vae.yaml:33-57): ch=128, ch_mult=(1,2,4,4),
num_res_blocks=2, z_channels=32 → 3 downsamples, 256² → [B,32,32,32] latent
(NHWC: [B,32,32,32] too — square), ~95.5M params total.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig
from eovax.core.precision import FULL_PRECISION, Policy
from eovax.nn.blocks import (
    AttnBlock,
    Downsample,
    ResnetBlock,
    Upsample,
    WavelengthConditioner,
    swish,
)
from eovax.nn.distributions import DiagonalGaussian
from eovax.nn.dynamic_basis import DynamicInputLayer, DynamicOutputLayer
from eovax.nn.dynamic_conv import DynamicConv, DynamicConvDecoder
from eovax.nn.latent import LatentBatchNorm, patch_shuffle, patch_unshuffle


def _stem_kwargs(stem: StemConfig) -> dict:
    return dict(
        wv_planes=stem.wv_planes,
        inter_dim=stem.inter_dim,
        kernel_size=stem.kernel_size,
        num_layers=stem.num_layers,
        num_heads=stem.num_heads,
        generator_type=stem.generator_type,
        rank_ratio=stem.rank_ratio,
    )


class Encoder(nn.Module):
    """Image → latent moments [B, H/8, W/8, 2*z_channels] (model.py:67-197)."""

    cfg: EncoderConfig
    policy: Policy = FULL_PRECISION
    remat: bool = False  # rematerialize ResnetBlocks (trade FLOPs for HBM)

    @property
    def use_adain(self) -> bool:
        return bool(self.cfg.use_dynamic_ops and self.cfg.stem and self.cfg.stem.use_adain)

    def setup(self):
        cfg = self.cfg
        p = self.policy
        num_res = len(cfg.ch_mult)
        Block = nn.remat(ResnetBlock) if self.remat else ResnetBlock

        if cfg.use_dynamic_ops:
            if cfg.stem.mode == "basis":
                # Shared-basis recipe (configs/finetune_consistency_bases.yaml;
                # crashes upstream — see StemConfig docstring).
                self.conv_in = DynamicInputLayer(
                    out_channels=cfg.ch, num_bases=cfg.stem.num_bases,
                    rank_dim=cfg.stem.rank_dim, kernel_size=cfg.stem.kernel_size,
                    policy=p,
                )
            else:
                self.conv_in = DynamicConv(
                    embed_dim=cfg.ch, stride=1, padding=1, policy=p,
                    **_stem_kwargs(cfg.stem),
                )
        else:
            self.conv_in = nn.Conv(
                cfg.ch, (3, 3), padding=((1, 1), (1, 1)), precision=p.precision,
                dtype=p.compute_dtype, param_dtype=p.param_dtype,
            )
        if self.use_adain:
            self.conditioner = WavelengthConditioner(embed_dim=512)
        cond_dim = 512 if self.use_adain else None

        in_mult = (1,) + tuple(cfg.ch_mult)
        blocks, downs = {}, {}
        for i in range(num_res):
            block_in = cfg.ch * in_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks):
                blocks[(i, j)] = Block(
                    in_channels=block_in, out_channels=block_out,
                    cond_dim=cond_dim, policy=p, name=f"down_{i}_block_{j}",
                )
                block_in = block_out
            if i != num_res - 1:
                downs[i] = Downsample(block_in, policy=p, name=f"down_{i}_downsample")
        self._blocks = blocks
        self._downs = downs

        self.mid_block_1 = ResnetBlock(block_in, block_in, cond_dim, p)
        self.mid_attn_1 = AttnBlock(block_in, p)
        self.mid_block_2 = ResnetBlock(block_in, block_in, cond_dim, p)

        self.norm_out = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=p.norm_dtype)
        self.conv_out = nn.Conv(
            2 * cfg.z_channels, (3, 3), padding=((1, 1), (1, 1)), precision=p.precision,
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )
        self.quant_conv = nn.Conv(
            2 * cfg.z_channels, (1, 1), precision=p.precision,
            dtype=p.compute_dtype, param_dtype=p.param_dtype,
        )

    def __call__(self, x: jax.Array, wvs: jax.Array | None = None) -> jax.Array:
        cfg = self.cfg
        emb = None
        if cfg.use_dynamic_ops:
            assert wvs is not None, "wvs must be provided for a dynamic encoder"
            h = self.conv_in(x, wvs)
            if self.use_adain:
                emb = self.conditioner(wvs)
        else:
            h = self.conv_in(self.policy.cast_to_compute(x))

        num_res = len(cfg.ch_mult)
        for i in range(num_res):
            for j in range(cfg.num_res_blocks):
                h = self._blocks[(i, j)](h, emb)
            if i != num_res - 1:
                h = self._downs[i](h)

        h = self.mid_block_1(h, emb)
        h = self.mid_attn_1(h)
        h = self.mid_block_2(h, emb)

        h = self.norm_out(h).astype(self.policy.compute_dtype)
        h = swish(h)
        h = self.conv_out(h)
        h = self.quant_conv(h)
        return h


class Decoder(nn.Module):
    """Latent [B, H/8, W/8, z_channels] → image (model.py:223-358)."""

    cfg: DecoderConfig
    policy: Policy = FULL_PRECISION
    remat: bool = False

    @property
    def use_adain(self) -> bool:
        return bool(self.cfg.use_dynamic_ops and self.cfg.stem and self.cfg.stem.use_adain)

    def setup(self):
        cfg = self.cfg
        p = self.policy
        num_res = len(cfg.ch_mult)
        Block = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        conv_kw = dict(dtype=p.compute_dtype, param_dtype=p.param_dtype, precision=p.precision)

        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1), **conv_kw)
        block_in = cfg.ch * cfg.ch_mult[num_res - 1]
        self.conv_in = nn.Conv(block_in, (3, 3), padding=((1, 1), (1, 1)), **conv_kw)

        if self.use_adain:
            self.conditioner = WavelengthConditioner(embed_dim=512)
        cond_dim = 512 if self.use_adain else None

        self.mid_block_1 = ResnetBlock(block_in, block_in, cond_dim, p)
        self.mid_attn_1 = AttnBlock(block_in, p)
        self.mid_block_2 = ResnetBlock(block_in, block_in, cond_dim, p)

        blocks, ups = {}, {}
        # Build top-down (matching the reference's reversed construction,
        # model.py:274-293) so the in/out channel chain is identical.
        for i in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                blocks[(i, j)] = Block(
                    in_channels=block_in, out_channels=block_out,
                    cond_dim=cond_dim, policy=p, name=f"up_{i}_block_{j}",
                )
                block_in = block_out
            if i != 0:
                ups[i] = Upsample(block_in, policy=p, name=f"up_{i}_upsample")
        self._blocks = blocks
        self._ups = ups

        self.norm_out = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=p.norm_dtype)
        if cfg.use_dynamic_ops:
            if cfg.stem.mode == "basis":
                self.conv_out = DynamicOutputLayer(
                    in_channels=block_in, num_bases=cfg.stem.num_bases,
                    rank_dim=cfg.stem.rank_dim, kernel_size=cfg.stem.kernel_size,
                    policy=p,
                )
            else:
                self.conv_out = DynamicConvDecoder(
                    embed_dim=block_in, stride=1, padding=1, policy=p,
                    **_stem_kwargs(cfg.stem),
                )
        else:
            self.conv_out = nn.Conv(cfg.out_ch, (3, 3), padding=((1, 1), (1, 1)), **conv_kw)

    def penultimate(self, z: jax.Array, wvs: jax.Array | None = None) -> jax.Array:
        """Everything up to (and including) norm_out+swish — the activation
        the output stem convolves. Exposed for adaptive GAN weighting
        (recon = conv(penultimate, generated_kernel) + bias)."""
        cfg = self.cfg
        h = self.post_quant_conv(self.policy.cast_to_compute(z))
        h = self.conv_in(h)

        emb = None
        if self.use_adain:
            assert wvs is not None
            emb = self.conditioner(wvs)

        h = self.mid_block_1(h, emb)
        h = self.mid_attn_1(h)
        h = self.mid_block_2(h, emb)

        num_res = len(cfg.ch_mult)
        for i in reversed(range(num_res)):
            for j in range(cfg.num_res_blocks + 1):
                h = self._blocks[(i, j)](h, emb)
            if i != 0:
                h = self._ups[i](h)

        h = self.norm_out(h).astype(self.policy.compute_dtype)
        return swish(h)

    def __call__(self, z: jax.Array, wvs: jax.Array | None = None) -> jax.Array:
        h = self.penultimate(z, wvs)
        if self.cfg.use_dynamic_ops:
            assert wvs is not None, "wvs must be provided for a dynamic decoder"
            return self.conv_out(h, wvs)
        return self.conv_out(self.policy.cast_to_compute(h))

    def generate_output_kernel(self, wvs: jax.Array):
        """Expose the generated output-stem kernel (for adaptive GAN
        weighting — the reference stashes it at dynamic_conv.py:708)."""
        assert self.cfg.use_dynamic_ops
        return self.conv_out.generate(wvs)


class EOVAECore(nn.Module):
    """Full VAE: encoder + patch-shuffle + latent BatchNorm + decoder.

    Functional core of the reference's EOFluxVAE LightningModule
    (new_autoencoder.py:64-738). All latent-space plumbing (ps=2×2 shuffle,
    affine-free BN with running stats, EQ-VAE scale/rot transforms, latent
    noising) lives here; training logic lives in eovax.train.
    """

    encoder_cfg: EncoderConfig
    decoder_cfg: DecoderConfig
    policy: Policy = FULL_PRECISION
    ps: tuple[int, int] = (2, 2)
    remat: bool = False  # rematerialize res blocks under grad (HBM saver)

    def setup(self):
        self.encoder = Encoder(self.encoder_cfg, self.policy, remat=self.remat)
        self.decoder = Decoder(self.decoder_cfg, self.policy, remat=self.remat)
        self.bn = LatentBatchNorm(
            num_features=self.ps[0] * self.ps[1] * self.encoder_cfg.z_channels
        )

    # --- primitives -------------------------------------------------------

    def encode(self, x: jax.Array, wvs: jax.Array) -> DiagonalGaussian:
        """Image → posterior over the raw (unshuffled) latent."""
        moments = self.encoder(x, wvs)
        return DiagonalGaussian.from_moments(moments.astype(jnp.float32))

    def decode(self, z: jax.Array, wvs: jax.Array) -> jax.Array:
        """Normalized packed latent [B,i,j,4z] → image (new_autoencoder.py:423-429)."""
        z = self.bn.inverse(z)
        z = patch_unshuffle(z, self.ps)
        return self.decoder(z, wvs)

    def decode_raw(self, z: jax.Array, wvs: jax.Array) -> jax.Array:
        """Raw (unshuffled, unnormalized) latent → image."""
        return self.decoder(z, wvs)

    def normalize_latent(self, z_shuffled: jax.Array, *, train: bool) -> jax.Array:
        return self.bn(z_shuffled, use_running_average=not train)

    # --- composite passes ---------------------------------------------------

    def forward(
        self,
        x: jax.Array,
        wvs: jax.Array,
        *,
        rng: jax.Array | None = None,
        sample_posterior: bool = True,
        scale: float | tuple[float, float] | None = None,
        angle: int | None = None,
        train: bool = False,
        latent_noise_p: float = 0.0,
        noise_tau: float = 0.8,
    ) -> tuple[jax.Array, DiagonalGaussian]:
        """Encode → (EQ-VAE transform) → shuffle → BN → decode
        (new_autoencoder.py:447-478)."""
        posterior = self.encode(x, wvs)
        if sample_posterior:
            rng, key = jax.random.split(rng)
            z = posterior.sample(key)
        else:
            z = posterior.mode()

        if scale is not None:
            z = self._apply_scale(z, scale)
        if angle is not None:
            z = jnp.rot90(z, k=angle, axes=(2, 1))  # NHWC (W,H) ≡ torch dims [-1,-2]

        z = patch_shuffle(z, self.ps)
        z = self.normalize_latent(z, train=train)

        if train and latent_noise_p > 0.0:
            rng, k_gate, k_sigma, k_noise = jax.random.split(rng, 4)
            gate = jax.random.uniform(k_gate) < latent_noise_p
            sigma = noise_tau * jax.random.uniform(k_sigma, (z.shape[0], 1, 1, 1))
            noise = sigma * jax.random.normal(k_noise, z.shape, z.dtype)
            z = jnp.where(gate, z + noise, z)

        recon = self.decode(z, wvs)
        return recon, posterior

    def forward_gan(
        self,
        x: jax.Array,
        wvs: jax.Array,
        *,
        rng: jax.Array | None = None,
        sample_posterior: bool = True,
        scale: float | tuple[float, float] | None = None,
        angle: int | None = None,
        train: bool = False,
        latent_noise_p: float = 0.0,
        noise_tau: float = 0.8,
    ):
        """Like :meth:`forward`, but also exposes the decoder penultimate
        activation and the output-stem (kernel, bias) so losses can
        re-express the reconstruction as conv(h_pre, kernel)+bias for
        adaptive GAN weighting. With a static decoder the stem params are
        read from the variables by the caller (kernel/bias returned None).
        """
        posterior = self.encode(x, wvs)
        if sample_posterior:
            rng, key = jax.random.split(rng)
            z = posterior.sample(key)
        else:
            z = posterior.mode()
        if scale is not None:
            z = self._apply_scale(z, scale)
        if angle is not None:
            z = jnp.rot90(z, k=angle, axes=(2, 1))
        z = patch_shuffle(z, self.ps)
        z = self.normalize_latent(z, train=train)
        if train and latent_noise_p > 0.0:
            rng, k_gate, k_sigma, k_noise = jax.random.split(rng, 4)
            gate = jax.random.uniform(k_gate) < latent_noise_p
            sigma = noise_tau * jax.random.uniform(k_sigma, (z.shape[0], 1, 1, 1))
            z = jnp.where(gate, z + sigma * jax.random.normal(k_noise, z.shape, z.dtype), z)
        z_dec = patch_unshuffle(self.bn.inverse(z), self.ps)
        h_pre = self.decoder.penultimate(z_dec, wvs)
        if self.decoder_cfg.use_dynamic_ops:
            kernel, bias = self.decoder.conv_out.generate(wvs)
            recon = self.decoder.conv_out._conv(h_pre, kernel, bias)
        else:
            kernel = bias = None
            recon = self.decoder.conv_out(self.policy.cast_to_compute(h_pre))
        return recon, posterior, h_pre, kernel, bias

    def encode_to_latent(self, x: jax.Array, wvs: jax.Array, *, train: bool = False) -> jax.Array:
        """Image → normalized packed latent [B, H/16, W/16, 4z]
        (new_autoencoder.py:731-738; uses posterior mode)."""
        z = self.encode(x, wvs).mode()
        return self.normalize_latent(patch_shuffle(z, self.ps), train=train)

    def encode_spatial_normalized(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        """Image → normalized latent in spatial layout [B, H/8, W/8, z]
        (new_autoencoder.py:480-502)."""
        return patch_unshuffle(self.encode_to_latent(x, wvs), self.ps)

    def decode_spatial_normalized(self, z: jax.Array, wvs: jax.Array) -> jax.Array:
        """Spatial normalized latent → image (new_autoencoder.py:504-518)."""
        return self.decode(patch_shuffle(z, self.ps), wvs)

    def reconstruct(self, x: jax.Array, wvs: jax.Array) -> jax.Array:
        recon, _ = self.forward(x, wvs, sample_posterior=False)
        return recon

    # --- helpers ------------------------------------------------------------

    def _apply_scale(self, z: jax.Array, scale) -> jax.Array:
        """Bilinear latent rescale snapped to patch multiples
        (new_autoencoder.py:520-531; align_corners=False ≡ half-pixel).
        antialias=False: torch F.interpolate does NOT antialias by
        default, and every EQ-VAE scale bin is a downscale — exactly
        where jax's default antialiased triangle kernel would widen the
        sampling neighborhood and diverge from the reference."""
        b, h, w, c = z.shape
        sh, sw = scale if isinstance(scale, (tuple, list)) else (scale, scale)
        new_h = round(h * sh / self.ps[0]) * self.ps[0]
        new_w = round(w * sw / self.ps[1]) * self.ps[1]
        return jax.image.resize(
            z, (b, new_h, new_w, c), method="bilinear", antialias=False
        )

    def generate_output_kernel(self, wvs: jax.Array):
        return self.decoder.generate_output_kernel(wvs)
