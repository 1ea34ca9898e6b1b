"""EOFluxVAE — the published inference/training API.

Compatibility contract with the reference
(/root/reference/eo_vae/models/new_autoencoder.py:64-738, README.md:31-49):
``from_pretrained``, ``from_config``, ``reconstruct``,
``encode_spatial_normalized``, ``decode_spatial_normalized``,
``encode_to_latent``, ``decode_raw``, ``encode``, ``decode``,
``forward(x, wvs, sample_posterior, scale, angle)``.

Tensors cross this API in the reference's **NCHW** layout; internally all
compute is NHWC (TPU-native). Each (method, channel-count, static-flag)
combination jit-compiles once and is cached — the four modalities
(2/3/12/13 channels) yield at most four executables per method, as planned
in SURVEY.md §7 ("hard parts" #2).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from eovax.core.config import VAEConfig, load_model_config
from eovax.core.precision import FULL_PRECISION, Policy
from eovax.models.backbone import EOVAECore
from eovax.nn.distributions import DiagonalGaussian


def _to_nhwc(x) -> jax.Array:
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def _to_nchw(x) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


class EOFluxVAE:
    """Multi-sensor EO VAE with wavelength-conditioned dynamic stems."""

    def __init__(
        self,
        config: VAEConfig,
        variables: dict[str, Any] | None = None,
        *,
        policy: Policy = FULL_PRECISION,
        seed: int = 0,
        remat: bool = False,
    ) -> None:
        self.config = config
        self.policy = policy
        self.core = EOVAECore(
            encoder_cfg=config.encoder, decoder_cfg=config.decoder, policy=policy,
            remat=remat,
        )
        if variables is None:
            variables = self._init_variables(seed)
        self.variables = variables
        self._jit_cache: dict[Any, Any] = {}

    # ------------------------------------------------------------------ init

    def _init_variables(self, seed: int) -> dict[str, Any]:
        cfg = self.config.encoder
        # Parameters are resolution-independent; init at 64² for speed.
        res = min(cfg.resolution, 64)
        x = jnp.zeros((1, res, res, cfg.in_channels), jnp.float32)
        wvs = jnp.linspace(0.4, 2.5, cfg.in_channels)
        return self.core.init(
            jax.random.PRNGKey(seed),
            x,
            wvs,
            sample_posterior=False,
            method=EOVAECore.forward,
        )

    # ----------------------------------------------------------- constructors

    @classmethod
    def from_config(
        cls,
        config_path: str,
        ckpt_path: str | None = None,
        *,
        policy: Policy = FULL_PRECISION,
        ignore_keys: tuple[str, ...] = (),
        strict: bool = True,
        seed: int = 0,
    ) -> "EOFluxVAE":
        """Build from a reference-format YAML config + optional checkpoint
        (new_autoencoder.py:187-221)."""
        model = cls(load_model_config(config_path), policy=policy, seed=seed)
        if ckpt_path:
            model.load_checkpoint(ckpt_path, ignore_keys=ignore_keys, strict=strict)
        return model

    @classmethod
    def from_pretrained(
        cls,
        repo_id: str,
        *,
        ckpt_filename: str = "eo-vae.ckpt",
        config_filename: str = "model_config.yaml",
        revision: str | None = None,
        cache_dir: str | None = None,
        local_files_only: bool = False,
        policy: Policy = FULL_PRECISION,
        ignore_keys: tuple[str, ...] = (),
    ) -> "EOFluxVAE":
        """Download config/checkpoint from the HF Hub and build
        (new_autoencoder.py:223-268)."""
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as exc:  # pragma: no cover
            raise ImportError("huggingface_hub is required for from_pretrained") from exc

        kw = dict(
            repo_id=repo_id,
            revision=revision,
            cache_dir=cache_dir,
            local_files_only=local_files_only,
        )
        config_path = hf_hub_download(filename=config_filename, **kw)
        ckpt_path = hf_hub_download(filename=ckpt_filename, **kw)
        return cls.from_config(config_path, ckpt_path, policy=policy, ignore_keys=ignore_keys)

    # ------------------------------------------------------------- checkpoint

    def load_checkpoint(
        self, path: str, *, ignore_keys: tuple[str, ...] = (), strict: bool = True
    ) -> None:
        """Load native (.msgpack) or reference torch checkpoints
        (format sniffing parity: new_autoencoder.py:295-356)."""
        if not os.path.exists(path):
            raise FileNotFoundError(f"Checkpoint not found: {path}")
        if path.endswith((".msgpack", ".eovax")) or os.path.isdir(path):
            from eovax.utils.checkpoint import load_variables

            self.variables = load_variables(path, self.variables)
        else:
            from eovax.utils.torch_convert import load_reference_checkpoint

            self.variables, report = load_reference_checkpoint(
                path,
                self.variables,
                encoder_dynamic=self.config.encoder.use_dynamic_ops,
                decoder_dynamic=self.config.decoder.use_dynamic_ops,
                ignore_keys=ignore_keys,
                strict=strict,
            )
        self._jit_cache.clear()

    def save(self, path: str) -> None:
        from eovax.utils.checkpoint import save_variables

        save_variables(path, self.variables)

    # ----------------------------------------------------------------- params

    @property
    def params(self):
        return self.variables["params"]

    def param_count(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))

    # ------------------------------------------------------------- jit driver

    def _apply(self, method: str, *args, **kwargs):
        """Jit-cached `core.apply`. Hashable kwargs are baked into the
        compiled closure (one executable per combination); array kwargs
        (e.g. `rng`) are traced."""
        static = {k: v for k, v in kwargs.items() if isinstance(v, (bool, int, float, str, tuple, type(None)))}
        dynamic = {k: v for k, v in kwargs.items() if k not in static}
        key = (method, tuple(sorted(static.items())))
        fn = self._jit_cache.get(key)
        if fn is None:
            core = self.core
            bound_method = getattr(EOVAECore, method)

            def raw(variables, *a, **dyn):
                return core.apply(variables, *a, method=bound_method, **static, **dyn)

            fn = jax.jit(raw)
            self._jit_cache[key] = fn
        return fn(self.variables, *args, **dynamic)

    # -------------------------------------------------------------- inference

    def encode(self, x, wvs) -> DiagonalGaussian:
        """Image [B,C,H,W] → posterior over the raw latent (NCHW moments)."""
        post = self._apply("encode", _to_nhwc(x), jnp.asarray(wvs))
        return DiagonalGaussian(mean=_to_nchw(post.mean), logvar=_to_nchw(post.logvar))

    def decode(self, z, wvs) -> jax.Array:
        """Normalized packed latent [B,4z,H/16,W/16] → image [B,C,H,W]."""
        return _to_nchw(self._apply("decode", _to_nhwc(z), jnp.asarray(wvs)))

    def decode_raw(self, z, wvs) -> jax.Array:
        return _to_nchw(self._apply("decode_raw", _to_nhwc(z), jnp.asarray(wvs)))

    def forward(
        self,
        x,
        wvs,
        sample_posterior: bool = True,
        scale=None,
        angle: int | None = None,
        *,
        seed: int = 0,
    ) -> tuple[jax.Array, DiagonalGaussian]:
        scale_t = tuple(scale) if isinstance(scale, (tuple, list)) else scale
        kwargs = dict(sample_posterior=sample_posterior, scale=scale_t, angle=angle)
        if sample_posterior:
            kwargs["rng"] = jax.random.PRNGKey(seed)
        recon, post = self._apply("forward", _to_nhwc(x), jnp.asarray(wvs), **kwargs)
        post = DiagonalGaussian(mean=_to_nchw(post.mean), logvar=_to_nchw(post.logvar))
        return _to_nchw(recon), post

    def reconstruct(self, x, wvs) -> jax.Array:
        """Deterministic round-trip (new_autoencoder.py:724-728)."""
        return _to_nchw(self._apply("reconstruct", _to_nhwc(x), jnp.asarray(wvs)))

    def encode_to_latent(self, x, wvs) -> jax.Array:
        """Image → normalized packed latent [B, 4z, H/16, W/16]."""
        return _to_nchw(self._apply("encode_to_latent", _to_nhwc(x), jnp.asarray(wvs)))

    def encode_spatial_normalized(self, x, wvs) -> jax.Array:
        """Image → normalized spatial latent [B, z, H/8, W/8]."""
        return _to_nchw(
            self._apply("encode_spatial_normalized", _to_nhwc(x), jnp.asarray(wvs))
        )

    def decode_spatial_normalized(self, z, wvs) -> jax.Array:
        return _to_nchw(
            self._apply("decode_spatial_normalized", _to_nhwc(z), jnp.asarray(wvs))
        )
