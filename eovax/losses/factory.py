"""Loss + discriminator construction from config dicts.

Replaces the reference's hydra ``instantiate(config.model.loss_fn)`` plus
the discriminator-injection hack of /root/reference/train.py:105-117: the
reference passes the *encoder's* dynamic ``conv_in`` module as the
DynamicPatchGAN input stem (sharing weights); functionally we build an
owned stem with the same hyperparameters and seed its parameters from the
encoder stem at trainer init (Stage2Trainer ``disc_stem_params``).

DOFA-based terms (DOFALPIPS / feature loss) are gated on a locally
available converted checkpoint — `hf_hub_download` is unreachable here
(reference loads at dofa.py:699-900) — and degrade to a warning.
"""

from __future__ import annotations

import os
from typing import Any

import jax

from eovax.core.config import VAEConfig
from eovax.core.precision import FULL_PRECISION, Policy
from eovax.losses.consistency import EOConsistencyLoss
from eovax.losses.gan import (
    DynamicPatchGAN,
    EOGenerativeLoss,
    EOPatchLoss,
    NLayerDiscriminator,
)

#: keys EOPatchLoss accepts (consistency_loss.py:99-104)
_PATCH_KEYS = ("disc_start", "disc_weight", "ssim_weight")
#: keys EOGenerativeLoss accepts (loss_functions.py:13-56)
_GEN_KEYS = (
    "perceptual_weight", "disc_weight", "gan_start_step",
    "disc_update_start_step", "max_d_weight", "disc_loss_type",
    "focal_loss_weight", "focal_loss_alpha",
)


def build_loss_from_config(
    loss_cfg: dict | None,
    vae_cfg: VAEConfig,
    *,
    policy: Policy = FULL_PRECISION,
    seed: int = 0,
) -> tuple[Any, Any | None, bool]:
    """Instantiate the stage-2 loss named by ``loss_cfg['_target_']``.

    Returns ``(loss_obj, discriminator_module | None, seed_disc_stem)``:
    ``seed_disc_stem`` asks the trainer to copy the encoder's conv_in
    params into the discriminator's dynamic input stem (the reference's
    injection, train.py:109-117).
    """
    loss_cfg = dict(loss_cfg or {})
    target = loss_cfg.pop("_target_", "") or ""

    if target.endswith("EOPatchLoss"):
        return _build_patch_loss(loss_cfg, vae_cfg, policy)
    if target.endswith("EOGenerativeLoss"):
        return _build_generative_loss(loss_cfg, vae_cfg, policy, seed)
    # Default: EOConsistencyLoss (also covers empty / explicit target).
    if target and not target.endswith("EOConsistencyLoss"):
        raise ValueError(f"Unknown loss _target_: {target}")
    loss_cfg.pop("discriminator", None)
    dofa_cfg = loss_cfg.pop("dofa_net", None)
    if loss_cfg.get("feature_weight", 0) > 0 and dofa_cfg is not None:
        feats = _build_dofa_features(dofa_cfg, vae_cfg, seed)
        if feats is None:
            loss_cfg["feature_weight"] = 0.0
        loss_cfg["dofa_features"] = feats
    return EOConsistencyLoss.from_dict(loss_cfg), None, False


def _build_patch_loss(loss_cfg, vae_cfg, policy):
    disc_cfg = dict(loss_cfg.pop("discriminator", None) or {})
    disc_target = disc_cfg.pop("_target_", "")
    if disc_target and not disc_target.endswith("DynamicPatchGAN"):
        raise ValueError(f"EOPatchLoss expects a DynamicPatchGAN: {disc_target}")

    enc = vae_cfg.encoder
    seed_stem = bool(enc.use_dynamic_ops and enc.stem and enc.stem.mode == "conv")
    stem = enc.stem
    disc = DynamicPatchGAN(
        # The injected stem maps any band count to the encoder width
        # (train.py:113-115: stem == encoder.conv_in, so ndf == ch).
        ndf=disc_cfg.pop("ndf", enc.ch),
        n_layers=disc_cfg.pop("n_layers", 3),
        wv_planes=stem.wv_planes if seed_stem else 128,
        stem_num_layers=stem.num_layers if seed_stem else 1,
        stem_num_heads=stem.num_heads if seed_stem else 4,
        stem_generator_type=stem.generator_type if seed_stem else "transformer",
        stem_rank_ratio=stem.rank_ratio if seed_stem else 4,
        policy=policy,
    )
    if disc_cfg:
        raise ValueError(f"Unknown DynamicPatchGAN kwargs: {sorted(disc_cfg)}")

    # Known train-mode difference: disc.apply runs without a "dropout"
    # RNG, so a factorized/multi-stage disc STEM's 0.1 generator dropout
    # (active in the reference's Lightning train mode) stays off here.
    # Unreachable with shipped configs (the only factorized config uses
    # EOConsistencyLoss, no GAN); the generator/VAE path has full dropout
    # parity via the train steps' rngs={"dropout": ...}.
    loss = EOPatchLoss(
        disc_apply=lambda dv, x, wv: disc.apply(dv, x, wv),
        **{k: loss_cfg.pop(k) for k in _PATCH_KEYS if k in loss_cfg},
    )
    if loss_cfg:
        raise ValueError(f"Unknown EOPatchLoss kwargs: {sorted(loss_cfg)}")
    return loss, disc, seed_stem


def _build_generative_loss(loss_cfg, vae_cfg, policy, seed):
    disc_cfg = dict(loss_cfg.pop("discriminator", None) or {})
    disc_target = disc_cfg.pop("_target_", "")
    if disc_target and not disc_target.endswith("NLayerDiscriminator"):
        raise ValueError(f"EOGenerativeLoss expects an NLayerDiscriminator: {disc_target}")
    disc = NLayerDiscriminator(
        input_nc=disc_cfg.pop("input_nc", 3),
        ndf=disc_cfg.pop("ndf", 64),
        n_layers=disc_cfg.pop("n_layers", 3),
        policy=policy,
    )
    if disc_cfg:
        raise ValueError(f"Unknown NLayerDiscriminator kwargs: {sorted(disc_cfg)}")

    kwargs = {k: loss_cfg.pop(k) for k in _GEN_KEYS if k in loss_cfg}
    lpips_cfg = loss_cfg.pop("lpips", None)
    lpips_apply = None
    if kwargs.get("perceptual_weight", 1.0) > 0 and lpips_cfg is not None:
        lpips_apply = _build_lpips(lpips_cfg, vae_cfg, seed)
        if lpips_apply is None:
            kwargs["perceptual_weight"] = 0.0
    if loss_cfg:
        raise ValueError(f"Unknown EOGenerativeLoss kwargs: {sorted(loss_cfg)}")
    loss = EOGenerativeLoss(
        disc_apply=lambda dv, x, wv: disc.apply(dv, x, wv),
        lpips_apply=lpips_apply,
        **kwargs,
    )
    return loss, disc, False


def _build_dofa(dofa_cfg: dict, seed: int):
    """(module, variables) from a dofa_net config block, or None if the
    pretrained weights aren't locally available (frozen nets are useless
    at random init)."""
    from eovax.models import dofa as dofa_mod

    dofa_cfg = dict(dofa_cfg)
    target = dofa_cfg.pop("_target_", "eo_vae.models.dofa.dofav1_base_patch16_224")
    builder_name = target.rsplit(".", 1)[-1]
    builder = getattr(dofa_mod, builder_name, None)
    if builder is None:
        print(f"[losses.factory] unknown DOFA builder {builder_name!r} — term disabled")
        return None
    ckpt = dofa_cfg.pop("ckpt_data", None) or dofa_cfg.pop("weights_path", None)
    model_bands = dofa_cfg.pop("model_bands", None)
    if not (ckpt and os.path.exists(ckpt)):
        print(
            f"[losses.factory] DOFA checkpoint {ckpt!r} not found — "
            "perceptual/feature term disabled (supply a converted ckpt to enable)"
        )
        return None
    try:
        vit, variables = builder(weights_path=ckpt, **dofa_cfg)
    except NotImplementedError as e:
        print(f"[losses.factory] {e} — term disabled")
        return None
    return vit, variables, model_bands


def _build_lpips(lpips_cfg: dict, vae_cfg: VAEConfig, seed: int):
    """DOFALPIPS apply fn (frozen weighting at init, loss_utils.py:41-47)."""
    import jax.numpy as jnp

    from eovax.models.dofa import DOFALPIPS

    lpips_cfg = dict(lpips_cfg)
    lpips_cfg.pop("_target_", None)
    built = _build_dofa(lpips_cfg.pop("dofa_net", {}), seed)
    if built is None:
        return None
    vit, dofa_vars, _ = built
    lpips = DOFALPIPS(dofa=vit)
    res = min(vae_cfg.encoder.resolution, 224)
    nch = vae_cfg.encoder.in_channels
    dummy = jnp.zeros((1, res, res, nch), jnp.float32)
    dummy_wvs = jnp.linspace(0.4, 2.5, nch)
    variables = lpips.init(jax.random.PRNGKey(seed + 7), dummy, dummy, dummy_wvs)
    if dofa_vars is not None:
        # The ViT is the "dofa" child of DOFALPIPS — graft its pretrained
        # params under that key, keeping the lin_k weighting at init.
        params = dict(variables["params"])
        params["dofa"] = dofa_vars["params"]
        variables = {**variables, "params": params}

    def lpips_apply(inputs, recon, wvs):
        return lpips.apply(variables, inputs, recon, wvs)

    return lpips_apply


def _build_dofa_features(dofa_cfg: dict, vae_cfg: VAEConfig, seed: int):
    """Feature-extraction fn for EOConsistencyLoss.feature_weight."""
    built = _build_dofa(dofa_cfg, seed)
    if built is None:
        return None
    vit, variables, _ = built

    # v3's forward_features returns a single [B,N,D] tensor (DINOv3
    # semantics); the consistency loss iterates per-tap features, so use
    # the multi-tap forward_lpips when the model has one (v3 only).
    method = getattr(vit, "forward_lpips", vit.forward_features)

    def features(x, wvs):
        return vit.apply(variables, x, wvs, method=method)

    return features
