"""PyTorch checkpoint → JAX pytree converter.

Handles the reference's three on-disk formats
(/root/reference/eo_vae/models/new_autoencoder.py:295-412):

1. **Flux teacher** ``.safetensors`` — body weights only; static conv_in /
   conv_out entries are skipped when the model uses dynamic stems.
2. **Stage-1 distilled** ``.pt`` — ``encoder_conv_in_state_dict`` /
   ``decoder_conv_out_state_dict`` holding just the hypernetwork stems.
3. **Full EO-VAE** ``.ckpt`` — Lightning checkpoint with a ``state_dict``
   (includes the latent-BN running stats, which are part of the public
   contract).

Layout transforms (torch → flax/NHWC):
- Conv2d weight  [O, I, kh, kw] → kernel [kh, kw, I, O]
- Linear weight  [O, I]         → kernel [I, O]
- Group/LayerNorm weight/bias   → scale/bias
- MultiheadAttention in_proj_weight [3E, E] → in_proj.kernel [E, 3E]
- BatchNorm running_mean/var    → batch_stats mean/var

The converter is template-driven: torch key paths are normalized to flax
paths and the leaf kind is resolved against the model's own initialized
variable tree, so any structural mismatch is reported rather than silently
dropped.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

# ---------------------------------------------------------------------------
# Loading raw torch state dicts
# ---------------------------------------------------------------------------


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def load_torch_file(path: str) -> dict[str, np.ndarray] | dict[str, Any]:
    """Load a .safetensors / .pt / .ckpt file into numpy-valued dicts.

    .pt distilled checkpoints are returned with their wrapper structure
    intact (encoder_conv_in_state_dict etc.); others as flat state dicts.
    """
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd

    try:
        import torch
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "Converting .pt/.ckpt checkpoints requires torch (CPU build is "
            "enough). Convert once with eovax.cli.convert_checkpoint and ship "
            "the native .msgpack artifact to TPU hosts."
        ) from exc

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and (
        "encoder_conv_in_state_dict" in ckpt or "decoder_conv_out_state_dict" in ckpt
    ):
        out: dict[str, Any] = {}
        for k, v in ckpt.items():
            if k.endswith("_state_dict") and isinstance(v, dict):
                out[k] = {kk: _to_numpy(vv) for kk, vv in v.items()}
            else:
                out[k] = v
        return out
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: _to_numpy(v) for k, v in sd.items() if hasattr(v, "shape") or hasattr(v, "detach")}


# ---------------------------------------------------------------------------
# Key-path normalization
# ---------------------------------------------------------------------------

_PATH_REWRITES = [
    (re.compile(r"(^|\.)down\.(\d+)\.block\.(\d+)\."), r"\1down_\2_block_\3."),
    (re.compile(r"(^|\.)down\.(\d+)\.downsample\."), r"\1down_\2_downsample."),
    (re.compile(r"(^|\.)up\.(\d+)\.block\.(\d+)\."), r"\1up_\2_block_\3."),
    (re.compile(r"(^|\.)up\.(\d+)\.upsample\."), r"\1up_\2_upsample."),
    (re.compile(r"(^|\.)mid\.block_(\d)\."), r"\1mid_block_\2."),
    (re.compile(r"(^|\.)mid\.attn_(\d)\."), r"\1mid_attn_\2."),
    (re.compile(r"transformer_encoder\.layers\.(\d+)\."), r"transformer_encoder.layers_\1."),
    (re.compile(r"fc_weight\.(\d+)\."), r"fc_weight_\1."),
    (re.compile(r"(^|\.)conditioner\.mlp\.(\d+)\."), r"\1conditioner.mlp_\2."),
    # DOFA ViT (eovax/models/dofa.py)
    (re.compile(r"(^|\.)blocks\.(\d+)\."), r"\1blocks_\2."),
    (re.compile(r"\.attn\.qkv\."), r".attn_qkv."),
    (re.compile(r"\.attn\.proj\."), r".attn_proj."),
    (re.compile(r"\.mlp\.fc1\."), r".mlp_fc1."),
    (re.compile(r"\.mlp\.fc2\."), r".mlp_fc2."),
]


def _normalize_module_path(path: str) -> str:
    for pat, repl in _PATH_REWRITES:
        path = pat.sub(repl, path)
    return path


def _tree_get(tree: Mapping, path: tuple[str, ...]):
    cur: Any = tree
    for p in path:
        if not isinstance(cur, Mapping) or p not in cur:
            return None
        cur = cur[p]
    return cur


def _tree_set(tree: dict, path: tuple[str, ...], value) -> None:
    cur = tree
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = value


class ConversionReport:
    """Tracks which keys were converted / skipped / failed to match."""

    def __init__(self):
        self.converted: list[str] = []
        self.skipped: list[str] = []
        self.unexpected: list[str] = []

    def __repr__(self):
        return (
            f"ConversionReport(converted={len(self.converted)}, "
            f"skipped={len(self.skipped)}, unexpected={len(self.unexpected)})"
        )


def convert_state_dict(
    sd: Mapping[str, np.ndarray],
    template: Mapping[str, Any],
    *,
    prefix: tuple[str, ...] = (),
    skip_predicate=None,
) -> tuple[dict, ConversionReport]:
    """Convert a flat torch state dict into flax-style variable updates.

    Args:
        sd: torch key → numpy array.
        template: the model's initialized ``variables`` dict (defines which
            leaves exist and their expected shapes).
        prefix: flax path prefix to prepend inside each collection, e.g.
            ``("encoder", "conv_in")`` when ``sd`` holds a bare stem
            state dict from a distilled checkpoint.
        skip_predicate: optional fn(torch_key) → bool; True skips the key.

    Returns:
        (updates, report) where updates is {collection: nested dict}.
    """
    params_tpl = template.get("params", {})
    stats_tpl = template.get("batch_stats", {})
    updates: dict[str, dict] = {"params": {}, "batch_stats": {}}
    report = ConversionReport()

    for key, value in sd.items():
        if skip_predicate is not None and skip_predicate(key):
            report.skipped.append(key)
            continue
        if key.endswith("num_batches_tracked"):
            report.skipped.append(key)
            continue

        norm = _normalize_module_path(key)
        parts = norm.split(".")
        module_path, leaf = tuple(parts[:-1]), parts[-1]

        # BatchNorm running stats → batch_stats collection.
        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            path = prefix + module_path + (name,)
            if _tree_get(stats_tpl, path) is not None:
                _tree_set(updates["batch_stats"], path, np.asarray(value, np.float32))
                report.converted.append(key)
            else:
                report.unexpected.append(key)
            continue

        # MultiheadAttention packed projection.
        if leaf in ("in_proj_weight", "in_proj_bias"):
            sub = "kernel" if leaf == "in_proj_weight" else "bias"
            path = prefix + module_path + ("in_proj", sub)
            tpl = _tree_get(params_tpl, path)
            if tpl is None:
                report.unexpected.append(key)
                continue
            arr = np.asarray(value, np.float32)
            if sub == "kernel":
                arr = arr.T  # [3E, E] → [E, 3E]
            _tree_set(updates["params"], path, arr)
            report.converted.append(key)
            continue

        converted = False
        for cand, transform in _leaf_candidates(leaf, np.asarray(value)):
            path = prefix + module_path + (cand,)
            tpl = _tree_get(params_tpl, path)
            if tpl is not None:
                arr = transform(np.asarray(value, np.float32))
                if tuple(arr.shape) != tuple(tpl.shape):
                    raise ValueError(
                        f"Shape mismatch for {key}: torch {value.shape} → "
                        f"{arr.shape}, flax expects {tuple(tpl.shape)} at {path}"
                    )
                _tree_set(updates["params"], path, arr)
                report.converted.append(key)
                converted = True
                break
        if not converted:
            report.unexpected.append(key)

    if not updates["batch_stats"]:
        del updates["batch_stats"]
    return updates, report


def _leaf_candidates(leaf: str, value: np.ndarray):
    """Possible flax leaf names + layout transforms for a torch leaf."""
    if leaf == "weight":
        if value.ndim == 4:  # Conv2d OIHW → HWIO
            yield "kernel", lambda a: a.transpose(2, 3, 1, 0)
        elif value.ndim == 2:  # Linear [O,I] → [I,O]
            yield "kernel", lambda a: a.T
        elif value.ndim == 1:  # Norm scale
            yield "scale", lambda a: a
    elif leaf == "bias":
        yield "bias", lambda a: a
    elif leaf in ("weight_tokens", "bias_token"):
        yield leaf, lambda a: a
    else:
        yield leaf, lambda a: a


# ---------------------------------------------------------------------------
# High-level loaders mirroring new_autoencoder._load_checkpoint semantics
# ---------------------------------------------------------------------------


def _dynamic_stem_skip(encoder_dynamic: bool, decoder_dynamic: bool, ignore_keys):
    """Skip static conv stems when dynamic ops are on, plus user ignores
    (new_autoencoder.py:329-347)."""

    def skip(key: str) -> bool:
        if encoder_dynamic and "encoder.conv_in" in key:
            if "weight_generator" not in key and "fclayer" not in key:
                return True
        if decoder_dynamic and "decoder.conv_out" in key:
            if "weight_generator" not in key and "fclayer" not in key:
                return True
        return any(key.startswith(ik) for ik in ignore_keys)

    return skip


def _merge(dst: dict, src: Mapping) -> dict:
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_reference_checkpoint(
    path: str,
    variables: Mapping[str, Any],
    *,
    encoder_dynamic: bool = True,
    decoder_dynamic: bool = True,
    ignore_keys: tuple[str, ...] = (),
    strict: bool = True,
) -> tuple[dict, ConversionReport]:
    """Load any reference checkpoint format into a variables tree.

    Returns new variables (template deep-copied and updated) + report.
    Raises on critical missing weights, mirroring ``_verify_loading``
    (new_autoencoder.py:382-412): missing keys under dynamic stems (or the
    ignore list) are expected; anything else is an error when ``strict``.
    """
    raw = load_torch_file(path)

    if "encoder_conv_in_state_dict" in raw or "decoder_conv_out_state_dict" in raw:
        # Format 2: stage-1 distilled stems.
        updates: dict = {"params": {}}
        report = ConversionReport()
        if encoder_dynamic and raw.get("encoder_conv_in_state_dict"):
            up, rep = convert_state_dict(
                raw["encoder_conv_in_state_dict"], variables,
                prefix=("encoder", "conv_in"),
            )
            _merge(updates, up)
            report.converted += rep.converted
            report.unexpected += rep.unexpected
        if decoder_dynamic and raw.get("decoder_conv_out_state_dict"):
            up, rep = convert_state_dict(
                raw["decoder_conv_out_state_dict"], variables,
                prefix=("decoder", "conv_out"),
            )
            _merge(updates, up)
            report.converted += rep.converted
            report.unexpected += rep.unexpected
    else:
        # Formats 1/3: flat state dict. Flux teacher safetensors have no
        # 'encoder.' prefix? — they do ('encoder.*'/'decoder.*' in Flux AE
        # layout); lightning ckpts match module names directly.
        skip = _dynamic_stem_skip(encoder_dynamic, decoder_dynamic, ignore_keys)
        updates, report = convert_state_dict(raw, variables, skip_predicate=skip)

    if strict and report.unexpected:
        # Loss-function / trainer keys are expected extras in full ckpts.
        hard = [k for k in report.unexpected if k.split(".")[0] in ("encoder", "decoder", "bn")]
        if hard:
            raise ValueError(
                f"Unconvertible checkpoint keys ({len(hard)}): {hard[:10]}"
            )

    new_vars = _deep_copy_tree(variables)
    _merge_arrays(new_vars, updates)

    if strict:
        allowed = list(ignore_keys)
        if encoder_dynamic:
            allowed.append("encoder.conv_in")
        if decoder_dynamic:
            allowed.append("decoder.conv_out")
        missing = _collect_unloaded(variables, updates)
        critical = [
            m for m in missing if not any(m.startswith(a) for a in allowed)
        ]
        # Distilled checkpoints legitimately load only the stems — either
        # stem key marks format 2 (a decoder-only distill is valid).
        distilled = (
            "encoder_conv_in_state_dict" in raw
            or "decoder_conv_out_state_dict" in raw
        )
        if not distilled and critical:
            raise ValueError(
                f"Critical weights missing from checkpoint ({len(critical)}): "
                f"{critical[:10]}"
            )
    return new_vars, report


def _deep_copy_tree(tree):
    if isinstance(tree, Mapping):
        return {k: _deep_copy_tree(v) for k, v in tree.items()}
    return tree


def _merge_arrays(dst: dict, updates: Mapping) -> None:
    for coll, sub in updates.items():
        if coll not in dst:
            dst[coll] = {}
        _merge_arrays_rec(dst[coll], sub)


def _merge_arrays_rec(dst: dict, src: Mapping) -> None:
    import jax.numpy as jnp

    for k, v in src.items():
        if isinstance(v, Mapping):
            dst_sub = dst.setdefault(k, {})
            _merge_arrays_rec(dst_sub, v)
        else:
            dst[k] = jnp.asarray(v)


def _collect_unloaded(variables, updates, prefix="") -> list[str]:
    """Dotted paths of template leaves not covered by updates (params only)."""
    out: list[str] = []
    tpl = variables.get("params", {})
    upd = updates.get("params", {})

    def rec(t, u, path):
        if isinstance(t, Mapping):
            for k, v in t.items():
                rec(v, u.get(k, {}) if isinstance(u, Mapping) else {}, path + (k,))
        else:
            if u is None or (isinstance(u, Mapping) and not u):
                out.append(".".join(path))

    rec(tpl, upd, ())
    return out


# ---------------------------------------------------------------------------
# Reverse direction: eovax variables → torch state dict (ecosystem export)
# ---------------------------------------------------------------------------

_REVERSE_REWRITES = [
    (re.compile(r"(^|\.)down_(\d+)_block_(\d+)\."), r"\1down.\2.block.\3."),
    (re.compile(r"(^|\.)down_(\d+)_downsample\."), r"\1down.\2.downsample."),
    (re.compile(r"(^|\.)up_(\d+)_block_(\d+)\."), r"\1up.\2.block.\3."),
    (re.compile(r"(^|\.)up_(\d+)_upsample\."), r"\1up.\2.upsample."),
    (re.compile(r"(^|\.)mid_block_(\d)\."), r"\1mid.block_\2."),
    (re.compile(r"(^|\.)mid_attn_(\d)\."), r"\1mid.attn_\2."),
    (re.compile(r"transformer_encoder\.layers_(\d+)\."), r"transformer_encoder.layers.\1."),
    (re.compile(r"fc_weight_(\d+)\."), r"fc_weight.\1."),
    (re.compile(r"(^|\.)conditioner\.mlp_(\d+)\."), r"\1conditioner.mlp.\2."),
    (re.compile(r"(^|\.)blocks_(\d+)\."), r"\1blocks.\2."),
    (re.compile(r"\.attn_qkv\."), r".attn.qkv."),
    (re.compile(r"\.attn_proj\."), r".attn.proj."),
    (re.compile(r"\.mlp_fc1\."), r".mlp.fc1."),
    (re.compile(r"\.mlp_fc2\."), r".mlp.fc2."),
]


def _denormalize_module_path(path: str) -> str:
    for pat, repl in _REVERSE_REWRITES:
        path = pat.sub(repl, path)
    return path


def export_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """eovax variables → torch-layout state dict (the inverse of
    `convert_state_dict`): enables shipping eovax-trained weights back into
    the PyTorch reference (round-trip tested against the reference
    modules)."""
    out: dict[str, np.ndarray] = {}

    def walk(tree, path):
        if isinstance(tree, Mapping):
            for k, v in tree.items():
                walk(v, path + (k,))
            return
        arr = np.asarray(tree, np.float32)
        parts = list(path)
        leaf = parts[-1]
        if len(parts) >= 2 and parts[-2] == "in_proj":
            # MultiheadAttention packed projection.
            module = ".".join(parts[:-2])
            if leaf == "kernel":
                out[_denormalize_module_path(module + ".") + "in_proj_weight"] = arr.T
            else:
                out[_denormalize_module_path(module + ".") + "in_proj_bias"] = arr
            return
        module = ".".join(parts[:-1])
        prefix = _denormalize_module_path(module + ".") if module else ""
        if leaf == "kernel":
            if arr.ndim == 4:  # HWIO → OIHW
                out[prefix + "weight"] = arr.transpose(3, 2, 0, 1)
            else:  # [I,O] → [O,I]
                out[prefix + "weight"] = arr.T
        elif leaf == "scale":
            out[prefix + "weight"] = arr
        elif leaf == "bias":
            out[prefix + "bias"] = arr
        elif leaf in ("weight_tokens", "bias_token"):
            out[prefix + leaf] = arr
        elif leaf == "mean":  # LatentBatchNorm stats
            out[prefix + "running_mean"] = arr
        elif leaf == "var":
            out[prefix + "running_var"] = arr
            out[prefix + "num_batches_tracked"] = np.asarray(0, np.int64)
        else:
            out[prefix + leaf] = arr

    walk(variables.get("params", {}), ())
    walk(variables.get("batch_stats", {}), ())
    return out
