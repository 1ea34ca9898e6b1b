"""StableHLO export + loader for the EO-VAE inference surface.

See eovax/serving/__init__.py for the design overview. Reference context:
the torch repo's only deployment interface is `EOFluxVAE.from_pretrained`
(/root/reference/eo_vae/models/new_autoencoder.py:223-268), which needs
the full Python model stack at inference time; this module removes that
dependency for serving.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp

from eovax.data.wavelengths import WAVELENGTHS

#: function name → (core method, latent-space input?)
_FUNCTIONS = {
    "reconstruct": ("reconstruct", False),
    "encode_spatial_normalized": ("encode_spatial_normalized", False),
    "decode_spatial_normalized": ("decode_spatial_normalized", True),
}

_MANIFEST = "manifest.json"
_PARAMS = "params.msgpack"


def _cast_float_params(tree, params_dtype):
    """Storage-dtype cast for float parameter leaves. Quantization scales
    (kernel_scale / act_scale) stay fp32 — rounding the scale would shift
    every dequantized weight; int8 kernels are not floating and pass
    through untouched."""
    _keep = {"kernel_scale", "act_scale"}

    def _cast(path, v):
        if getattr(path[-1], "key", None) in _keep:
            return v
        return v.astype(params_dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v

    return jax.tree_util.tree_map_with_path(_cast, tree)


def _quant_manifest(quantized_convs: int, act_scales=None) -> dict:
    return {
        "weights": "int8-symmetric-per-out-channel",
        "quantized_convs": quantized_convs,
        "activations": (
            "static-percentile-calibrated" if act_scales else
            "dynamic-per-tensor-absmax"
        ),
    }


def per_sample_seeds(seed: int, n: int):
    """``[seed, seed+1, …, seed+n-1]`` as int32 with wraparound.

    THE scalar→vector seed derivation for per-sample-seed SR artifacts —
    `ServedModel.super_resolve` (scalar convenience arg) and the serving
    daemon's micro-batched path both use it, so a request served batched
    and the same request served unbatched draw identical per-sample
    noise (results agree to fp tolerance across batch compositions, and
    bitwise within one). Consecutive seeds keep the property that samples
    within one request draw DISTINCT noise (a broadcast scalar would hand
    every row the same x1), while sample ``i`` stays reproducible as the
    B=1 call with ``seed+i``."""
    import numpy as np

    raw = np.int64(seed) + np.arange(n, dtype=np.int64)
    return (raw & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def _nchw_fn(core, method_name: str, wvs: jax.Array):
    """Wrap a core method as (variables, x_nchw) → y_nchw with the
    modality wavelengths closed over (a per-artifact constant)."""
    method = getattr(type(core), method_name)

    def fn(variables, x):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW → NHWC
        y = core.apply(variables, x, wvs, method=method)
        return jnp.transpose(y, (0, 3, 1, 2))

    return fn


def calibrate_activations(
    model, batches, modality: str = "S2L2A", percentile: float = 99.9
) -> dict:
    """Percentile activation calibration for int8 export.

    Runs a handful of representative batches (NCHW fp32, physical-norm
    units) through a calibration-policy twin of ``model`` and returns
    {conv module path: amax} — the static activation scales consumed by
    ``export_model(act_scales=...)``. A few batches suffice: the scale
    only needs the bulk |activation| range, not dataset statistics.
    """
    import dataclasses as _dc

    from eovax.core.precision import INT8_CALIB_POLICY
    from eovax.kernels.qconv import act_scales_from_calibration
    from eovax.models.backbone import EOVAECore

    policy = _dc.replace(INT8_CALIB_POLICY, calib_percentile=percentile)
    core = EOVAECore(
        encoder_cfg=model.config.encoder, decoder_cfg=model.config.decoder,
        policy=policy,
    )
    wvs = jnp.asarray(WAVELENGTHS[modality], jnp.float32)
    trees = []
    for batch in batches:
        x = jnp.transpose(jnp.asarray(batch, jnp.float32), (0, 2, 3, 1))
        _, aux = core.apply(
            model.variables, x, wvs, method=EOVAECore.reconstruct,
            mutable=["calib"],
        )
        trees.append(jax.device_get(aux["calib"]))
    return act_scales_from_calibration(trees)


def export_model(
    model,
    out_dir: str,
    *,
    modalities: tuple[str, ...] = ("S2L2A",),
    resolution: int = 256,
    functions: tuple[str, ...] = tuple(_FUNCTIONS),
    params_dtype=None,
    act_scales: dict | None = None,
) -> dict:
    """Export the inference surface of an ``EOFluxVAE`` to ``out_dir``.

    Writes ``params.msgpack`` (existing checkpoint codec), one serialized
    StableHLO file per (function, modality), and ``manifest.json``
    describing signatures. The batch dimension is symbolic — any batch
    size works at load time. Returns the manifest dict.

    ``params_dtype``: optional storage dtype for the float parameter
    leaves (e.g. ``jnp.bfloat16`` halves the weights file; the exported
    functions are traced against the stored dtypes, and the compute
    policy's casts keep the math in the policy dtype).

    int8 models (``policy.conv_algorithm == "int8"``) have their body-conv
    kernels quantized ONCE here — the artifact stores int8 kernels +
    per-channel ``kernel_scale`` leaves (and, when ``act_scales`` from
    :func:`calibrate_activations` is given, static ``act_scale`` leaves),
    so serving does zero per-call weight quantization.
    """
    from jax import export as jexport

    from eovax.utils.checkpoint import save_variables

    os.makedirs(out_dir, exist_ok=True)
    core = model.core
    variables = model.variables
    quantized = 0
    if getattr(model.policy, "conv_algorithm", None) == "int8":
        from eovax.kernels.qconv import quantize_params_int8

        qparams, quantized = quantize_params_int8(
            variables["params"], act_scales=act_scales
        )
        variables = dict(variables)
        variables["params"] = qparams
    elif act_scales:
        raise ValueError("act_scales requires an int8-policy model")
    if params_dtype is not None:
        # Cast float PARAMS only; batch_stats (the BN running stats that
        # define the latent-normalization contract) stay fp32.
        variables = dict(variables)
        variables["params"] = _cast_float_params(variables["params"], params_dtype)
    save_variables(os.path.join(out_dir, _PARAMS), variables)
    var_shapes = jax.tree_util.tree_map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), variables
    )

    z_ch = model.config.encoder.z_channels
    factor = 2 ** (len(model.config.encoder.ch_mult) - 1)  # downsample levels
    latent_hw = resolution // factor

    (b,) = jexport.symbolic_shape("b")
    manifest: dict[str, Any] = {
        "format": "eovax-serving-v1",
        "resolution": resolution,
        "params": _PARAMS,
        "functions": {},
    }
    if quantized:
        manifest["quantization"] = _quant_manifest(quantized, act_scales)
    for modality in modalities:
        wvs = jnp.asarray(WAVELENGTHS[modality], jnp.float32)
        channels = len(WAVELENGTHS[modality])
        for name in functions:
            method_name, latent_input = _FUNCTIONS[name]
            if latent_input:
                in_shape = (b, z_ch, latent_hw, latent_hw)
            else:
                in_shape = (b, channels, resolution, resolution)
            fn = _nchw_fn(core, method_name, wvs)
            exp = jexport.export(jax.jit(fn))(
                var_shapes, jax.ShapeDtypeStruct(in_shape, jnp.float32)
            )
            fname = f"{name}.{modality}.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            manifest["functions"][f"{name}.{modality}"] = {
                "file": fname,
                "modality": modality,
                "input_shape": ["b"] + [int(d) for d in in_shape[1:]],
                "dtype": "float32",
            }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def export_sr_pipeline(
    model,
    denoiser,
    sr_params,
    out_dir: str,
    *,
    resolution: int = 128,
    steps: int = 50,
    sampler: str = "ddim",
    wvs=None,
    latent_stats: tuple | None = None,
    params_dtype=None,
    denoiser_policy=None,
) -> dict:
    """Export the stage-3 inference pipeline — encode → ``steps``-step DDIM
    → decode — as ONE StableHLO function (VERDICT r3 item #7: stage-3
    deployment without model code, like the VAE surface).

    The DDIM scan is traceable, so the whole pipeline serializes. The
    artifact's ``params.msgpack`` holds ``{"vae": <model variables>,
    "sr": <denoiser params>, "latent_norm": {mean, std}}``; the exported
    signature is ``(variables, x_lr_nchw, seed) → y_nchw`` with a symbolic
    batch dim — ``seed`` (int32 vector, one per sample) drives the
    x1 ~ N(0, σ(1)²) init so fixed-seed results are reproducible across
    the artifact boundary. The init is PER SAMPLE (vmapped key → noise):
    row ``i`` of a batched call draws the exact noise of the B=1 call
    with ``seed[i]``, which is what lets the serving daemon coalesce concurrent
    super_resolve requests without touching their per-request seeds
    (manifest ``extra_args: ["seed:int32[b]"]``; pre-round-4 artifacts
    carried a scalar ``seed:int32`` baked into the whole batch and stay
    loadable but never coalesce).

    ``latent_stats``: optional (mean[C], std[C]) per-latent-channel stats
    (the Sen2NAIP HR-stats normalization, sen2naip.py:634-643); identity
    when omitted — then the pipeline composes exactly like the in-repo
    benchmark chain.

    ``params_dtype``: optional storage dtype for float parameter leaves
    (both trees), same semantics as :func:`export_model` — BN stats,
    latent_norm, and quantization scales stay fp32.

    ``denoiser_policy``: REQUIRED when ``model.policy`` is int8 — the
    policy the denoiser's UNet was built with. The prequant conv dispatch
    only fires under ``conv_algorithm == "int8"``; quantizing ``sr_params``
    for a denoiser built with any other policy would bake raw int8 values
    into plain nn.Conv math (silently wrong output). cli/export builds the
    denoiser with ``model.policy`` and passes it here.
    """
    import numpy as np
    from jax import export as jexport

    from eovax.data.sen2naip import SEN2NAIP_WVS
    from eovax.models.sr_diffusion import make_sampler
    from eovax.utils.checkpoint import save_variables

    os.makedirs(out_dir, exist_ok=True)
    # Fail fast on a bad sampler name BEFORE quantizing/casting trees and
    # writing the (potentially multi-GB) params.msgpack.
    sampler_obj = make_sampler(sampler, denoiser, steps=steps)
    core = model.core
    z_ch = model.config.encoder.z_channels
    factor = 2 ** (len(model.config.encoder.ch_mult) - 1)
    latent_hw = resolution // factor
    wvs_arr = jnp.asarray(SEN2NAIP_WVS if wvs is None else wvs, jnp.float32)
    if latent_stats is None:
        mean = jnp.zeros((z_ch,), jnp.float32)
        std = jnp.ones((z_ch,), jnp.float32)
    else:
        mean = jnp.asarray(latent_stats[0], jnp.float32).reshape(-1)
        std = jnp.asarray(latent_stats[1], jnp.float32).reshape(-1)

    vae_variables = model.variables
    quantized = 0
    if getattr(model.policy, "conv_algorithm", None) == "int8":
        # Same export-time quantization as export_model, applied to BOTH
        # trees: the VAE body convs and the UNet _TimeResBlock convs
        # (down/up_i_block_j and mid_block_k scopes share the
        # policy_conv3x3 dispatch).
        if getattr(denoiser_policy, "conv_algorithm", None) != "int8":
            raise ValueError(
                "int8 SR export: the denoiser must have been built with "
                "the same int8 policy, and denoiser_policy=<that policy> "
                "must be passed to confirm it — quantized UNet kernels "
                "under any other policy are applied as raw numbers by "
                "plain nn.Conv (silently wrong output). cli/export "
                "builds the denoiser with policy=model.policy and "
                "forwards it."
            )
        from eovax.kernels.qconv import quantize_params_int8

        qvae, n_vae = quantize_params_int8(vae_variables["params"])
        sr_params, n_sr = quantize_params_int8(sr_params)
        vae_variables = dict(vae_variables)
        vae_variables["params"] = qvae
        quantized = n_vae + n_sr
    if params_dtype is not None:
        vae_variables = dict(vae_variables)
        vae_variables["params"] = _cast_float_params(
            vae_variables["params"], params_dtype
        )
        sr_params = _cast_float_params(sr_params, params_dtype)

    variables = {
        "vae": vae_variables,
        "sr": sr_params,
        "latent_norm": {"mean": mean, "std": std},
    }
    save_variables(os.path.join(out_dir, _PARAMS), variables)
    var_shapes = jax.tree_util.tree_map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), variables
    )

    enc = getattr(type(core), "encode_spatial_normalized")
    dec = getattr(type(core), "decode_spatial_normalized")

    def sr_fn(variables, x_lr, seed):
        # Core methods are NHWC→NHWC; NCHW only at the artifact boundary.
        m = variables["latent_norm"]["mean"].reshape(1, 1, 1, -1)
        s = variables["latent_norm"]["std"].reshape(1, 1, 1, -1)
        x = jnp.transpose(x_lr, (0, 2, 3, 1))  # NCHW → NHWC
        z_lr = core.apply(variables["vae"], x, wvs_arr, method=enc)
        cond = (z_lr - m) / s  # latent NHWC
        # Per-sample noise: row i depends only on seed[i], so a coalesced
        # batch reproduces each request's B=1 result bitwise (vmap of a
        # jax.random op is per-example-identical by construction).
        keys = jax.vmap(jax.random.PRNGKey)(seed)
        x1 = jax.vmap(lambda k, c: sampler_obj.init(k, c.shape))(keys, cond)
        z_hr = sampler_obj(variables["sr"], x1, cond=cond) * s + m
        y = core.apply(variables["vae"], z_hr, wvs_arr, method=dec)
        return jnp.transpose(y, (0, 3, 1, 2))

    (b,) = jexport.symbolic_shape("b")
    in_shape = (b, len(np.asarray(wvs_arr)), resolution, resolution)
    exp = jexport.export(jax.jit(sr_fn))(
        var_shapes,
        jax.ShapeDtypeStruct(in_shape, jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    fname = "super_resolve.stablehlo"
    with open(os.path.join(out_dir, fname), "wb") as f:
        f.write(exp.serialize())
    manifest = {
        "format": "eovax-serving-v1",
        "resolution": resolution,
        "params": _PARAMS,
        "pipeline": "sr",
        "sampler": sampler,
        "steps": steps,
        "ddim_steps": steps,  # back-compat alias; prefer "steps"
        "wvs": [float(v) for v in np.asarray(wvs_arr)],
        "functions": {
            "super_resolve": {
                "file": fname,
                "modality": "SEN2NAIP",
                "input_shape": ["b"] + [int(d) for d in in_shape[1:]],
                "dtype": "float32",
                "extra_args": ["seed:int32[b]"],
            }
        },
    }
    if quantized:
        manifest["quantization"] = _quant_manifest(quantized)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServedModel:
    """Runs an exported artifact — no eovax model code involved beyond the
    weights codec. Functions lazily deserialize on first use.

    Multi-chip: ``served.with_mesh(make_mesh())`` returns a view that runs
    every call data-parallel over the mesh — params replicated once,
    batches sharded on axis 0, the exported StableHLO function executed
    inside jit (exported functions are traceable; XLA partitions them like
    any other computation). Results match the single-device path within
    bf16 tolerance (partitioning reorders reductions/fusions; verified at
    2e-5 in tests/test_serving.py)."""

    #: modality the convenience methods default to when the caller passes
    #: none — the flagship 12-band Sentinel-2 L2A surface. The HTTP layer
    #: resolves its per-request default from this same constant so API and
    #: daemon behavior can't drift.
    DEFAULT_MODALITY = "S2L2A"

    def __init__(self, out_dir: str, manifest: dict, variables: Any, mesh=None):
        self._dir = out_dir
        self._manifest = manifest
        self._variables = variables
        self._fns: dict[str, Any] = {}
        self._mesh = mesh
        # jit-wrapped exported calls, keyed like _fns. Exported.call
        # re-lowers/compiles on EVERY invocation; jax.jit around it gives
        # the compile cache (both single-device and mesh paths).
        self._jit_calls: dict[str, Any] = {}

    def with_mesh(self, mesh) -> "ServedModel":
        """Data-parallel serving view over a 1-D `jax.sharding.Mesh`
        (any axis name — the batch shards over the mesh's single axis)."""
        from eovax.parallel.mesh import replicate

        if len(mesh.axis_names) != 1:
            raise ValueError(f"with_mesh expects a 1-D mesh, got {mesh.axis_names}")
        view = ServedModel(
            self._dir, self._manifest, replicate(self._variables, mesh), mesh=mesh
        )
        view._fns = self._fns  # share deserialized functions
        return view

    @classmethod
    def load(cls, out_dir: str, template_variables: Any | None = None) -> "ServedModel":
        """``template_variables``: a matching variables pytree used as the
        msgpack decode template; omit to use the raw-msgpack structure."""
        with open(os.path.join(out_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        import flax.serialization

        with open(os.path.join(out_dir, manifest["params"]), "rb") as f:
            raw = f.read()
        if template_variables is not None:
            variables = flax.serialization.from_bytes(template_variables, raw)
        else:
            variables = flax.serialization.msgpack_restore(raw)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return cls(out_dir, manifest, variables)

    @property
    def modalities(self) -> list[str]:
        return sorted({v["modality"] for v in self._manifest["functions"].values()})

    def _entry(self, name: str, modality: str | None) -> tuple[str, dict]:
        """(manifest key, manifest entry) for a function — THE lookup and
        THE KeyError. input_shape (pre-dispatch validation) and _fn (the
        dispatch) must raise byte-identical messages or the daemon's 404
        bodies desynchronize between the two paths."""
        key = name if modality is None else f"{name}.{modality}"
        entry = self._manifest["functions"].get(key)
        if entry is None:
            raise KeyError(
                f"{key!r} not in artifact (have {sorted(self._manifest['functions'])})"
            )
        return key, entry

    def _fn(self, name: str, modality: str | None = None):
        from jax import export as jexport

        key = name if modality is None else f"{name}.{modality}"
        if key not in self._fns:
            _, entry = self._entry(name, modality)
            with open(os.path.join(self._dir, entry["file"]), "rb") as f:
                self._fns[key] = jexport.deserialize(f.read())
        return self._fns[key]

    def input_shape(self, name: str, modality: str | None = None) -> tuple:
        """Per-sample input shape (batch dim excluded) the artifact expects
        for ``name`` — the manifest's ``input_shape`` with the symbolic "b"
        stripped. Raises ``KeyError`` for a function/modality not in this
        artifact (same error the call itself would raise, but before any
        payload is staged). The serving daemon uses this to reject
        wrong-shape payloads as 400s instead of letting them surface as
        device-call failures."""
        _, entry = self._entry(name, modality)
        return tuple(int(d) for d in entry["input_shape"][1:])

    def _jit(self, name: str, modality: str | None = None):
        key = name if modality is None else f"{name}.{modality}"
        if key not in self._jit_calls:
            self._jit_calls[key] = jax.jit(self._fn(name, modality).call)
        return self._jit_calls[key]

    def _call(self, name: str, x, modality: str):
        fn = self._jit(name, modality)
        x = jnp.asarray(x, jnp.float32)
        if self._mesh is None:
            return fn(self._variables, x)
        from eovax.parallel.mesh import batch_sharding, replicated_sharding

        axis = self._mesh.axis_names[0]
        if x.shape[0] % self._mesh.shape[axis] == 0:
            x = jax.device_put(x, batch_sharding(self._mesh, axis))
        else:
            # replicate — leaving x committed elsewhere would clash with
            # the mesh-committed params inside jit
            x = jax.device_put(x, replicated_sharding(self._mesh))
        return fn(self._variables, x)

    def reconstruct(self, x, modality: str = DEFAULT_MODALITY):
        return self._call("reconstruct", x, modality)

    def encode_spatial_normalized(self, x, modality: str = DEFAULT_MODALITY):
        return self._call("encode_spatial_normalized", x, modality)

    def decode_spatial_normalized(self, z, modality: str = DEFAULT_MODALITY):
        return self._call("decode_spatial_normalized", z, modality)

    def per_sample_seed(self, name: str = "super_resolve") -> bool:
        """True when ``name`` takes a per-sample int32 seed VECTOR
        (round-4 SR exports, ``extra_args: ["seed:int32[b]"]``) rather
        than one scalar baked into the whole batch. Per-sample seeds are
        what make the function safe to micro-batch: coalescing cannot
        change any request's noise draw. False for functions without a
        seed arg and for pre-round-4 scalar-seed artifacts."""
        entry = self._manifest["functions"].get(name)
        return entry is not None and "seed:int32[b]" in entry.get(
            "extra_args", ())

    def batchable(self, name: str) -> bool:
        """May the serving daemon coalesce concurrent ``name`` requests
        into one device call? Static rule (batching.NON_BATCHABLE)
        relaxed by the artifact capability: a per-sample-seed
        super_resolve batches safely."""
        from eovax.serving.batching import NON_BATCHABLE

        return name not in NON_BATCHABLE or self.per_sample_seed(name)

    def super_resolve(self, x, seed=0):
        """Run an exported SR-pipeline artifact (encode → DDIM → decode;
        :func:`export_sr_pipeline`). ``seed`` pins the x1 noise draw:
        an int is expanded to :func:`per_sample_seeds` (sample ``i`` ≡
        the B=1 call with ``seed+i``); a length-B int sequence pins each
        sample's draw directly. Pre-round-4 artifacts baked one scalar
        seed into the whole batch and accept only an int."""
        import numpy as np

        fn = self._jit("super_resolve")
        x = jnp.asarray(x, jnp.float32)
        if self.per_sample_seed():
            seeds = (per_sample_seeds(int(seed), x.shape[0])
                     if np.ndim(seed) == 0 else
                     np.asarray(seed, np.int32).reshape(-1))
            if seeds.shape[0] != x.shape[0]:
                raise ValueError(
                    f"need one seed per sample: got {seeds.shape[0]} "
                    f"seeds for batch {x.shape[0]}")
            seed_arr = jnp.asarray(seeds, jnp.int32)
        else:
            if np.ndim(seed) != 0:
                raise ValueError(
                    "this artifact predates per-sample seeds (manifest "
                    "extra_args 'seed:int32'): its one scalar seed is "
                    "baked into the whole batch — re-export with the "
                    "current eovax for per-sample seed vectors")
            seed_arr = jnp.asarray(seed, jnp.int32)
        if self._mesh is None:
            return fn(self._variables, x, seed_arr)
        from eovax.parallel.mesh import batch_sharding, replicated_sharding

        axis = self._mesh.axis_names[0]
        sharded = x.shape[0] % self._mesh.shape[axis] == 0
        x = jax.device_put(
            x, batch_sharding(self._mesh, axis) if sharded
            else replicated_sharding(self._mesh))
        # a per-sample seed vector is batch state — shard it with x
        seed_arr = jax.device_put(
            seed_arr, batch_sharding(self._mesh, axis)
            if sharded and seed_arr.ndim == 1
            else replicated_sharding(self._mesh))
        return fn(self._variables, x, seed_arr)
