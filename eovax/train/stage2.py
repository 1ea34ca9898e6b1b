"""Stage 2 — multi-modal VAE finetuning (the reference's `train.py` flow).

TPU-native re-design of EOFluxVAE.training_step/validation_step/
configure_optimizers (/root/reference/eo_vae/models/new_autoencoder.py:
549-712) and the Trainer wiring of /root/reference/train.py:65-174.

Design:
- One **jit-compiled train step per (modality, EQ-mode) combination** —
  modality changes the channel count, EQ-VAE scale changes the recon shape,
  so each is a separate executable (4 modalities × ≤5 modes, all cached).
  The per-step mode roll (p_prior / p_prior_s, new_autoencoder.py:600-631)
  happens host-side with Python RNG, matching the reference's use of
  `random` — the device never sees data-dependent control flow.
- Parameters replicated, batch sharded on the ``data`` mesh axis; XLA
  emits the gradient all-reduce over ICI (eovax.parallel). Latent-BN batch
  stats are computed over the **global** batch (sync-BN; SURVEY.md §5).
- Optimizer: Adam + the reference's cosine-warmup schedule, gradient
  clipping *before* Adam (matching clip_grad_norm_ → opt.step order,
  new_autoencoder.py:648-653). ``freeze_body`` masks everything except the
  dynamic stems (new_autoencoder.py:274-293).
- Optional adversarial branch (EOPatchLoss + DynamicPatchGAN) with the
  generator/discriminator alternation of new_autoencoder.py:633-682.
- bf16 compute policy by default ("16-mixed" equivalent); losses keep
  fp32 islands internally.
"""

from __future__ import annotations

import dataclasses
import random
import time
from typing import Any, Callable, Iterator

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from eovax.core.config import VAEConfig
from eovax.models.backbone import EOVAECore
from eovax.parallel.mesh import local_numpy, make_mesh, place_batch, replicate
from eovax.train.schedule import STAGE2_STEPS_PER_EPOCH, cosine_warmup_schedule
from eovax.utils.resize import resize_nhwc

SCALE_BINS = (0.375, 0.5, 0.75)  # new_autoencoder.py:601


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    disc_params: Any = None
    disc_opt_state: Any = None


def _freeze_mask(params, freeze_body: bool):
    """Trainable-param labels: with freeze_body only the dynamic stems train
    (new_autoencoder.py:274-293)."""

    def label(path, _):
        if not freeze_body:
            return "train"
        keys = [getattr(p, "key", None) for p in path]
        if ("encoder" in keys and "conv_in" in keys) or (
            "decoder" in keys and "conv_out" in keys
        ):
            return "train"
        return "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    cfg: VAEConfig, total_steps: int | None = None, accumulate_steps: int = 1
):
    """Adam + cosine warmup + global-norm clip, mirroring
    configure_optimizers (new_autoencoder.py:549-585). ``accumulate_steps``
    wraps in optax.MultiSteps (the reference's commented-out
    accumulate_grad_batches, configs/eo-vae.yaml:86)."""
    if all(
        v is not None for v in (cfg.final_lr, cfg.warmup_epochs, cfg.decay_end_epoch)
    ):
        schedule = cosine_warmup_schedule(
            cfg.base_lr,
            cfg.final_lr,
            cfg.warmup_epochs * STAGE2_STEPS_PER_EPOCH,
            (total_steps or cfg.decay_end_epoch * STAGE2_STEPS_PER_EPOCH),
        )
    else:
        schedule = cfg.base_lr
    chain = []
    if cfg.clip_grad:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    chain.append(optax.adam(schedule))
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx, schedule


def make_train_step(
    core: EOVAECore,
    loss_obj,
    tx,
    cfg: VAEConfig,
    *,
    schedule=None,
):
    """Build the jitted generator train step (non-adversarial losses).

    Returned fn signature:
        step_fn(state, image_nhwc, wvs, rng, *, scale=None, angle=None)
        → (new_state, logs)
    scale/angle are static (host-rolled EQ-VAE mode).
    """
    freeze_body = cfg.freeze_body

    def train_step(state, image, wvs, rng, *, scale=None, angle=None):
        mask = _freeze_mask(state.params, freeze_body)
        rng, drop_key = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (recon, posterior), mutated = core.apply(
                variables,
                image,
                wvs,
                rng=rng,
                sample_posterior=cfg.sample_posterior,
                scale=scale,
                angle=angle,
                train=True,
                latent_noise_p=cfg.latent_noise_p,
                noise_tau=cfg.noise_tau,
                method=EOVAECore.forward,
                mutable=["batch_stats"],
                # "dropout" RNG = torch train mode for the stem weight
                # generators that carry dropout (factorized/multi-stage);
                # eval/inference applies omit it → deterministic.
                rngs={"dropout": drop_key},
            )
            target = _eqvae_target(image, recon, scale, angle)
            loss, logs = loss_obj(
                target, wvs, recon, global_step=state.step, split="train"
            )
            return loss, (logs, mutated["batch_stats"])

        (loss, (logs, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = _mask_grads(grads, mask, freeze_body)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        logs["train/grad_norm"] = optax.global_norm(grads)
        if schedule is not None and callable(schedule):
            logs["train/lr"] = schedule(state.step)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, logs

    return train_step


def _eqvae_target(image, recon, scale, angle):
    """Area-downscale (+ rotate) inputs to the recon geometry
    (new_autoencoder.py:605-627)."""
    target = image
    if scale is not None:
        target = resize_nhwc(target, recon.shape[1:3], mode="area")
    if angle is not None:
        target = jnp.rot90(target, k=angle, axes=(2, 1))
    return jax.lax.stop_gradient(target)


def _mask_grads(grads, mask, freeze_body):
    if not freeze_body:
        return grads
    return jax.tree_util.tree_map(
        lambda g, m: g if m == "train" else jnp.zeros_like(g), grads, mask
    )


def make_adversarial_steps(
    core: EOVAECore,
    loss_obj,
    tx,
    disc_tx,
    cfg: VAEConfig,
    *,
    schedule=None,
    disc_module=None,
):
    """Generator/discriminator alternation (new_autoencoder.py:633-682).

    The generator step runs `forward_gan` to expose the decoder penultimate
    + generated output stem, enabling the adaptive weight's kernel-space
    gradients; it returns the (stop-gradient) reconstruction for the
    discriminator step. Discriminator updates its own Adam state; spectral
    norm power-iteration stats update once per disc step.
    """
    from eovax.nn.dynamic_conv import apply_dynamic_kernel

    freeze_body = cfg.freeze_body

    def gen_step(state, image, wvs, rng, *, scale=None, angle=None):
        mask = _freeze_mask(state.params, freeze_body)
        rng, drop_key = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (recon, posterior, h_pre, kernel, bias), mutated = core.apply(
                variables,
                image,
                wvs,
                rng=rng,
                # cfg-respecting like the plain step (:131): deterministic
                # goldens pin sample_posterior=False; training default True.
                sample_posterior=cfg.sample_posterior,
                scale=scale,
                angle=angle,
                train=True,
                latent_noise_p=cfg.latent_noise_p,
                noise_tau=cfg.noise_tau,
                method=EOVAECore.forward_gan,
                mutable=["batch_stats"],
                rngs={"dropout": drop_key},  # torch train-mode dropout
            )
            target = _eqvae_target(image, recon, scale, angle)
            h_sg = jax.lax.stop_gradient(h_pre)
            if kernel is None:
                # Static decoder (legacy AutoencoderKL): the output stem is a
                # plain conv param (adaptive weight w.r.t. conv_out.weight,
                # autoencoder.py semantics).
                kernel = params["decoder"]["conv_out"]["kernel"]
                bias = params["decoder"]["conv_out"]["bias"]
            b_sg = jax.lax.stop_gradient(bias)

            def recon_fn(k):
                return apply_dynamic_kernel(h_sg, k, b_sg, policy=core.policy)

            loss, logs = loss_obj.generator_loss(
                state.disc_params,
                target,
                wvs,
                recon,
                global_step=state.step,
                kernel_closure=(recon_fn, kernel),
                split="train",
            )
            return loss, (logs, mutated["batch_stats"], recon, target)

        (loss, (logs, new_bs, recon, target)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = _mask_grads(grads, mask, freeze_body)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        logs["train/grad_norm"] = optax.global_norm(grads)
        if schedule is not None and callable(schedule):
            logs["train/lr"] = schedule(state.step)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, logs, jax.lax.stop_gradient(recon), target

    def disc_step(state, target, wvs, recon):
        disc_vars = state.disc_params
        # Spectral-norm power-iteration update, once per disc step (torch
        # updates u on every train-mode forward).
        if disc_module is not None and "spectral_stats" in disc_vars:
            _, upd = disc_module.apply(
                disc_vars, recon, wvs, update_sn=True, mutable=["spectral_stats"]
            )
            disc_vars = {**disc_vars, **upd}

        def loss_fn(dparams):
            dv = dict(disc_vars)
            dv["params"] = dparams
            return loss_obj.discriminator_loss(dv, target, wvs, recon, split="train")

        (d_loss, logs), dgrads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_vars["params"]
        )
        updates, new_opt = disc_tx.update(
            dgrads, state.disc_opt_state, disc_vars["params"]
        )
        new_dparams = optax.apply_updates(disc_vars["params"], updates)
        new_disc_vars = dict(disc_vars)
        new_disc_vars["params"] = new_dparams
        return (
            state.replace(disc_params=new_disc_vars, disc_opt_state=new_opt),
            logs,
        )

    return gen_step, disc_step


def _resolve_image(image):
    """Expand a device_prep collate batch inside the step jit.

    ``device_prep=True`` collate mode ships the batch as a ``(raw, mean,
    std, clip, d4)`` tuple of placed arrays (eovax/data/device_prep.py);
    resolving it at trace time means normalize + D4 run fused into the
    step program — zero extra dispatches, and the normalize folds into the
    first stem conv. Host-collated batches pass through untouched."""
    if isinstance(image, tuple):
        from eovax.data.device_prep import device_prepare

        return device_prepare(*image)
    return image


def make_eval_step(core: EOVAECore, loss_obj):
    """Validation step (new_autoencoder.py:692-712): stochastic forward,
    loss in eval mode (no BN-stat updates)."""

    def eval_step(state, image, wvs, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        recon, _ = core.apply(
            variables, image, wvs, rng=rng, sample_posterior=True,
            method=EOVAECore.forward,
        )
        if hasattr(loss_obj, "generator_loss"):
            loss, logs = loss_obj.generator_loss(
                state.disc_params, image, wvs, recon,
                global_step=state.step, split="val",
            )
        else:
            loss, logs = loss_obj(
                image, wvs, recon, global_step=state.step, split="val"
            )
        return logs

    return eval_step


@dataclasses.dataclass
class Stage2Trainer:
    """Host-side training driver (the Lightning-Trainer replacement).

    Orchestrates: EQ-VAE mode rolls, per-(modality, mode) jit cache, data
    sharding onto the mesh, CSV/metric logging, orbax checkpoints, and the
    optional discriminator alternation.
    """

    model: Any  # EOFluxVAE wrapper (holds core + variables)
    loss_obj: Any
    cfg: VAEConfig
    max_steps: int = 1000
    val_every: int = 0
    ckpt_dir: str | None = None
    ckpt_every: int = 0
    # Lightning limit_val_batches equivalent (config trainer section).
    val_max_batches: int = 100
    # Monitored-metric best checkpoint (reference ModelCheckpoint(
    # monitor='val/loss_rec', save_top_k=1), train.py:155-162). Saved to
    # ckpt_dir/best whenever validate() improves on the stored best.
    monitor: str = "val/loss_rec"
    mesh: Any = None
    log_every: int = 100
    logger: Any = None
    discriminator: Any = None  # flax module; required for adversarial losses
    seed_disc_stem: bool = False  # copy encoder conv_in → disc dynamic_input
    image_logger: Any = None  # utils.image_logger.ImageLogger (val batch 0)
    norm_scheme: str = "legacy"  # display denormalization for image grids
    accumulate_steps: int = 1
    seed: int = 0

    def __post_init__(self):
        self.mesh = self.mesh or make_mesh()
        self.tx, self.schedule = make_optimizer(
            self.cfg, total_steps=self.max_steps,
            accumulate_steps=self.accumulate_steps,
        )
        core = self.model.core
        self.adversarial = hasattr(self.loss_obj, "generator_loss")
        if self.adversarial:
            if self.discriminator is None:
                raise ValueError("adversarial loss requires a discriminator module")
            # Same base lr for the disc optimizer (new_autoencoder.py:562-565).
            self.disc_tx = optax.adam(self.cfg.base_lr)
            self._gen_step, self._disc_step = make_adversarial_steps(
                core, self.loss_obj, self.tx, self.disc_tx, self.cfg,
                schedule=self.schedule, disc_module=self.discriminator,
            )
        else:
            self.disc_tx = None
            self._train_step = make_train_step(
                core, self.loss_obj, self.tx, self.cfg, schedule=self.schedule
            )
        self._eval_step = make_eval_step(core, self.loss_obj)
        self._jit_cache: dict[Any, Any] = {}
        self._desc_cache: dict[str, Any] = {}  # device_prep: placed wvs per modality
        self._rng = random.Random(self.seed)
        self._key = jax.random.PRNGKey(self.seed)

    # -- state ---------------------------------------------------------------

    def init_state(self) -> TrainState:
        variables = self.model.variables
        # Copy so train-step buffer donation can't invalidate the wrapper's
        # own variables.
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        batch_stats = jax.tree_util.tree_map(
            jnp.copy, variables.get("batch_stats", {})
        )
        disc_params = None
        disc_opt_state = None
        if self.adversarial:
            cfg_e = self.cfg.encoder
            res = min(cfg_e.resolution, 64)
            dummy = jnp.zeros((1, res, res, cfg_e.in_channels), jnp.float32)
            dummy_wvs = jnp.linspace(0.4, 2.5, cfg_e.in_channels)
            disc_params = self.discriminator.init(
                jax.random.PRNGKey(self.seed + 1), dummy, dummy_wvs
            )
            if self.seed_disc_stem:
                # The reference injects the encoder's dynamic conv_in as the
                # discriminator input stem (train.py:109-117); we copy its
                # parameters into the owned stem.
                disc_p = dict(disc_params["params"])
                disc_p["dynamic_input"] = jax.tree_util.tree_map(
                    jnp.copy, params["encoder"]["conv_in"]
                )
                disc_params = {**disc_params, "params": disc_p}
            disc_opt_state = self.disc_tx.init(disc_params["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )
        return replicate(state, self.mesh)

    # -- jit dispatch ----------------------------------------------------------

    def _jitted(self, kind: str, scale=None, angle=None):
        key = (kind, scale, angle)
        fn = self._jit_cache.get(key)
        if fn is None:
            if kind == "train":
                step = self._gen_step if self.adversarial else self._train_step

                def fn_raw(state, image, wvs, rng):
                    return step(
                        state, _resolve_image(image), wvs, rng,
                        scale=scale, angle=angle,
                    )

                fn = jax.jit(fn_raw, donate_argnums=(0,))
            elif kind == "disc":
                fn = jax.jit(self._disc_step, donate_argnums=(0,))
            elif kind == "recon":
                core = self.model.core

                def recon_raw(state, image, wvs):
                    variables = {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                    }
                    recon, _ = core.apply(
                        variables, _resolve_image(image), wvs,
                        sample_posterior=False, method=EOVAECore.forward,
                    )
                    return recon

                fn = jax.jit(recon_raw)
            else:

                def eval_raw(state, image, wvs, rng):
                    return self._eval_step(state, _resolve_image(image), wvs, rng)

                fn = jax.jit(eval_raw)
            self._jit_cache[key] = fn
        return fn

    def _roll_mode(self):
        """Host-side EQ-VAE mode selection (new_autoencoder.py:600-631)."""
        scale = angle = None
        if self._rng.random() < self.cfg.p_prior:
            angle = self._rng.choice([1, 2, 3])
            scale = (
                (self._rng.choice(SCALE_BINS), self._rng.choice(SCALE_BINS))
                if self.cfg.anisotropic
                else self._rng.choice(SCALE_BINS)
            )
        elif self._rng.random() < self.cfg.p_prior_s:
            scale = self._rng.choice(SCALE_BINS)
        return scale, angle

    # -- loops -----------------------------------------------------------------

    def fit(
        self,
        train_iter: Iterator[dict],
        val_iter_factory: Callable[[], Iterator[dict]] | None = None,
        state: TrainState | None = None,
    ) -> TrainState:
        if state is None and self.ckpt_dir:
            # Auto-resume from the latest saved step (preemption recovery;
            # the reference's ModelCheckpoint(save_last=True) + manual
            # --ckpt flow, train.py:155-162).
            state = self.restore_checkpoint()
            if state is not None:
                print(f"[stage2] resumed from checkpoint at step {int(state.step)}")
        state = state if state is not None else self.init_state()
        t0 = time.time()
        global_step = int(state.step)  # resume-aware host-side counter
        from eovax.utils.preemption import PreemptionGuard

        # sync_every=10: multi-host flag agreement is a blocking
        # allgather — once per 10 steps bounds the stop latency
        # without a per-step host sync in the dispatch pipeline.
        with PreemptionGuard(sync_every=10) as guard:
            for i, batch in enumerate(train_iter):
                if global_step >= self.max_steps:
                    # max_steps is the GLOBAL training budget: a resumed run
                    # finishes the remaining steps rather than training
                    # max_steps more (the optimizer schedule was built with
                    # total_steps=max_steps).
                    break
                scale, angle = self._roll_mode()
                self._key, step_key = jax.random.split(self._key)
                sharded = self._place_prepared(batch)
                fn = self._jitted("train", scale, angle)
                if self.adversarial:
                    state, logs, recon, target = fn(
                        state, sharded["image"], sharded["wvs"], step_key
                    )
                    # Discriminator alternation gate (new_autoencoder.py:658-663).
                    disc_start = getattr(self.loss_obj, "disc_start",
                                         getattr(self.loss_obj, "disc_update_start_step", 0))
                    disc_weight = getattr(self.loss_obj, "disc_weight", 0.0)
                    if global_step >= disc_start and disc_weight > 0.0:
                        state, d_logs = self._jitted("disc")(
                            state, target, sharded["wvs"], recon
                        )
                        logs = {**logs, **d_logs}
                else:
                    state, logs = fn(state, sharded["image"], sharded["wvs"], step_key)

                global_step += 1
                if guard.should_stop(global_step):
                    # Preemption notice (SIGTERM). Checked BEFORE the
                    # periodic ckpt/validate blocks so post-signal work is
                    # bounded by one train step (an eviction grace window
                    # is ~30s); the tail save below makes THIS step the
                    # resume point.
                    print(f"[stage2] preemption signal — stopping at step "
                          f"{global_step} (checkpoint will be saved)")
                    break
                if self.log_every and (i + 1) % self.log_every == 0:
                    self._log(global_step, logs, t0, steps_this_run=i + 1)
                if self.ckpt_every and self.ckpt_dir and (i + 1) % self.ckpt_every == 0:
                    self.save_checkpoint(state)
                if self.val_every and val_iter_factory and (i + 1) % self.val_every == 0:
                    self.validate(state, val_iter_factory(), self.val_max_batches)
        if self.ckpt_dir:
            self.save_checkpoint(state)
            self._checkpointer.wait()  # flush pending async writes
        return state

    def _place_prepared(self, batch: dict) -> dict:
        """Place one host batch on the mesh. When the collate emitted a raw
        batch (``device_prep=True`` mode, eovax.data.device_prep), the
        "image" entry becomes the ``(raw, mean, std, clip, d4)`` tuple that
        :func:`_resolve_image` expands INSIDE the step jit — normalize + D4
        cost zero extra dispatches, XLA fuses the normalize into the first
        stem conv, and the raw int16 transfer is half the bytes of the
        host-collated fp32 batch. Host cost drops to the decode itself
        (scripts/bench_datapath.py: the numpy collate alone was 11 ms/img
        on one core).

        ``wvs`` (the one genuinely per-modality constant) is placed ONCE
        and cached; the per-sample descriptors ([B,C]/[B,2]/[B,3],
        eovax/data/device_prep.py) ride with the image at ~2 KB per step
        and shard along the batch axis — no host-invariance assumption.
        The "d4" leaf is structural: present iff the collate ran in train
        mode (eval batches omit it and skip the augment selects). Its
        presence must NOT depend on the drawn values — per-host draws
        would then give pod hosts different batch pytrees in the same
        step and divergent jitted programs (r4 review).

        Multi-host, the raw image is unified to fp32 before global
        assembly: the collate keeps the stored dtype (int16) when no
        resize was needed but emits fp32 when one was, and with
        heterogeneous stored tile sizes the two can coexist across hosts
        in ONE global array — mismatched local avals compile divergent
        step programs and hang. Uniform fp32 costs one cast pass per
        batch on hosts that kept int16 (~1.3 ms/img, many-core pods
        absorb it); the normalize + D4 stay on device either way.
        Single-process runs keep the int16 H2D fast path — there is no
        second program to diverge from."""
        if "norm_mean" not in batch:
            return place_batch(
                {"image": batch["image"], "wvs": batch["wvs"]}, self.mesh
            )
        modality = batch.get("modality", "?")
        wvs = self._desc_cache.get(modality)
        if wvs is None:
            wvs = place_batch({"wvs": batch["wvs"]}, self.mesh)["wvs"]
            self._desc_cache[modality] = wvs
        image = batch["image"]
        if jax.process_count() > 1 and image.dtype != np.float32:
            image = np.asarray(image, np.float32)
        per_step = {
            "image": image,
            "norm_mean": batch["norm_mean"],
            "norm_std": batch["norm_std"],
            "norm_clip": batch["norm_clip"],
        }
        if "d4" in batch:
            per_step["d4"] = batch["d4"]
        placed = place_batch(per_step, self.mesh)
        image = (
            placed["image"], placed["norm_mean"], placed["norm_std"],
            placed["norm_clip"],
        )
        if "d4" in placed:
            image = image + (placed["d4"],)
        return {"image": image, "wvs": wvs}

    def validate(self, state: TrainState, val_iter: Iterator[dict], max_batches: int = 100):
        fn = self._jitted("eval", None, None)
        agg: dict[str, list] = {}
        for i, batch in enumerate(val_iter):
            if i >= max_batches:
                break
            self._key, k = jax.random.split(self._key)
            sharded = self._place_prepared(batch)
            if i == 0 and self.image_logger is not None:
                # Reconstruction grid on val batch 0 (reference ImageLogger
                # callback, train.py:151-154 / image_logger.py:183-284).
                # Every process runs the (collective-free) recon program;
                # only process 0 materializes its local shards and writes —
                # device_get on a multi-host-sharded array would raise.
                recon = self._jitted("recon")(state, sharded["image"], sharded["wvs"])
                if jax.process_index() == 0:
                    img = sharded["image"]
                    if isinstance(img, tuple):
                        # device_prep mode: materialize the prepared batch
                        # once for the logging grid (val batch 0 only).
                        # Cached: a fresh jax.jit wrapper per validate
                        # would recompile every pass.
                        resolve = self._jit_cache.get("resolve")
                        if resolve is None:
                            resolve = jax.jit(_resolve_image)
                            self._jit_cache["resolve"] = resolve
                        img = resolve(img)
                    self.image_logger.log(
                        local_numpy(img),
                        local_numpy(recon),
                        modality=batch.get("modality", "S2RGB"),
                        norm_scheme=self.norm_scheme,
                        step=int(state.step),
                    )
            logs = fn(state, sharded["image"], sharded["wvs"], k)
            for name, v in logs.items():
                agg.setdefault(name, []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in agg.items()}
        if self.logger is not None and means:
            self.logger.log(int(state.step), means)
        if self.ckpt_dir and self.monitor and self.monitor in means:
            if self._checkpointer.save_best(
                int(state.step), state, means[self.monitor], monitor=self.monitor
            ):
                print(
                    f"[stage2] new best {self.monitor}={means[self.monitor]:.6g} "
                    f"at step {int(state.step)}"
                )
        return means

    # -- io ----------------------------------------------------------------------

    @property
    def _checkpointer(self):
        if getattr(self, "_ckptr", None) is None:
            from eovax.utils.checkpoint import TrainCheckpointer

            self._ckptr = TrainCheckpointer(self.ckpt_dir)
        return self._ckptr

    def save_checkpoint(self, state: TrainState):
        """Async step-managed save: blocks only for the device→host copy;
        disk persistence overlaps the next train steps."""
        self._checkpointer.save(int(state.step), state)

    def restore_checkpoint(self) -> TrainState | None:
        """Restore the latest saved step (None if the dir is empty)."""
        template = jax.device_get(self.init_state())
        restored = self._checkpointer.restore_latest(template)
        if restored is None:
            return None
        return replicate(restored, self.mesh)

    def restore_best(self) -> TrainState | None:
        """Best-by-monitored-metric state (None if validate never saved
        one) — the reference's best-`val/loss_rec` checkpoint."""
        template = jax.device_get(self.init_state())
        restored = self._checkpointer.restore_best(template)
        if restored is None:
            return None
        return replicate(restored, self.mesh)

    def _log(self, step: int, logs: dict, t0: float, steps_this_run: int | None = None):
        scalars = {k: float(v) for k, v in logs.items()}
        # Rate over THIS run only — `step` is the resume-aware global step
        # and would inflate the rate after a preemption recovery.
        scalars["train/steps_per_sec"] = (
            (steps_this_run if steps_this_run is not None else step)
            / max(time.time() - t0, 1e-9)
        )
        if self.logger is not None:
            self.logger.log(step, scalars)
        else:
            msg = ", ".join(f"{k}={v:.4g}" for k, v in sorted(scalars.items()))
            print(f"[stage2 step {step}] {msg}")

    def export_variables(self, state: TrainState) -> dict:
        return {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
