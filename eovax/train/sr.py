"""Stage 3 — latent-diffusion super-resolution training.

Re-design of DiffusionSuperRes (/root/reference/eo_vae/models/super_res.py:
39-198) + the train_super_res.py driver: train a conditional denoiser on
(lr_latent → hr_latent) pairs with t ~ U(0,1) per sample; validate by full
DDIM sampling and MSE against the HR latent.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Iterator

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from eovax.models.sr_diffusion import make_sampler
from eovax.parallel.mesh import local_numpy, make_mesh, place_batch, replicate
from eovax.train.schedule import SR_STEPS_PER_EPOCH, cosine_warmup_schedule


class SRTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


@dataclasses.dataclass
class DiffusionSuperRes:
    """Host-side stage-3 trainer.

    Args mirror super_res.py:42-75: a denoiser (SimpleDenoiser/
    KarrasDenoiser over a UNet), a sampler factory (DDIM steps=50), and
    the reference cosine-warmup hyperparameters (steps_per_epoch=152,
    super_res.py:175).
    """

    denoiser: Any
    init_params: Any
    sampler_steps: int = 50
    # "ddim" (reference parity) or "dpm++2m" (second-order multistep —
    # comparable quality at ~half the steps; no reference counterpart).
    sampler_type: str = "ddim"
    base_lr: float = 1e-4
    final_lr: float | None = None
    warmup_epochs: int | None = None
    decay_end_epoch: int | None = None
    grad_clip: float | None = 1.0  # trainer.gradient_clip_val (eo_vae_latent.yaml:20)
    mesh: Any = None
    log_every: int = 20
    logger: Any = None
    image_logger: Any = None  # utils.image_logger.SuperResImageLogger
    # Durability (reference ModelCheckpoint(monitor='val_mse', save_top_k=1)
    # + save_last resume, /root/reference/train_super_res.py:65-78): orbax
    # step checkpoints every ckpt_every steps under ckpt_dir, auto-resume
    # from the latest on fit(), best-by-val_mse under ckpt_dir/best.
    ckpt_dir: str | None = None
    ckpt_every: int = 0
    # Lightning limit_val_batches equivalent (config trainer section).
    val_max_batches: int = 10
    monitor: str = "val_mse"
    seed: int = 0

    def __post_init__(self):
        self.mesh = self.mesh or make_mesh()
        self._sample_jits: dict = {}  # per sample-tail-shape jitted samplers
        if all(
            v is not None
            for v in (self.final_lr, self.warmup_epochs, self.decay_end_epoch)
        ):
            self.schedule = cosine_warmup_schedule(
                self.base_lr,
                self.final_lr,
                self.warmup_epochs * SR_STEPS_PER_EPOCH,
                self.decay_end_epoch * SR_STEPS_PER_EPOCH,
            )
        else:
            self.schedule = self.base_lr
        chain = []
        if self.grad_clip:
            chain.append(optax.clip_by_global_norm(self.grad_clip))
        chain.append(optax.adam(self.schedule))
        self.tx = optax.chain(*chain)
        self.sampler = make_sampler(
            self.sampler_type, self.denoiser, steps=self.sampler_steps
        )
        self._key = jax.random.PRNGKey(self.seed)

        denoiser = self.denoiser
        tx = self.tx
        schedule = self.schedule

        # Donate the in-state: params/opt_state buffers are dead after the
        # update, so XLA reuses them in place (same as stage2's train jit).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, hr, lr_cond, rng):
            t_key, n_key = jax.random.split(rng)
            t = jax.random.uniform(t_key, (hr.shape[0],))

            def loss_fn(params):
                return denoiser.loss(params, n_key, hr, t, cond=lr_cond)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            logs = {"train_loss": loss}
            if callable(schedule):
                # LearningRateMonitor equivalent (train_super_res.py:77).
                logs["lr"] = schedule(state.step)
            return (
                state.replace(step=state.step + 1, params=params, opt_state=opt_state),
                logs,
            )

        @jax.jit
        def val_step(state, hr, lr_cond, rng):
            x1 = self.sampler.init(rng, hr.shape)
            x0 = self.sampler(state.params, x1, cond=lr_cond)
            return jnp.mean((x0 - hr.astype(jnp.float32)) ** 2)

        self._train_step = train_step
        self._val_step = val_step

    def init_state(self) -> SRTrainState:
        params = jax.tree_util.tree_map(jnp.copy, self.init_params)
        state = SRTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )
        return replicate(state, self.mesh)

    def fit(
        self,
        train_iter: Iterator[dict],
        val_iter_factory: Callable[[], Iterator[dict]] | None = None,
        max_steps: int = 1000,
        val_every: int = 0,
        state: SRTrainState | None = None,
    ) -> SRTrainState:
        if state is None and self.ckpt_dir:
            # Auto-resume from the latest saved step (preemption recovery —
            # the reference's ModelCheckpoint(save_last=True) + manual
            # --ckpt flow, train_super_res.py:65-78).
            state = self.restore_checkpoint()
            if state is not None:
                print(f"[sr] resumed from checkpoint at step {int(state.step)}")
        state = state if state is not None else self.init_state()
        t0 = time.time()
        # Host-side resume-aware counter (fetching state.step per iteration
        # would force a device sync inside the dispatch pipeline).
        global_step = int(state.step)
        from eovax.utils.preemption import PreemptionGuard

        # sync_every=10: multi-host flag agreement is a blocking
        # allgather — once per 10 steps bounds the stop latency
        # without a per-step host sync in the dispatch pipeline.
        with PreemptionGuard(sync_every=10) as guard:
            for i, batch in enumerate(train_iter):
                # Global budget: a state resumed at step N trains the
                # remaining max_steps − N steps, not max_steps more.
                if global_step >= max_steps:
                    break
                self._key, k = jax.random.split(self._key)
                sharded = place_batch(
                    {"hr": batch["image_hr"], "lr": batch["image_lr"]}, self.mesh
                )
                state, logs = self._train_step(
                    state, sharded["hr"], sharded["lr"], k
                )
                global_step += 1
                if guard.should_stop(global_step):
                    # Preemption notice (SIGTERM). Checked BEFORE the
                    # periodic ckpt/validate blocks so post-signal work is
                    # bounded by one train step; the tail save below makes
                    # THIS step the resume point.
                    print(f"[sr] preemption signal — stopping at step "
                          f"{global_step} (checkpoint will be saved)")
                    break
                if self.log_every and (i + 1) % self.log_every == 0:
                    scalars = {k2: float(v) for k2, v in logs.items()}
                    # rate over this run; rows keyed by the resume-aware
                    # global step so a resumed run doesn't collide with the
                    # pre-preemption history.
                    scalars["steps_per_sec"] = (i + 1) / max(time.time() - t0, 1e-9)
                    if self.logger is not None:
                        self.logger.log(global_step, scalars)
                if self.ckpt_every and self.ckpt_dir and (i + 1) % self.ckpt_every == 0:
                    self.save_checkpoint(state)
                if val_every and val_iter_factory and (i + 1) % val_every == 0:
                    self.validate(state, val_iter_factory(), self.val_max_batches)
        if self.ckpt_dir:
            self.save_checkpoint(state)
            self._checkpointer.wait()  # flush pending async writes
        return state

    def validate(
        self, state: SRTrainState, val_iter: Iterator[dict], max_batches: int = 10
    ) -> dict:
        mses = []
        for i, batch in enumerate(val_iter):
            if i >= max_batches:
                break
            self._key, k = jax.random.split(self._key)
            sharded = place_batch(
                {"hr": batch["image_hr"], "lr": batch["image_lr"]}, self.mesh
            )
            if i == 0 and self.image_logger is not None:
                # LR | prediction | HR grid on val batch 0 (reference
                # super_res_image_logger.py:18-31). All processes run the
                # sampling program; only process 0 materializes its local
                # shards and writes (device_get on a multi-host-sharded
                # array raises).
                pred = self.sample(
                    state, sharded["hr"].shape, sharded["lr"], seed=self.seed
                )
                if jax.process_index() == 0:
                    self.image_logger.log(
                        local_numpy(sharded["lr"]),
                        local_numpy(pred),
                        local_numpy(sharded["hr"]),
                        step=int(state.step),
                    )
            mses.append(float(self._val_step(state, sharded["hr"], sharded["lr"], k)))
        result = {"val_mse": float(np.mean(mses))} if mses else {}
        if self.logger is not None and result:
            self.logger.log(int(state.step), result)
        if self.ckpt_dir and self.monitor and self.monitor in result:
            if self._checkpointer.save_best(
                int(state.step), state, result[self.monitor], monitor=self.monitor
            ):
                print(
                    f"[sr] new best {self.monitor}={result[self.monitor]:.6g} "
                    f"at step {int(state.step)}"
                )
        return result

    # -- io --------------------------------------------------------------------

    @property
    def _checkpointer(self):
        if getattr(self, "_ckptr", None) is None:
            from eovax.utils.checkpoint import TrainCheckpointer

            self._ckptr = TrainCheckpointer(self.ckpt_dir)
        return self._ckptr

    def save_checkpoint(self, state: SRTrainState) -> None:
        """Async step-managed save (blocks only for the device→host copy)."""
        self._checkpointer.save(int(state.step), state)

    def restore_checkpoint(self) -> SRTrainState | None:
        """Restore the latest saved step (None if the dir is empty)."""
        template = jax.device_get(self.init_state())
        restored = self._checkpointer.restore_latest(template)
        if restored is None:
            return None
        return replicate(restored, self.mesh)

    def restore_best(self) -> SRTrainState | None:
        """Best-by-``monitor`` state (None if validate never saved one) —
        ModelCheckpoint(monitor='val_mse', save_top_k=1) equivalent."""
        template = jax.device_get(self.init_state())
        restored = self._checkpointer.restore_best(template)
        if restored is None:
            return None
        return replicate(restored, self.mesh)

    def sample(self, state: SRTrainState, shape, cond, seed: int = 0) -> jax.Array:
        """Full DDIM sampling (super_res.py:146-158).

        The whole pass (incl. the x1 ~ N(0,1) init) runs inside one jit so
        it stays SPMD-valid when ``cond`` is a multi-host-sharded global
        array — an eagerly created host-local x1 of the global shape would
        fail to combine with non-addressable shards.
        """
        cond = jnp.asarray(cond)
        if cond.shape[0] != shape[0]:
            raise ValueError(
                f"sample batch mismatch: shape[0]={shape[0]} vs cond batch "
                f"{cond.shape[0]}"
            )
        tail = tuple(shape[1:])
        if tail not in self._sample_jits:
            def _sample(params, rng, cond, _tail=tail):
                x1 = self.sampler.init(rng, cond.shape[:1] + _tail)
                return self.sampler(params, x1, cond=cond)

            self._sample_jits[tail] = jax.jit(_sample)
        return self._sample_jits[tail](state.params, jax.random.PRNGKey(seed), cond)
