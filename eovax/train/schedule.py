"""LR schedules.

`cosine_warmup_schedule` replicates the reference's
get_cosine_schedule_with_warmup (new_autoencoder.py:36-56 / super_res.py:16-36)
exactly — including the absence of a clamp past `total_steps` (the cosine
keeps going, as in the reference's LambdaLR).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_schedule(
    base_lr: float,
    final_lr: float,
    warmup_steps: int,
    total_steps: int,
    num_cycles: float = 0.5,
):
    """Linear warmup → cosine decay from base_lr to final_lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps) * base_lr
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cosine_decay = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        decayed = (base_lr - final_lr) * cosine_decay + final_lr
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


#: The reference hard-codes steps_per_epoch when converting epoch-based
#: config to steps (new_autoencoder.py:569, super_res.py:175).
STAGE2_STEPS_PER_EPOCH = 2000
SR_STEPS_PER_EPOCH = 152
