"""Device-side batch preparation: z-score normalize + D4 augment on TPU.

The reference runs normalization and augmentation inside torch DataLoader
worker *processes* (terramesh_datamodule.py:305-369, 418-577) — cheap when
a host has dozens of cores. The TPU-native framing is the opposite: these
are elementwise / spatial-permutation ops, i.e. ~100 µs of HBM traffic for
a 50 MB batch on-device, vs ~11 ms/img of single-core numpy on the host
(measured, scripts/bench_datapath.py — the collate was 2.4× the cost of
the LZ4+zarr decode itself and left a 1.01× feed margin per core).

With ``device_prep`` collate mode (eovax.data.collate), the host emits the
raw decoded batch plus tiny normalization/augment descriptors, and the
trainer expands :func:`device_prepare` INSIDE the train/eval step jit
(``eovax.train.stage2._resolve_image``) — zero extra dispatches, the
normalize folds into the first stem conv, the op runs sharded on the batch
axis like every other step input, and the raw int16 H2D transfer is half
the bytes of a host-collated fp32 batch.

Every descriptor is PER-SAMPLE ([B,C] mean/std, [B,2] clip, [B,3] d4):
they shard along the batch axis exactly like the image, so on a multi-host
pod each host's samples carry that host's own values with no
"host-invariant" assumption to violate (a batch that needed a host-side
resize ships identity normalization while another host's ships the real
one — the descriptor VALUES are correct either way). The cost is ~2 KB
per step of extra H2D. Two things must still be host-invariant because
they are STRUCTURAL, and the trainer enforces both
(``stage2._place_prepared``): the presence of the "d4" leaf (decided by
collate mode — train ships it, eval omits it; never by drawn values) and
the raw image dtype (unified to fp32 before multi-host assembly, since a
resized host emits fp32 while a non-resized one keeps int16).

Semantics match the host path exactly (tests/test_device_prep.py):
``clip → (x - mean) / std → D4`` where std already includes the legacy
``+1e-8`` epsilon, and the D4 draw (flip_h, flip_v, rot_k) is rolled by
the collate's RNG per batch — randomness stays owned by the data pipeline,
identical stream to the host path. One documented deviation: non-square
batches draw from the shape-preserving D4 subgroup (flips + rot180; odd
rotations would change the static shape inside the jit and desync local
batch shapes across pod hosts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["device_prepare"]


def device_prepare(
    image: jax.Array,
    norm_mean: jax.Array,
    norm_std: jax.Array,
    norm_clip: jax.Array,
    d4: jax.Array | None = None,
) -> jax.Array:
    """Normalize + D4-augment one NHWC batch on device.

    Args:
      image: [B,H,W,C] raw decoded values (any real dtype; cast to fp32).
      norm_mean / norm_std: [C] fp32, or per-sample [B,C] (the collate's
        production form — shards along batch). ``norm_std`` already
        contains any epsilon (legacy scheme ships ``std + 1e-8``).
      norm_clip: [2] fp32 ``(lo, hi)`` or per-sample [B,2] — ``(-inf,
        +inf)`` disables the clip branchlessly ('legacy' scheme; 'custom'
        clips to [0, 10000], terramesh_datamodule.py:144-257).
      d4: int32 ``(flip_h, flip_v, rot_k)`` draws, or None to skip the
        augment stage entirely (eval batches — the collate omits the leaf
        in eval mode, saving ~6 full-batch HBM passes of select traffic;
        train-mode identity draws still ship, since presence must be
        host-invariant). Shape [B,3] = one draw
        PER SAMPLE: shards along batch like the image, so on a pod each
        host's samples keep that host's collate draw; every op below is
        per-sample, so the sharding flows through with no collectives.
        Shape [3] = one draw for the whole batch (cheaper: true branches
        instead of selects; single-host only). Odd rotations require
        H == W (the collate only draws the shape-preserving subgroup for
        non-square batches).
    """
    x = image.astype(jnp.float32)
    if norm_clip.ndim == 2:  # per-sample [B,2]
        lo = norm_clip[:, 0][:, None, None, None]
        hi = norm_clip[:, 1][:, None, None, None]
    else:
        lo, hi = norm_clip[0], norm_clip[1]
    x = jnp.clip(x, lo, hi)
    mean = norm_mean[:, None, None, :] if norm_mean.ndim == 2 else norm_mean
    std = norm_std[:, None, None, :] if norm_std.ndim == 2 else norm_std
    x = (x - mean) * (1.0 / std)
    if d4 is None:
        return x
    # D4 augment (terramesh_datamodule.py:347-369, same op order as
    # eovax.data.collate.apply_batch_augmentations: H-flip, V-flip, rot k).
    square = x.shape[1] == x.shape[2]
    if d4.ndim == 2:  # per-sample draws: batched selects
        fh = d4[:, 0][:, None, None, None]
        fv = d4[:, 1][:, None, None, None]
        x = jnp.where(fh == 1, x[:, :, ::-1], x)
        x = jnp.where(fv == 1, x[:, ::-1], x)
        k = d4[:, 2][:, None, None, None]
        if square:
            # All three rotations materialize (3 extra HBM passes,
            # ~100 µs/50 MB batch) — the price of per-sample selection.
            x = jnp.where(
                k == 1, jnp.rot90(x, 1, axes=(1, 2)),
                jnp.where(
                    k == 2, jnp.rot90(x, 2, axes=(1, 2)),
                    jnp.where(k == 3, jnp.rot90(x, 3, axes=(1, 2)), x),
                ),
            )
        else:  # shape-preserving subgroup: k ∈ {0, 2} only
            x = jnp.where(k == 2, jnp.rot90(x, 2, axes=(1, 2)), x)
        return x
    x = jax.lax.cond(d4[0] == 1, lambda t: t[:, :, ::-1], lambda t: t, x)
    x = jax.lax.cond(d4[1] == 1, lambda t: t[:, ::-1], lambda t: t, x)
    if square:
        x = jax.lax.switch(
            d4[2],
            [
                lambda t: t,
                lambda t: jnp.rot90(t, 1, axes=(1, 2)),
                lambda t: jnp.rot90(t, 2, axes=(1, 2)),
                lambda t: jnp.rot90(t, 3, axes=(1, 2)),
            ],
            x,
        )
    else:
        x = jax.lax.cond(
            d4[2] == 2, lambda t: jnp.rot90(t, 2, axes=(1, 2)), lambda t: t, x
        )
    return x
