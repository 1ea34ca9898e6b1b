"""Upsample formulation shootout (decode roofline, VERDICT r3 item #4).

The ablation table (scripts/ablate_decode.py) shows the subpixel
upsamples run at 43-61% MFU — the decode path's weakest ops. This
benches alternative formulations of conv3x3(nearest_up2(x)) at the two
hot shapes, slope-method timing:

  A. current: whatever nn/blocks.py's subpixel_upsample_conv does today.
     HISTORY: when this shootout first ran (round 3), "current" was four
     per-phase 2×2 convs + stack/transpose interleave; variant B won and
     was promoted into blocks.py, so on re-runs A and B now measure the
     SAME input-dilated formulation (expect ~equal times, rel-err ~0).
  B. lax.conv_transpose stride 2 with the equivalent 4×4 kernel (XLA's
     input-dilation path — the backward of the Downsample conv)
  C. two 2×3-kernel convs (row-phase pair per conv, both column phases
     channel-stacked: SAME col padding so outputs stay aligned, no
     offset slicing; 1.5× tap FLOPs but 2× wider matmuls, 2 input reads
     instead of 4)
  D. naive: jnp.repeat nearest ×2 then a dense 3×3 conv (the reference
     formulation; 2.25× conv FLOPs + the 4× intermediate)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 16
ITERS = 15


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eovax_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eovax.core.precision import DEFAULT_POLICY
    from eovax.nn.blocks import subpixel_upsample_conv

    policy = DEFAULT_POLICY
    rng = np.random.default_rng(0)

    def slope_ms(fn, x0):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, n):
            def body(_, y):
                out = jnp.tanh(fn(y))
                return out[:, ::2, ::2, :]  # back to input shape

            return jax.lax.fori_loop(0, n, body, x)

        def run(n):
            t0 = time.perf_counter()
            y = loop(x0, n)
            float(jnp.sum(jnp.ravel(y)[0]))
            return time.perf_counter() - t0

        for n in (ITERS, 3 * ITERS):
            run(n); run(n)
        t1 = min(run(ITERS), run(ITERS))
        t3 = min(run(3 * ITERS), run(3 * ITERS))
        return (t3 - t1) / (2 * ITERS) * 1000.0

    def variants(res, c):
        w3 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)
        x = jnp.asarray(
            rng.standard_normal((B, res, res, c), dtype=np.float32)
        ).astype(jnp.bfloat16)
        w3c = w3.astype(jnp.bfloat16)

        def current(y):
            return subpixel_upsample_conv(y, w3, bias, policy)

        # B: conv_transpose 4x4 stride 2. Kernel index k = py - 2d + 1
        # (d = input offset relative to the output's base input row).
        rowmap = {  # k -> (py, d) -> 3x3 row weights
            0: w3c[2],            # py=1, d=+1 : w2
            1: w3c[1] + w3c[2],   # py=0, d=0  : w1+w2
            2: w3c[0] + w3c[1],   # py=1, d=0  : w0+w1
            3: w3c[0],            # py=0, d=-1 : w0
        }
        # Build separable 4x4: K4[ky, kx] = sum over taps — rows give a
        # [4, 3, I, O]; apply the same collapse along the kx axis.
        r = jnp.stack([rowmap[k] for k in range(4)], axis=0)  # [4,3,I,O]
        colmap = {
            0: r[:, 2],
            1: r[:, 1] + r[:, 2],
            2: r[:, 0] + r[:, 1],
            3: r[:, 0],
        }
        k4 = jnp.stack([colmap[k] for k in range(4)], axis=1)  # [4,4,I,O]

        def conv_t(y):
            out = jax.lax.conv_transpose(
                y, k4, strides=(2, 2), padding=((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=policy.precision,
            )
            return out + bias.astype(out.dtype)

        # C: two 2x3 convs; column phases channel-stacked.
        row0 = jnp.stack([w3c[0], w3c[1] + w3c[2]], axis=0)  # [2,3,I,O] py=0
        row1 = jnp.stack([w3c[0] + w3c[1], w3c[2]], axis=0)  # py=1
        zeros = jnp.zeros_like(row0[:, :1])

        def hybrid_kernel(rowk):
            # px=0 taps [w0, w1+w2, 0]; px=1 taps [0, w0+w1, w2] along kx
            px0 = jnp.concatenate(
                [rowk[:, 0:1], rowk[:, 1:2] + rowk[:, 2:3], zeros], axis=1
            )
            px1 = jnp.concatenate(
                [zeros, rowk[:, 0:1] + rowk[:, 1:2], rowk[:, 2:3]], axis=1
            )
            return jnp.concatenate([px0, px1], axis=-1)  # [2,3,I,2O]

        kh0, kh1 = hybrid_kernel(row0), hybrid_kernel(row1)

        def hybrid(y):
            o0 = jax.lax.conv_general_dilated(
                y, kh0, (1, 1), [(1, 0), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=y.dtype,
            )  # [B,H,W,2C]  (py=0; px phases stacked)
            o1 = jax.lax.conv_general_dilated(
                y, kh1, (1, 1), [(0, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=y.dtype,
            )
            h, w = y.shape[1], y.shape[2]
            st = jnp.stack([o0, o1], axis=3).reshape(B, h, w, 2, 2, c)
            out = jnp.transpose(st, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * h, 2 * w, c)
            return out + bias.astype(out.dtype)

        def naive(y):
            up = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            return jax.lax.conv_general_dilated(
                up, w3c, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=y.dtype,
            ) + bias.astype(y.dtype)

        # correctness vs current first — ASSERTED, so a wrong kernel
        # construction cannot silently win the timing table (bf16
        # accumulation order differs per formulation; 2% covers it).
        ref = np.asarray(current(x), np.float32)
        for name, fn in (("conv_t", conv_t), ("hybrid", hybrid), ("naive", naive)):
            got = np.asarray(fn(x), np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"  {name} rel-err vs current: {err:.2e}", flush=True)
            assert err < 2e-2, f"{name} formulation diverges (rel-err {err:.2e})"

        for name, fn in (("current", current), ("conv_t", conv_t),
                         ("hybrid", hybrid), ("naive", naive)):
            ms = slope_ms(fn, x)
            print(f"  upsample[{res}->{2*res}, C={c}] {name:10} {ms:7.3f} ms",
                  flush=True)

    for res, c in ((64, 512), (128, 256)):
        print(f"shape {res}² ch={c}:", flush=True)
        variants(res, c)


if __name__ == "__main__":
    main()
