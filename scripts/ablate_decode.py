"""Decode-path ablation microbenchmarks (VERDICT r3 item #4).

The tunnel's jax.profiler hangs (memory: tpu-tunnel-measurement-pitfalls),
so the decode breakdown is built from dependency-chained component
timings: every number is ONE `lax.fori_loop` dispatch with a single
4-byte fetch (the bench.py methodology; sync-per-call would add ~26 ms
of tunnel round-trip per iteration).

Run from /root/repo:  python scripts/ablate_decode.py [--iters 30]
Emits a table of per-component ms at the flagship decode shapes (B=16,
256² output) plus the composed total vs the measured full decode.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# PYTHONPATH breaks the axon tunnel plugin on this host (memory:
# tpu-tunnel-measurement-pitfalls) — put the repo root on sys.path here.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/eovax_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from eovax.core.config import DecoderConfig, EncoderConfig, StemConfig
    from eovax.core.precision import DEFAULT_POLICY
    from eovax.models.backbone import Decoder, EOVAECore
    from eovax.nn.blocks import AttnBlock, ResnetBlock, Upsample

    policy = DEFAULT_POLICY
    B = args.batch
    ITERS = args.iters
    rng = np.random.default_rng(0)

    def host_vars(module, *xs):
        shapes = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *xs))
        return jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                rng.normal(0, 0.02, size=s.shape).astype(np.dtype(s.dtype))
            ),
            shapes,
        )

    def chained_ms(fn, x0, iters=ITERS, adapter=None):
        """SLOPE-method per-iteration ms of fn as an on-device chain:
        time loops of N and 3N iterations and divide the difference by 2N
        — this cancels the constant dispatch+fetch tunnel round-trip
        (~30 ms here), which would otherwise add RT/N to every row
        (memory: tpu-tunnel-measurement-pitfalls, the round-1 mistake).
        `adapter` maps fn's output back to fn's input shape; its cost
        (like the tanh feedback) rides inside the chain — negligible for
        conv-sized ops, dominant for pure-elementwise rows (so elementwise
        rows are upper bounds)."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, n):
            def body(_, y):
                out = fn(y)
                out = jnp.tanh(out)
                return adapter(out) if adapter is not None else out

            return jax.lax.fori_loop(0, n, body, x)

        def run(n):
            t0 = time.perf_counter()
            y = loop(x0, n)
            float(jnp.sum(jnp.ravel(y)[0]))
            return time.perf_counter() - t0

        for n in (iters, 3 * iters):
            run(n)  # compile
            run(n)  # warm
        t1 = min(run(iters), run(iters))
        t3 = min(run(3 * iters), run(3 * iters))
        return (t3 - t1) / (2 * iters) * 1000.0

    def rand(shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(
            jnp.bfloat16
        )

    results = {}

    # ---- full decode (post_quant → conv_in → mid → 4 up levels → stem) --
    stem = StemConfig(num_layers=4, wv_planes=256)
    dec = Decoder(DecoderConfig(out_ch=12, stem=stem), policy=policy)
    from eovax.data.wavelengths import wavelengths_for

    wvs = jnp.asarray(wavelengths_for("S2L2A"))
    z = rand((B, 32, 32, 32))
    dvars = host_vars(dec, jnp.zeros((1, 32, 32, 32)), wvs)

    def full_decode(y):
        return dec.apply(dvars, y, wvs)

    def back_to_latent(out):  # [B,256,256,12] → [B,32,32,32]
        pooled = out[:, ::8, ::8, :]  # [B,32,32,12]
        return jnp.concatenate(
            [pooled, pooled, pooled[..., :8]], axis=-1  # 12+12+8 = 32 ch
        ).astype(jnp.bfloat16)

    results["decode_total"] = chained_ms(full_decode, z, adapter=back_to_latent)
    print(f"{'decode_total':45} {results['decode_total']:8.3f} ms", flush=True)

    # ---- per-component shapes of the decode path ------------------------
    # mid + level3: 32²×512 | level2: 64²×512 | level1: 128²×(512→256,256)
    # level0: 256²×(256→128,128)
    def bench_block(res, ci, co, label):
        blk = ResnetBlock(in_channels=ci, out_channels=co, policy=policy)
        v = host_vars(blk, jnp.zeros((1, res, res, ci)))
        x = rand((B, res, res, ci))
        if ci == co:
            adapter = None
        else:
            reps = -(-ci // co)

            def adapter(out, _reps=reps, _ci=ci):
                return jnp.concatenate([out] * _reps, axis=-1)[..., :_ci]

        results[label] = chained_ms(lambda y: blk.apply(v, y), x, adapter=adapter)
        print(f"{label:45} {results[label]:8.3f} ms", flush=True)

    bench_block(32, 512, 512, "block_32px_512")
    bench_block(64, 512, 512, "block_64px_512")
    bench_block(128, 512, 256, "block_128px_512to256")
    bench_block(128, 256, 256, "block_128px_256")
    bench_block(256, 256, 128, "block_256px_256to128")
    bench_block(256, 128, 128, "block_256px_128")

    attn = AttnBlock(in_channels=512, policy=policy)
    av = host_vars(attn, jnp.zeros((1, 32, 32, 512)))
    results["attn_32px_512"] = chained_ms(
        lambda y: attn.apply(av, y), rand((B, 32, 32, 512))
    )
    print(f"{'attn_32px_512':45} {results['attn_32px_512']:8.3f} ms", flush=True)

    def bench_upsample(res, c, label):
        up = Upsample(in_channels=c, policy=policy)
        v = host_vars(up, jnp.zeros((1, res, res, c)))
        x = rand((B, res, res, c))
        results[label] = chained_ms(
            lambda y: up.apply(v, y), x, adapter=lambda out: out[:, ::2, ::2, :]
        )
        print(f"{label:45} {results[label]:8.3f} ms", flush=True)

    bench_upsample(32, 512, "upsample_32to64_512")
    bench_upsample(64, 512, "upsample_64to128_512")
    bench_upsample(128, 256, "upsample_128to256_256")

    # ---- intra-block op costs at the two hottest shapes -----------------
    from eovax.nn.blocks import swish

    for res, c in ((128, 256), (256, 128), (64, 512)):
        x = rand((B, res, res, c))
        import flax.linen as nn

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=policy.norm_dtype)
        gv = host_vars(gn, jnp.zeros((1, res, res, c)))
        results[f"groupnorm_{res}px_{c}"] = chained_ms(
            lambda y: gn.apply(gv, y).astype(jnp.bfloat16), x
        )
        results[f"swish_{res}px_{c}"] = chained_ms(lambda y: swish(y), x)
        # flip(0) forces a second full read stream without baking a
        # constant into the jit (HTTP 413 on the remote compile service).
        results[f"residual_add_{res}px_{c}"] = chained_ms(
            lambda y: y + jnp.flip(y, 0), x
        )
        w = rand((3, 3, c, c))
        results[f"conv3x3_{res}px_{c}"] = chained_ms(
            lambda y: jax.lax.conv_general_dilated(
                y, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            ),
            x,
        )
        for kk in (f"groupnorm_{res}px_{c}", f"swish_{res}px_{c}",
                   f"residual_add_{res}px_{c}", f"conv3x3_{res}px_{c}"):
            print(f"{kk:45} {results[kk]:8.3f} ms", flush=True)

    # interleave transpose alone (the subpixel upsample epilogue) at the
    # largest shape: [B,H,W,2,2,C] → [B,2H,2W,C]
    for res, c in ((128, 256), (64, 512)):
        st = rand((B, res, res, 2, 2, c))

        def interleave(y, _res=res, _c=c):
            return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * _res, 2 * _res, _c)

        results[f"interleave_{res}to{2*res}_{c}"] = chained_ms(
            interleave, st,
            adapter=lambda out, _res=res, _c=c: out.reshape(
                B, _res, 2, _res, 2, _c
            ).transpose(0, 1, 3, 2, 4, 5),
        )
        print(f"interleave_{res}to{2*res}_{c}: {results[f'interleave_{res}to{2*res}_{c}']:.3f} ms", flush=True)

    # ---- composed estimate ---------------------------------------------
    composed = (
        2 * results["block_32px_512"]  # mid block1/2
        + results["attn_32px_512"]
        + 3 * results["block_32px_512"]  # level 3
        + results["upsample_32to64_512"]
        + 3 * results["block_64px_512"]  # level 2
        + results["upsample_64to128_512"]
        + results["block_128px_512to256"] + 2 * results["block_128px_256"]
        + results["upsample_128to256_256"]
        + results["block_256px_256to128"] + 2 * results["block_256px_128"]
    )
    results["composed_blocks_sum"] = composed
    results["unattributed (stems, GN+swish tail, boundaries)"] = (
        results["decode_total"] - composed
    )

    for k, v in results.items():
        print(f"{k:45} {v:8.3f} ms")
    print("JSON:" + json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
