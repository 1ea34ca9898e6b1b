"""Encode-path ablation microbenchmarks (round-3 follow-up to
scripts/ablate_decode.py — same slope-method methodology; see that file's
docstring for why naive timing is wrong on this host).

Focus: where encode loses its ~15% of roofline. Suspects are the
low-channel dynamic stem conv (contraction dim 12 badly underfills the
MXU's 128 lanes) and the per-block elementwise traffic. Includes an
im2col reformulation of the stem conv (patch-gather → one [B·H·W, 9·C_in]
× [9·C_in, 128] matmul) to test whether XLA's conv lowering underuses the
MXU at C_in ∈ {2,3,12,13}.

CAVEAT (measured): the isolated `stemconv_*`/`outconv_*` rows are
inflated ~4× by the chain's feedback adapter — reconstructing a wide
input from a 12-channel output costs lane shuffles that ride every
iteration and do NOT cancel under the slope method. The reliable
low-channel numbers come from a differential pair of chains sharing
identical feedback (one with the extra conv): stem 12→128 ≈ 1.25 ms,
out 128→12 ≈ 1.66 ms — the 128-lane granularity floor (≈ ideal ×
128/12). See ARCHITECTURE.md "Encode breakdown + the low-channel stem
floor".

Run from /root/repo:  python scripts/ablate_encode.py [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# PYTHONPATH breaks the axon tunnel plugin on this host — sys.path instead.
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

    from eovax.core.config import EncoderConfig, StemConfig
    from eovax.core.precision import DEFAULT_POLICY
    from eovax.models.backbone import Encoder
    from eovax.nn.blocks import Downsample, ResnetBlock

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
            run(n)
            run(n)
        t1 = min(run(iters), run(iters))
        t3 = min(run(3 * iters), run(3 * iters))
        return (t3 - t1) / (2 * iters) * 1000.0

    def rand(shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(
            jnp.bfloat16
        )

    results = {}

    def report(label, ms):
        results[label] = ms
        print(f"{label:45} {ms:8.3f} ms", flush=True)

    # ---- full encode ----------------------------------------------------
    from eovax.data.wavelengths import wavelengths_for

    stem = StemConfig(num_layers=4, wv_planes=256)
    enc = Encoder(EncoderConfig(in_channels=12, stem=stem), policy=policy)
    wvs = jnp.asarray(wavelengths_for("S2L2A"))
    x_img = rand((B, 256, 256, 12))
    evars = host_vars(enc, jnp.zeros((1, 256, 256, 12)), wvs)

    def full_encode(y):
        return enc.apply(evars, y, wvs)

    def back_to_img(out):  # [B,32,32,64] moments → [B,256,256,12]
        up = jnp.repeat(jnp.repeat(out[..., :12], 8, axis=1), 8, axis=2)
        return up.astype(jnp.bfloat16)

    report("encode_total", chained_ms(full_encode, x_img, adapter=back_to_img))

    # ---- blocks at the encoder shapes ----------------------------------
    def bench_block(res, ci, co, label):
        blk = ResnetBlock(in_channels=ci, out_channels=co, policy=policy)
        v = host_vars(blk, jnp.zeros((1, res, res, ci)))
        x = rand((B, res, res, ci))
        if ci == co:
            adapter = None
        else:
            def adapter(out, _ci=ci):
                return out[..., : _ci] if out.shape[-1] >= _ci else jnp.concatenate(
                    [out] * (-(-_ci // out.shape[-1])), axis=-1
                )[..., :_ci]

        report(label, chained_ms(lambda y: blk.apply(v, y), x, adapter=adapter))

    bench_block(256, 128, 128, "block_256px_128")
    bench_block(128, 128, 256, "block_128px_128to256")
    bench_block(128, 256, 256, "block_128px_256")
    bench_block(64, 256, 512, "block_64px_256to512")
    bench_block(64, 512, 512, "block_64px_512")
    bench_block(32, 512, 512, "block_32px_512")

    # ---- downsample stride-2 convs -------------------------------------
    def bench_down(res, c, label):
        dn = Downsample(in_channels=c, policy=policy)
        v = host_vars(dn, jnp.zeros((1, res, res, c)))
        x = rand((B, res, res, c))
        report(
            label,
            chained_ms(
                lambda y: dn.apply(v, y),
                x,
                adapter=lambda out: jnp.repeat(jnp.repeat(out, 2, 1), 2, 2),
            ),
        )

    bench_down(256, 128, "down_256to128_128")
    bench_down(128, 256, "down_128to64_256")
    bench_down(64, 512, "down_64to32_512")

    # ---- the stem conv: 3×3 12→128 at 256², three formulations ---------
    w = rand((3, 3, 12, 128))

    def conv_direct(y):
        return jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    stem_adapter = lambda out: out[..., :12]  # noqa: E731
    report("stemconv_direct_12to128", chained_ms(conv_direct, x_img, adapter=stem_adapter))

    w_mat = w.reshape(9 * 12, 128)

    def conv_im2col(y):
        p = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # gather the 9 taps as a channel-concat, then one matmul
        taps = [p[:, a : a + 256, b : b + 256, :] for a in range(3) for b in range(3)]
        patches = jnp.concatenate(taps, axis=-1)  # [B,256,256,108]
        return jnp.einsum(
            "bhwk,ko->bhwo", patches, w_mat,
            preferred_element_type=jnp.bfloat16,
        )

    report("stemconv_im2col_12to128", chained_ms(conv_im2col, x_img, adapter=stem_adapter))

    # channel-padded direct conv: pad C_in 12 → 32 with zeros (kernel too)
    w_pad = jnp.zeros((3, 3, 32, 128), jnp.bfloat16).at[:, :, :12, :].set(w)

    def conv_padded(y):
        yp = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 20)))
        return jax.lax.conv_general_dilated(
            yp, w_pad, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    report("stemconv_pad32_12to128", chained_ms(conv_padded, x_img, adapter=stem_adapter))

    # decoder-side: 3×3 128→12 at 256² (output-lane underfill)
    wd = rand((3, 3, 128, 12))
    x128 = rand((B, 256, 256, 128))

    def conv_out_direct(y):
        return jax.lax.conv_general_dilated(
            y, wd, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    report(
        "outconv_direct_128to12",
        chained_ms(
            conv_out_direct, x128,
            adapter=lambda out: jnp.concatenate([out] * 11, -1)[..., :128],
        ),
    )

    wd_mat = wd.reshape(9 * 128, 12)

    def conv_out_im2col(y):
        p = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [p[:, a : a + 256, b : b + 256, :] for a in range(3) for b in range(3)]
        patches = jnp.concatenate(taps, axis=-1)  # [B,256,256,1152]
        return jnp.einsum(
            "bhwk,ko->bhwo", patches, wd_mat, preferred_element_type=jnp.bfloat16
        )

    report(
        "outconv_im2col_128to12",
        chained_ms(
            conv_out_im2col, x128,
            adapter=lambda out: jnp.concatenate([out] * 11, -1)[..., :128],
        ),
    )

    # ---- composed estimate ---------------------------------------------
    # The stem row is EXCLUDED: its isolated-chain number is ~4× inflated
    # by the feedback adapter (see the docstring CAVEAT); the reliable
    # differential-chain estimate is ~1.25 ms and lives in the
    # unattributed remainder together with attn/GN-tail/conv_out/quant.
    composed = (
        2 * results["block_256px_128"]
        + results["down_256to128_128"]
        + results["block_128px_128to256"] + results["block_128px_256"]
        + results["down_128to64_256"]
        + results["block_64px_256to512"] + results["block_64px_512"]
        + results["down_64to32_512"]
        + 2 * results["block_32px_512"]   # level-3 blocks
        + 2 * results["block_32px_512"]   # mid block1/2 (attn excluded)
    )
    report("composed_blocks_sum (excl. stem)", composed)
    report("unattributed (stem, attn, GN tail, conv_out, quant)",
           results["encode_total"] - composed)

    print("JSON:" + json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
