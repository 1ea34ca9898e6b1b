"""Winograd F(2×2, 3×3) convolution as batched MXU matmuls (NHWC).

The 3×3 stride-1 SAME convs dominate the VAE's FLOPs (reference conv stacks:
/root/reference/eo_vae/models/model.py:126-147,273-293). The direct XLA conv
runs them at 67-78% MFU on v5e; Winograd F(2×2,3×3) computes the same
convolution with 4/9 of the MXU work — the same algorithm-level trade cuDNN
makes for the torch reference's 3×3 convs on GPU.

Formulation (Lavin & Gray, arXiv:1509.09308): split the output into 2×2
tiles; each tile is produced from a 4×4 input window as

    Y = Aᵀ [ (G w Gᵀ) ⊙ (Bᵀ d B) ] A

The elementwise product over the 16 transform positions becomes, after
vectorizing over tiles and channels, **16 batched matmuls**
``[N, C_in] @ [C_in, C_out]`` with ``N = B·(H/2)·(W/2)`` — large, dense,
bf16-friendly MXU shapes. Transforms are ±1/±½ stencils (adds/subs on the
VPU, fused by XLA).

Numerics: the kernel transform G w Gᵀ is computed in fp32 from the fp32
parameters and cast once to the compute dtype; matmuls accumulate in fp32
on the MXU. Relative error vs the direct bf16 conv is of the same order as
the direct conv's own bf16 rounding (see tests/test_winograd.py). Parity /
golden tests keep the direct path; Winograd is selected explicitly via
``Policy.conv_algorithm = "winograd"`` (inference / benchmark policies).

Used when: kernel 3×3, stride 1, SAME (1,1) padding, even H and W, and the
channel product is large enough for the transform overhead to amortize
(min(C_in, C_out) ≥ 128 — measured crossover on v5e, see
ARCHITECTURE.md round-2 performance notes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bᵀ (4×4), G (4×3), Aᵀ (2×4) — the F(2×2,3×3) transform stencils.
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], dtype=np.float32
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], dtype=np.float32
)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], dtype=np.float32)


def transform_kernel(w: jax.Array) -> jax.Array:
    """G w Gᵀ over the spatial dims: [3,3,I,O] → [16,I,O] (fp32)."""
    w32 = w.astype(jnp.float32)
    u = jnp.einsum("ui,vj,ijco->uvco", _G, _G, w32)
    return u.reshape(16, w.shape[2], w.shape[3])


def winograd_conv3x3(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array | None,
    *,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """3×3 stride-1 SAME conv of NHWC ``x`` with HWIO ``w`` via F(2×2,3×3).

    Requires even H and W (true for every VAE level: 32..256). Exact in
    fp32 up to reassociation; in bf16 the error is comparable to the
    direct bf16 conv's rounding.
    """
    b, h, wd, c = x.shape
    o = w.shape[-1]
    if h % 2 or wd % 2:
        raise ValueError(f"winograd_conv3x3 needs even H, W; got {h}x{wd}")

    xp = jnp.pad(x.astype(compute_dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))

    # d[a][b]: position (a, b) of every 4×4 tile → [B, H/2, W/2, C].
    # Tile i covers padded rows 2i..2i+3, so position a is the strided
    # slice starting at a with step 2 and H/2 elements.
    d = [
        [xp[:, a : a + h : 2, bb : bb + wd : 2, :] for bb in range(4)]
        for a in range(4)
    ]

    # Input transform Bᵀ d B as adds/subs (Bᵀ rows: d0−d2, d1+d2, d2−d1, d1−d3).
    def bt_combine(v0, v1, v2, v3):
        return (v0 - v2, v1 + v2, v2 - v1, v1 - v3)

    rows = [bt_combine(*[d[a][bb] for a in range(4)]) for bb in range(4)]
    # rows[b][u] = Σ_a BT[u,a] d[a][b]; now combine over b.
    tiles = []
    for u in range(4):
        tiles.extend(bt_combine(rows[0][u], rows[1][u], rows[2][u], rows[3][u]))
    xt = jnp.stack(tiles, axis=0)  # [16, B, H/2, W/2, C]
    n = b * (h // 2) * (wd // 2)
    xt = xt.reshape(16, n, c)

    u16 = transform_kernel(w).astype(compute_dtype)  # [16, I, O]

    # 16 batched MXU matmuls; fp32 accumulation on-chip, bf16 result.
    y = jax.lax.dot_general(
        xt,
        u16,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=compute_dtype,
    )  # [16, N, O]
    y = y.reshape(4, 4, b, h // 2, wd // 2, o)

    # Output transform Aᵀ Y A (Aᵀ rows: y0+y1+y2, y1−y2−y3).
    def at_combine(v0, v1, v2, v3):
        return (v0 + v1 + v2, v1 - v2 - v3)

    s = [at_combine(*[y[uu, vv] for uu in range(4)]) for vv in range(4)]
    # s[v][p] = Σ_u AT[p,u] Y[u,v]; combine over v.
    m = [at_combine(s[0][p], s[1][p], s[2][p], s[3][p]) for p in range(2)]
    # m[p][q]: output pixel (2i+p, 2j+q) → interleave to [B, H, W, O].
    out = jnp.stack(
        [jnp.stack([m[0][0], m[0][1]], axis=3), jnp.stack([m[1][0], m[1][1]], axis=3)],
        axis=2,
    )  # [B, H/2, 2(p), W/2, 2(q), O]
    out = out.reshape(b, h, wd, o)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def should_use_winograd(x_shape, kernel_shape, strides, compute_dtype) -> bool:
    """Dispatch rule for the VAE conv sites (measured crossover on v5e)."""
    if compute_dtype != jnp.bfloat16:
        return False
    kh, kw = kernel_shape[0], kernel_shape[1]
    if (kh, kw) != (3, 3) or tuple(strides) != (1, 1):
        return False
    _, h, w, ci = x_shape
    co = kernel_shape[-1]
    return h % 2 == 0 and w % 2 == 0 and min(ci, co) >= 128
