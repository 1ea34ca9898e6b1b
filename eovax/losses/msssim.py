"""Multi-scale SSIM (NHWC, fp32) with torchmetrics-compatible semantics.

The reference's SSIMLoss wraps torchmetrics
``MultiScaleStructuralSimilarityIndexMeasure(data_range=6.0, kernel_size=5,
betas=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333))``
(/root/reference/eo_vae/models/modules/consistency_loss.py:24-37). This
module replicates that algorithm: reflect-pad → gaussian filter → crop,
per-sample contrast sensitivity per scale, 2×2 average-pool between scales,
``relu`` normalization, beta-weighted product.

TPU notes: the gaussian filter is separable — two depthwise 1-D convs on
the VPU — and the whole pyramid fuses under jit. Runs in fp32 (small
constant c1/c2 sums are precision-sensitive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=8)
def _gaussian_1d(kernel_size: int, sigma: float) -> tuple[float, ...]:
    import numpy as np

    dist = np.arange((1 - kernel_size) / 2, (1 + kernel_size) / 2, 1.0)
    g = np.exp(-((dist / sigma) ** 2) / 2.0)
    g = g / g.sum()
    return tuple(float(v) for v in g)


@functools.lru_cache(maxsize=64)
def _blur_matrix(n_in: int, kernel_size: int, sigma: float):
    """Banded [n_in-k+1, n_in] VALID-blur matrix."""
    import numpy as np

    g = np.asarray(_gaussian_1d(kernel_size, sigma), np.float32)
    n_out = n_in - kernel_size + 1
    m = np.zeros((n_out, n_in), np.float32)
    for a in range(kernel_size):
        m[np.arange(n_out), np.arange(n_out) + a] = g[a]
    return m


#: Matmul precision for the gaussian-blur pyramid. HIGH (3-pass bf16,
#: ~14-bit effective mantissa) beats the reference's own effective
#: precision — Lightning '16-mixed' autocasts torchmetrics' SSIM convs to
#: fp16 (10-bit mantissa) — at ~1/2 the MXU cost of HIGHEST (6-pass).
#: Measured (scripts/measure_msssim_precision.py, B=16 256²): MS-SSIM value
#: delta vs HIGHEST ≤ 1.2e-7 over 3 seeds; loss-term fwd+bwd 8.53 → 7.14 ms;
#: whole train step 257.9 → 256.2 ms. Parity/eval harnesses pass
#: precision=HIGHEST explicitly (see eovax.utils.metrics.ssim).
DEFAULT_BLUR_PRECISION = jax.lax.Precision.HIGH


def _depthwise_blur(
    x: jax.Array, kernel_size: int, sigma: float, precision=None
) -> jax.Array:
    """Separable gaussian filter, VALID padding. x: [B,H,W,C] fp32.

    TPU note: expressed as two banded matmuls over the H and W axes rather
    than depthwise convs — low-channel (≤13) depthwise convs run on the VPU
    at a few % utilization, while these matmuls ride the MXU. Cuts the
    MS-SSIM term's train-step cost ~50× at 256² (measured: the depthwise
    form added 282 ms to a 321 ms step at B=16).
    """
    p = precision if precision is not None else DEFAULT_BLUR_PRECISION
    mh = jnp.asarray(_blur_matrix(x.shape[1], kernel_size, sigma))
    mw = jnp.asarray(_blur_matrix(x.shape[2], kernel_size, sigma))
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=p)
    return jnp.einsum("pw,bowc->bopc", mw, y, precision=p)


def _ssim_and_cs(
    pred: jax.Array,
    target: jax.Array,
    data_range: float,
    kernel_size: int,
    sigma: float,
    k1: float,
    k2: float,
    precision=None,
) -> tuple[jax.Array, jax.Array]:
    """Per-sample mean SSIM and contrast sensitivity (torchmetrics algo)."""
    pad = (kernel_size - 1) // 2
    pw = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    pred = jnp.pad(pred, pw, mode="reflect")
    target = jnp.pad(target, pw, mode="reflect")

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    blur = lambda t: _depthwise_blur(t, kernel_size, sigma, precision)  # noqa: E731
    mu_p, mu_t = blur(pred), blur(target)
    mu_pp, mu_tt, mu_pt = blur(pred * pred), blur(target * target), blur(pred * target)

    sigma_p = mu_pp - mu_p * mu_p
    sigma_t = mu_tt - mu_t * mu_t
    sigma_pt = mu_pt - mu_p * mu_t

    upper = 2.0 * sigma_pt + c2
    lower = sigma_p + sigma_t + c2
    ssim_map = ((2.0 * mu_p * mu_t + c1) * upper) / ((mu_p**2 + mu_t**2 + c1) * lower)
    cs_map = upper / lower

    # Crop the padded border (torchmetrics _ssim_update).
    ssim_map = ssim_map[:, pad : ssim_map.shape[1] - pad, pad : ssim_map.shape[2] - pad, :]
    cs_map = cs_map[:, pad : cs_map.shape[1] - pad, pad : cs_map.shape[2] - pad, :]

    b = ssim_map.shape[0]
    return ssim_map.reshape(b, -1).mean(axis=-1), cs_map.reshape(b, -1).mean(axis=-1)


def _avg_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def multiscale_ssim(
    pred: jax.Array,
    target: jax.Array,
    *,
    data_range: float = 6.0,
    kernel_size: int = 5,
    sigma: float = 1.5,
    betas: tuple[float, ...] = DEFAULT_BETAS,
    k1: float = 0.01,
    k2: float = 0.03,
    normalize: str | None = "relu",
    precision=None,
) -> jax.Array:
    """MS-SSIM over NHWC batches → scalar (elementwise-mean reduction).

    ``precision`` overrides the blur matmul precision (default
    DEFAULT_BLUR_PRECISION = HIGH; pass jax.lax.Precision.HIGHEST for
    bit-faithful fp32 parity harnesses)."""
    min_side = (kernel_size - 1) * 2 ** (len(betas) - 1)
    if pred.shape[1] <= min_side or pred.shape[2] <= min_side:
        raise ValueError(
            f"MS-SSIM with kernel {kernel_size} and {len(betas)} scales needs "
            f"inputs > {min_side}px per side; got {pred.shape[1:3]} "
            "(torchmetrics enforces the same bound)."
        )
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    mcs = []
    sim = None
    for i in range(len(betas)):
        sim, cs = _ssim_and_cs(
            pred, target, data_range, kernel_size, sigma, k1, k2, precision
        )
        mcs.append(cs)
        if i != len(betas) - 1:
            pred, target = _avg_pool2(pred), _avg_pool2(target)
    mcs[-1] = sim  # last scale contributes full SSIM, not CS

    stack = jnp.stack(mcs)  # [scales, B]
    if normalize == "relu":
        stack = jax.nn.relu(stack)
    weighted = stack ** jnp.asarray(betas, jnp.float32).reshape(-1, 1)
    return jnp.prod(weighted, axis=0).mean()


def msssim_loss(pred: jax.Array, target: jax.Array, **kw) -> jax.Array:
    """1 − MS-SSIM (consistency_loss.py:35-37)."""
    return 1.0 - multiscale_ssim(pred, target, **kw)
