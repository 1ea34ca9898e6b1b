"""Pallas 3×3 conv kernel: forward + custom-VJP parity vs lax.conv
(CPU interpret mode — the kernel auto-selects interpret off-TPU), and the
dispatch envelope. Kept-negative-result module: see ARCHITECTURE.md
round-2 notes (the XLA direct conv already runs at 94-100% MFU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eovax.kernels.conv3x3 import (
    _conv3x3_pallas,
    _lax_conv,
    _pick_tile_h,
    conv3x3,
    supports_pallas_conv3x3,
)


def _pallas_direct(x, k, bias):
    """Invoke the Pallas kernel directly (bypassing the conv3x3 dispatch,
    which requires bf16); fp32 interpret mode keeps parity checks exact."""
    th = _pick_tile_h(x.shape[1], x.shape[2], x.shape[3], k.shape[-1])
    assert th > 0
    return _conv3x3_pallas(x, k, bias, th)


def _data(b, h, w, ci, co, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    return x, k, bias


def test_forward_matches_lax_conv():
    x, k, bias = _data(1, 16, 16, 128, 128)
    ref = _lax_conv(x, k) + bias
    got = _pallas_direct(x, k, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_custom_vjp_matches_lax_grads():
    # fp32 inputs → the dispatch takes the XLA body, but the custom-VJP
    # formulas (flipped-kernel dx, linear-transpose dw) are path-independent
    # and this checks them against autodiff of the plain conv.
    x, k, bias = _data(1, 16, 16, 128, 128, seed=1)

    def loss_p(x, k, b):
        return jnp.sum(conv3x3(x, k, b) ** 2)

    def loss_r(x, k, b):
        return jnp.sum((_lax_conv(x, k) + b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, bias)
    for name, a, b in zip("xkb", gp, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-4, (name, err)


def test_no_bias_grad_is_none_shapes():
    x, k, _ = _data(1, 16, 16, 128, 128, seed=2)
    g = jax.grad(lambda x, k: jnp.sum(conv3x3(x, k, None)), argnums=(0, 1))(x, k)
    assert g[0].shape == x.shape and g[1].shape == k.shape


def test_fallback_outside_envelope():
    # 5 input channels: below the 128-channel envelope -> XLA fallback,
    # still numerically exact.
    x, k, bias = _data(2, 8, 8, 5, 7, seed=3)
    assert not supports_pallas_conv3x3(x.shape, k.shape, (1, 1), jnp.bfloat16)
    ref = _lax_conv(x, k) + bias
    got = conv3x3(x, k, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_dispatch_rule():
    ok = dict(x_shape=(16, 64, 64, 512), kernel_shape=(3, 3, 512, 512), strides=(1, 1))
    assert supports_pallas_conv3x3(**ok, compute_dtype=jnp.bfloat16)
    assert not supports_pallas_conv3x3(**ok, compute_dtype=jnp.float32)
    assert not supports_pallas_conv3x3(
        (16, 64, 64, 512), (3, 3, 512, 512), (2, 2), jnp.bfloat16
    )
    assert not supports_pallas_conv3x3(
        (16, 64, 64, 64), (3, 3, 64, 512), (1, 1), jnp.bfloat16
    )


@pytest.mark.parametrize("h,w,ci,co", [(32, 32, 512, 512), (256, 256, 128, 128)])
def test_tile_picker_fits_vmem(h, w, ci, co):
    th = _pick_tile_h(h, w, ci, co)
    assert th > 0 and h % th == 0
    wpad = -(-(w + 2) // 8) * 8
    budget = 2 * (th + 2) * wpad * ci * 2 + th * w * co * 4 + 2 * th * w * co * 2
    assert budget + 9 * ci * co * 2 <= 12 * 1024 * 1024
