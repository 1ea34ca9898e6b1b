"""Winograd F(2×2,3×3) conv: exactness in fp32, bounded bf16 drift,
dispatch rule, and ResnetBlock integration (params shared with nn.Conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eovax.kernels.winograd import (
    should_use_winograd,
    transform_kernel,
    winograd_conv3x3,
)


def _direct(x, k, bias=None, dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        k.astype(dtype),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    return y if bias is None else y + bias.astype(dtype)


@pytest.mark.parametrize(
    "shape", [(2, 8, 8, 5, 7), (1, 4, 6, 3, 3), (2, 16, 10, 8, 16), (1, 32, 32, 1, 4)]
)
def test_fp32_exact(shape):
    b, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
    ref = _direct(x, k, bias)
    got = winograd_conv3x3(x, k, bias, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16_error_comparable_to_direct():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    ref = _direct(x, k)
    scale = float(jnp.std(ref))
    wino = winograd_conv3x3(
        x.astype(jnp.bfloat16), k, None, compute_dtype=jnp.bfloat16
    ).astype(jnp.float32)
    rms = float(jnp.sqrt(jnp.mean((wino - ref) ** 2))) / scale
    assert rms < 0.02, rms  # measured ~0.007 (direct bf16: ~0.003)


def test_kernel_transform_shape():
    k = jnp.ones((3, 3, 4, 6))
    u = transform_kernel(k)
    assert u.shape == (16, 4, 6)


def test_dispatch_rule():
    ok = dict(x_shape=(2, 32, 32, 256), kernel_shape=(3, 3, 256, 256), strides=(1, 1))
    assert should_use_winograd(**ok, compute_dtype=jnp.bfloat16)
    assert not should_use_winograd(**ok, compute_dtype=jnp.float32)
    assert not should_use_winograd(
        (2, 31, 32, 256), (3, 3, 256, 256), (1, 1), jnp.bfloat16
    )
    assert not should_use_winograd(
        (2, 32, 32, 64), (3, 3, 64, 256), (1, 1), jnp.bfloat16
    )
    assert not should_use_winograd(
        (2, 32, 32, 256), (1, 1, 256, 256), (1, 1), jnp.bfloat16
    )
    assert not should_use_winograd(
        (2, 32, 32, 256), (3, 3, 256, 256), (2, 2), jnp.bfloat16
    )


def test_resnet_block_winograd_matches_direct():
    from eovax.core.precision import DEFAULT_POLICY, WINOGRAD_POLICY
    from eovax.nn.blocks import ResnetBlock

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)

    block_d = ResnetBlock(in_channels=128, out_channels=128, policy=DEFAULT_POLICY)
    variables = block_d.init(jax.random.PRNGKey(0), x)
    y_direct = block_d.apply(variables, x)

    block_w = ResnetBlock(in_channels=128, out_channels=128, policy=WINOGRAD_POLICY)
    y_wino = block_w.apply(variables, x)  # same variable tree — params shared

    d = np.asarray(y_direct, np.float32)
    w = np.asarray(y_wino, np.float32)
    rms = float(np.sqrt(np.mean((d - w) ** 2)) / (np.std(d) + 1e-8))
    assert rms < 0.02, rms


def test_winograd_grads_flow():
    from eovax.core.precision import WINOGRAD_POLICY
    from eovax.nn.blocks import ResnetBlock

    x = jnp.ones((1, 8, 8, 128), jnp.float32)
    block = ResnetBlock(in_channels=128, out_channels=128, policy=WINOGRAD_POLICY)
    variables = block.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(block.apply({"params": params}, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"])
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in jax.tree_util.tree_leaves(g)))
    )
    assert np.isfinite(gnorm) and gnorm > 0
