"""W8A8 int8 conv: quantization round-trip, conv error bound vs fp32,
block-level deviation vs the direct bf16 path, dispatch rule."""

import jax
import jax.numpy as jnp
import numpy as np

from eovax.kernels.qconv import int8_conv3x3, quantize_symmetric, should_use_int8


def test_quantize_symmetric_roundtrip():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((4, 8, 8, 16)) * 3.0, jnp.float32)
    q, s = quantize_symmetric(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    err = float(jnp.max(jnp.abs(deq - x)))
    assert err <= float(jnp.max(jnp.abs(x))) / 127.0 + 1e-6


def test_int8_conv_error_bound():
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((2, 16, 16, 128)), jnp.float32)
    w = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(g.standard_normal((128,)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = int8_conv3x3(x, w, b, compute_dtype=jnp.float32)
    scale = float(jnp.std(ref))
    rms = float(jnp.sqrt(jnp.mean((got - ref) ** 2))) / scale
    assert rms < 0.03, rms  # measured ~0.01 for W8A8 per-tensor/per-channel


def test_resnet_block_int8_close_to_direct():
    from eovax.core.precision import DEFAULT_POLICY, INT8_POLICY
    from eovax.nn.blocks import ResnetBlock

    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 128)), jnp.float32)
    block_d = ResnetBlock(in_channels=128, out_channels=128, policy=DEFAULT_POLICY)
    variables = block_d.init(jax.random.PRNGKey(0), x)
    y_d = np.asarray(block_d.apply(variables, x), np.float32)

    block_q = ResnetBlock(in_channels=128, out_channels=128, policy=INT8_POLICY)
    y_q = np.asarray(block_q.apply(variables, x), np.float32)
    rms = float(np.sqrt(np.mean((y_d - y_q) ** 2)) / (np.std(y_d) + 1e-8))
    assert rms < 0.05, rms


def test_dispatch_rule():
    ok = dict(x_shape=(2, 32, 32, 256), kernel_shape=(3, 3, 256, 256), strides=(1, 1))
    assert should_use_int8(**ok, compute_dtype=jnp.bfloat16)
    assert not should_use_int8(**ok, compute_dtype=jnp.float32)
    assert not should_use_int8(
        (2, 32, 32, 64), (3, 3, 64, 256), (1, 1), jnp.bfloat16
    )
    assert not should_use_int8(
        (2, 32, 32, 256), (3, 3, 256, 256), (2, 2), jnp.bfloat16
    )
    assert not should_use_int8(
        (2, 32, 32, 256), (1, 1, 256, 256), (1, 1), jnp.bfloat16
    )


def test_policy_from_name():
    from eovax.core.precision import INT8_POLICY, policy_from_name

    assert policy_from_name("int8") is INT8_POLICY
    assert policy_from_name("w8a8") is INT8_POLICY


def test_grad_through_int8_raises():
    """Inference-only enforcement: differentiating through the quantized
    conv raises instead of silently producing zero kernel gradients."""
    import pytest

    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(lambda w: jnp.sum(int8_conv3x3(x, w, None)))(w)
