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


def test_prequant_matches_dynamic():
    """Export-time quantized weights + dynamic activations reproduce the
    on-the-fly int8 conv exactly (same math, weight pass hoisted)."""
    from eovax.kernels.qconv import int8_conv3x3_prequant

    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((2, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(g.standard_normal((128,)), jnp.float32)
    ref = int8_conv3x3(x, w, b, compute_dtype=jnp.float32)
    wq, sw = quantize_symmetric(w, axis=(0, 1, 2))
    got = int8_conv3x3_prequant(x, wq, sw.reshape(-1), b, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_prequant_static_act_scale_saturates():
    """A calibrated act_scale replaces the dynamic range: with the true
    abs-max it matches the dynamic path; with a smaller range, outliers
    saturate instead of inflating the scale."""
    from eovax.kernels.qconv import int8_conv3x3_prequant

    g = np.random.default_rng(4)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(g.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    wq, sw = quantize_symmetric(w, axis=(0, 1, 2))
    amax = float(jnp.max(jnp.abs(x)))
    dyn = int8_conv3x3_prequant(x, wq, sw.reshape(-1), None, compute_dtype=jnp.float32)
    stat = int8_conv3x3_prequant(
        x, wq, sw.reshape(-1), None, act_scale=amax, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(stat), np.asarray(dyn), atol=1e-5)
    # An outlier 100× the body: the dynamic scale loses body resolution;
    # a clipped static scale keeps it (error vs fp32 smaller).
    x_out = x.at[0, 0, 0, 0].set(100.0)
    ref = jax.lax.conv_general_dilated(
        x_out, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dyn_o = int8_conv3x3_prequant(x_out, wq, sw.reshape(-1), None,
                                  compute_dtype=jnp.float32)
    stat_o = int8_conv3x3_prequant(x_out, wq, sw.reshape(-1), None,
                                   act_scale=amax, compute_dtype=jnp.float32)
    # Away from the outlier's 3×3 receptive field, the calibrated scale
    # preserves body resolution the outlier-inflated dynamic scale loses.
    body = (slice(None), slice(3, None), slice(3, None), slice(None))
    err_dyn = float(jnp.sqrt(jnp.mean((dyn_o[body] - ref[body]) ** 2)))
    err_stat = float(jnp.sqrt(jnp.mean((stat_o[body] - ref[body]) ** 2)))
    assert err_stat < err_dyn / 5, (err_stat, err_dyn)


def test_quantize_params_int8_walk():
    """Eligible kernels become int8+kernel_scale (+act_scale when
    calibrated); stems and small convs are untouched."""
    from eovax.kernels.qconv import quantize_params_int8

    g = np.random.default_rng(5)

    def conv_leaf(*shape):
        return {
            "kernel": jnp.asarray(g.standard_normal(shape), jnp.float32),
            "bias": jnp.zeros((shape[-1],), jnp.float32),
        }

    params = {
        "encoder": {
            "mid_block_1": {"conv1": conv_leaf(3, 3, 128, 128)},
            # dispatch name + block scope but small channels: ineligible
            "down_0_block_0": {"conv2": conv_leaf(3, 3, 3, 128)},
            # NOT a policy_conv3x3 owner (plain nn.Conv would read int8
            # raw): ineligible even with a body-conv-shaped kernel.
            "downsample": conv_leaf(3, 3, 128, 128),
            # multi_stage-style decoy: conv1 name, eligible shape, but a
            # non-block parent scope — must stay fp32.
            "refine": {"conv1": conv_leaf(3, 3, 128, 128)},
        }
    }
    scales = {("encoder", "mid_block_1", "conv1"): 4.2}
    qp, n = quantize_params_int8(params, act_scales=scales)
    assert n == 1
    c1 = qp["encoder"]["mid_block_1"]["conv1"]
    assert c1["kernel"].dtype == jnp.int8
    assert c1["kernel_scale"].shape == (128,)
    assert float(c1["act_scale"]) == np.float32(4.2)
    assert qp["encoder"]["down_0_block_0"]["conv2"]["kernel"].dtype == jnp.float32
    assert "kernel_scale" not in qp["encoder"]["downsample"]
    assert qp["encoder"]["refine"]["conv1"]["kernel"].dtype == jnp.float32
    # Dequantized weights approximate the originals.
    deq = c1["kernel"].astype(jnp.float32) * c1["kernel_scale"]
    orig = params["encoder"]["mid_block_1"]["conv1"]["kernel"]
    assert float(jnp.max(jnp.abs(deq - orig))) <= float(
        jnp.max(jnp.abs(orig))) / 127.0 + 1e-6


def test_resnet_block_prequant_close_to_direct():
    """The block dispatch consumes export-quantized params: int8 kernel +
    kernel_scale in the tree → prequant path, output close to bf16."""
    from eovax.core.precision import DEFAULT_POLICY, INT8_POLICY
    from eovax.kernels.qconv import quantize_params_int8
    from eovax.nn.blocks import ResnetBlock

    g = np.random.default_rng(6)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 128)), jnp.float32)
    block_d = ResnetBlock(in_channels=128, out_channels=128, policy=DEFAULT_POLICY)
    variables = block_d.init(jax.random.PRNGKey(0), x)
    y_d = np.asarray(block_d.apply(variables, x), np.float32)

    # Production trees nest blocks under their model scope (the walk
    # requires the block-scope parent name); wrap and unwrap.
    qwrap, n = quantize_params_int8({"up_0_block_0": variables["params"]})
    qparams = qwrap["up_0_block_0"]
    assert n == 2  # conv1 + conv2
    block_q = ResnetBlock(in_channels=128, out_channels=128, policy=INT8_POLICY)
    y_q = np.asarray(block_q.apply({"params": qparams}, x), np.float32)
    rms = float(np.sqrt(np.mean((y_d - y_q) ** 2)) / (np.std(y_d) + 1e-8))
    assert rms < 0.05, rms


def test_calibration_sow_and_reduce():
    """int8-calib policy sows per-conv percentile amax; the reducer maps
    them to the conv module paths quantize_params_int8 uses."""
    from eovax.core.precision import INT8_CALIB_POLICY
    from eovax.kernels.qconv import (
        act_scales_from_calibration,
        quantize_params_int8,
    )
    from eovax.nn.blocks import ResnetBlock

    g = np.random.default_rng(7)
    block = ResnetBlock(in_channels=128, out_channels=128,
                        policy=INT8_CALIB_POLICY)
    x1 = jnp.asarray(g.standard_normal((1, 8, 8, 128)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x1)
    trees = []
    for seed in range(2):
        xb = jnp.asarray(
            np.random.default_rng(seed).standard_normal((1, 8, 8, 128)),
            jnp.float32,
        )
        _, aux = block.apply(variables, xb, mutable=["calib"])
        trees.append(jax.device_get(aux["calib"]))
    scales = act_scales_from_calibration(trees)
    assert set(scales) == {("conv1",), ("conv2",)}
    assert all(v > 0 for v in scales.values())
    wrapped_scales = {("mid_block_1",) + k: v for k, v in scales.items()}
    qp, n = quantize_params_int8(
        {"mid_block_1": variables["params"]}, act_scales=wrapped_scales
    )
    assert n == 2
    assert float(qp["mid_block_1"]["conv1"]["act_scale"]) == np.float32(
        scales[("conv1",)]
    )


def test_quantize_params_int8_idempotent():
    """Re-exporting an already-quantized tree must pass int8 kernels and
    their scales through UNCHANGED: the pre-fix walk re-quantized the raw
    int8 integers and then overwrote the fresh scale with the stale one
    (silently corrupt weights)."""
    from eovax.kernels.qconv import quantize_params_int8

    g = np.random.default_rng(7)
    params = {
        "mid_block_1": {
            "conv1": {
                "kernel": jnp.asarray(g.standard_normal((3, 3, 128, 128)),
                                      jnp.float32),
                "bias": jnp.zeros((128,), jnp.float32),
            }
        }
    }
    q1, n1 = quantize_params_int8(params)
    assert n1 == 1
    q2, n2 = quantize_params_int8(q1)
    assert n2 == 0
    c1, c2 = q1["mid_block_1"]["conv1"], q2["mid_block_1"]["conv1"]
    np.testing.assert_array_equal(np.asarray(c1["kernel"]), np.asarray(c2["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(c1["kernel_scale"]), np.asarray(c2["kernel_scale"])
    )
