"""Fused GroupNorm (Pallas stats) — parity with nn.GroupNorm fwd+bwd."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eovax.kernels.groupnorm import gn_channel_sums, group_norm


@pytest.mark.parametrize("shape", [(2, 16, 16, 64), (2, 8, 8, 32), (1, 32, 4, 128)])
def test_channel_sums_kernel_interpret(shape):
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal(shape, dtype=np.float32)).astype(jnp.bfloat16)
    s, s2 = gn_channel_sums(x, interpret=True)
    xf = np.asarray(x, np.float32)
    np.testing.assert_allclose(np.asarray(s), xf.sum((1, 2)), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), (xf * xf).sum((1, 2)), rtol=1e-3, atol=1e-2)


def _flax_gn(x, scale, bias, groups, eps):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    variables = {"params": {"scale": scale, "bias": bias}}
    return mod.apply(variables, x)


@pytest.mark.parametrize("groups", [4, 8])
def test_group_norm_matches_flax(groups):
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((2, 8, 8, 32), dtype=np.float32))
    scale = jnp.asarray(g.standard_normal(32, dtype=np.float32))
    bias = jnp.asarray(g.standard_normal(32, dtype=np.float32))
    ref = _flax_gn(x, scale, bias, groups, 1e-6)
    out = group_norm(x, scale, bias, groups, 1e-6, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_group_norm_grad_matches_flax():
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((2, 8, 8, 32), dtype=np.float32))
    scale = jnp.asarray(1.0 + 0.1 * g.standard_normal(32, dtype=np.float32))
    bias = jnp.asarray(0.1 * g.standard_normal(32, dtype=np.float32))
    tgt = jnp.asarray(g.standard_normal((2, 8, 8, 32), dtype=np.float32))

    def loss_ref(x, s, b):
        return jnp.mean((_flax_gn(x, s, b, 8, 1e-6) - tgt) ** 2)

    def loss_fused(x, s, b):
        return jnp.mean((group_norm(x, s, b, 8, 1e-6, False) - tgt) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_blocks_fastgroupnorm_param_layout():
    """Param tree stays nn.GroupNorm-compatible (checkpoints unaffected)."""
    from eovax.core.precision import FULL_PRECISION
    from eovax.nn.blocks import ResnetBlock

    blk = ResnetBlock(in_channels=64, out_channels=64, policy=FULL_PRECISION)
    x = jnp.zeros((1, 8, 8, 64))
    variables = blk.init(jax.random.PRNGKey(0), x)
    assert set(variables["params"]["norm1"].keys()) == {"scale", "bias"}
    assert variables["params"]["norm1"]["scale"].shape == (64,)
