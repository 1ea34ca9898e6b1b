"""Multi-stage dynamic decoder variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eovax.nn.multi_stage import (
    MultiStageDynamicDecoder,
    ProgressiveMultiStageDynamicDecoder,
    StackedDynamicDecoder,
)

WVS = jnp.asarray([0.665, 0.56, 0.49], jnp.float32)


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (MultiStageDynamicDecoder, dict(num_shared_blocks=1)),
        (MultiStageDynamicDecoder, dict(num_shared_blocks=1, use_enhanced_generator=False)),
        (StackedDynamicDecoder, dict(num_stack_layers=2)),
        (ProgressiveMultiStageDynamicDecoder, dict(num_stages=2)),
    ],
)
def test_multi_stage_decoder_shapes_and_distill(cls, kwargs):
    mod = cls(wv_planes=64, embed_dim=32, num_layers=1, **kwargs)
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((2, 16, 16, 32), dtype=np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, WVS)
    out = mod.apply(variables, x, WVS)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    w, b = mod.apply(variables, WVS, method=cls.get_distillation_weight)
    assert w.shape == (3, 32, 3, 3)  # torch layout, stage-1 compatible
    assert b.shape == (3,)
