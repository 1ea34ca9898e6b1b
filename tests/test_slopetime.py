"""eovax.utils.slopetime — the shared slope-method timing helpers.

These back every committed perf number (bench.py, scripts/ablate_*.py,
`eovax.cli.benchmark --all`), so the contract is pinned: warm-then-min
protocol, big operands as jit args, and the random-variables builder's
BN reset.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eovax.utils.slopetime import (
    chained_ms,
    random_variables,
    scalar_chained_ms,
    slope_ms,
)


def test_slope_ms_call_protocol_and_slope():
    """slope_ms must call loop() warm twice + timed twice per length and
    return the per-iteration slope (not the absolute time)."""
    calls = []

    def loop(x0, n):
        calls.append(n)
        return jnp.zeros(()) + x0 * n

    ms = slope_ms(loop, 1.0, lo=3, hi=9)
    assert calls == [3, 3, 9, 9, 3, 3, 9, 9]
    assert isinstance(ms, float)


def test_chained_ms_runs_fn_n_times():
    """The fori_loop wrapper must apply fn exactly n times (carry chain),
    with consts arriving as a jit argument."""
    out = {}

    def fn(c, x):
        return x * c

    # capture the loop result via a probe: 2^n scaling proves n applications
    from eovax.utils import slopetime as st

    orig = st.slope_ms

    def probe(loop, x0, lo, hi):
        out["val"] = float(loop(x0, 5))
        return 0.0

    st.slope_ms = probe
    try:
        chained_ms(fn, jnp.asarray(1.0), consts=jnp.asarray(2.0), lo=5, hi=15)
    finally:
        st.slope_ms = orig
    assert out["val"] == 32.0  # 2^5


def test_scalar_chained_ms_scalar_contract():
    from eovax.utils import slopetime as st

    out = {}
    orig = st.slope_ms

    def probe(loop, x0, lo, hi):
        assert x0.shape == () and x0.dtype == jnp.float32
        out["val"] = float(loop(x0, 4))
        return 0.0

    st.slope_ms = probe
    try:
        scalar_chained_ms(lambda c, s: s + c, consts=jnp.asarray(1.0), lo=4, hi=12)
    finally:
        st.slope_ms = orig
    assert out["val"] == 4.0


def test_random_variables_shapes_and_bn_reset():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(4)(x)
            return nn.BatchNorm(
                use_running_average=not train, name="bn", axis_name=None
            )(x)

    m = M()
    x = jnp.zeros((2, 3))
    v = random_variables(lambda: m.init(jax.random.PRNGKey(0), x))
    assert v["params"]["Dense_0"]["kernel"].shape == (3, 4)
    # weights are N(0, 0.02), not zeros
    assert 0 < float(jnp.abs(v["params"]["Dense_0"]["kernel"]).max()) < 0.2
    # BN running stats at the conventional path are reset to identity
    np.testing.assert_array_equal(np.asarray(v["batch_stats"]["bn"]["mean"]), 0)
    np.testing.assert_array_equal(np.asarray(v["batch_stats"]["bn"]["var"]), 1)
