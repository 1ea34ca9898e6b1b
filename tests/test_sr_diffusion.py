"""Stage-3 diffusion tests: schedules, denoisers, DDIM sampler, SR trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eovax.core.precision import FULL_PRECISION
from eovax.models.sr_diffusion import (
    DDIMSampler,
    KarrasDenoiser,
    RectifiedSchedule,
    SimpleDenoiser,
    VPSchedule,
)
from eovax.models.unet import UNet


def test_schedules():
    r = RectifiedSchedule()
    v = VPSchedule()
    t = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(r.alpha(t), [1.0, 0.5, 0.0])
    np.testing.assert_allclose(r.sigma(t), [0.0, 0.5, 1.0])
    np.testing.assert_allclose(
        v.alpha(t) ** 2 + v.sigma(t) ** 2, [1, 1, 1], atol=1e-6
    )


def _toy_unet():
    unet = UNet(
        in_channels=4, out_channels=4, cond_channels=4,
        hid_channels=(32, 16), hid_blocks=(1, 1), policy=FULL_PRECISION,
    )
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    params = unet.init(jax.random.PRNGKey(0), x, t, x)["params"]

    def apply_fn(params, x_t, t, cond):
        return unet.apply({"params": params}, x_t, t, cond)

    return apply_fn, params


def test_unet_shapes():
    apply_fn, params = _toy_unet()
    x = jnp.ones((2, 16, 16, 4))
    out = apply_fn(params, x, jnp.asarray([0.1, 0.9]), x)
    assert out.shape == (2, 16, 16, 4)


def test_ddim_exact_on_analytic_denoiser():
    """With a perfect denoiser (constant x0), DDIM must recover x0 exactly
    regardless of the noise init."""
    x0 = jnp.full((2, 8, 8, 4), 1.7)

    class Perfect:
        schedule = RectifiedSchedule()

        def denoise(self, params, x_t, t, cond=None):
            return x0

    sampler = DDIMSampler(Perfect(), steps=10)
    x1 = sampler.init(jax.random.PRNGKey(0), x0.shape)
    out = sampler(None, x1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


@pytest.mark.parametrize("denoiser_cls", [SimpleDenoiser, KarrasDenoiser])
@pytest.mark.slow
def test_denoiser_loss_finite_and_grad(denoiser_cls):
    apply_fn, params = _toy_unet()
    den = denoiser_cls(apply_fn=apply_fn)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4), dtype=np.float32))
    t = jnp.asarray([0.3, 0.8])
    loss, grads = jax.value_and_grad(
        lambda p: den.loss(p, jax.random.PRNGKey(1), x, t, cond=x)
    )(params)
    assert np.isfinite(float(loss))
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    )
    assert gnorm > 0


@pytest.mark.slow
def test_sr_trainer_overfits_identity():
    """Train the toy conditional denoiser on hr == cond: with perfect
    conditioning available, loss should drop quickly and sampling should
    approach the target."""
    from eovax.train.sr import DiffusionSuperRes

    apply_fn, params = _toy_unet()
    den = SimpleDenoiser(apply_fn=apply_fn)
    trainer = DiffusionSuperRes(
        denoiser=den, init_params=params, sampler_steps=8,
        base_lr=2e-3, log_every=0, seed=0,
    )
    g = np.random.default_rng(0)
    hr = g.standard_normal((8, 8, 8, 4), dtype=np.float32)
    batch = {"image_hr": hr, "image_lr": hr}

    state = trainer.init_state()
    k = jax.random.PRNGKey(0)
    loss0 = float(den.loss(state.params, k, jnp.asarray(hr), jnp.full((8,), 0.5), cond=jnp.asarray(hr)))
    state = trainer.fit(iter([batch] * 60), max_steps=60, state=state)
    loss1 = float(den.loss(state.params, k, jnp.asarray(hr), jnp.full((8,), 0.5), cond=jnp.asarray(hr)))
    assert loss1 < loss0 * 0.5, (loss0, loss1)

    val = trainer.validate(state, iter([batch]), max_batches=1)
    assert np.isfinite(val["val_mse"])

    out = trainer.sample(state, hr.shape, cond=hr, seed=1)
    assert out.shape == hr.shape


def test_cached_ddim_close_to_exact():
    """Encoder-propagation sampler tracks the exact DDIM closely on a
    trained-ish toy model (it is an approximation by design)."""
    from eovax.models.sr_diffusion import CachedDDIMSampler

    apply_fn, params = _toy_unet()

    # Rebuild the underlying UNet module to hand to the cached sampler.
    from eovax.core.precision import FULL_PRECISION
    from eovax.models.unet import UNet

    unet = UNet(in_channels=4, out_channels=4, cond_channels=4,
                hid_channels=(32, 16), hid_blocks=(1, 1), policy=FULL_PRECISION)

    den = SimpleDenoiser(apply_fn=apply_fn)
    g = np.random.default_rng(0)
    cond = jnp.asarray(g.standard_normal((2, 8, 8, 4), dtype=np.float32))

    exact = DDIMSampler(den, steps=8)
    cached = CachedDDIMSampler(den, unet, steps=8, cache_every=2)
    x1 = exact.init(jax.random.PRNGKey(0), (2, 8, 8, 4))

    out_exact = np.asarray(exact(params, x1, cond=cond))
    out_cached = np.asarray(cached(params, x1, cond=cond))
    assert np.isfinite(out_cached).all()
    # Same sampler when every step is a key step.
    out_key_all = np.asarray(
        CachedDDIMSampler(den, unet, steps=8, cache_every=1)(params, x1, cond=cond)
    )
    np.testing.assert_allclose(out_key_all, out_exact, rtol=1e-4, atol=1e-4)
    # Approximation stays in the same ballpark.
    scale = np.abs(out_exact).mean() + 1e-6
    assert np.abs(out_cached - out_exact).mean() / scale < 0.5


def test_dpmpp2m_exact_on_analytic_denoiser():
    """With a perfect denoiser (constant x0), DPM-Solver++(2M) must
    recover x0 exactly under both schedule families (the multistep
    extrapolation of equal x0 predictions is x0 itself)."""
    from eovax.models.sr_diffusion import DPMSolverPlusPlus2M

    x0 = jnp.full((2, 8, 8, 4), -0.9)
    for schedule in (RectifiedSchedule(), VPSchedule()):

        class Perfect:
            pass

        Perfect.schedule = schedule
        Perfect.denoise = staticmethod(lambda params, x_t, t, cond=None: x0)
        sampler = DPMSolverPlusPlus2M(Perfect(), steps=8)
        x1 = sampler.init(jax.random.PRNGKey(0), x0.shape)
        out = sampler(None, x1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


@pytest.mark.slow
def test_dpmpp2m_fewer_steps_matches_ddim_many():
    """On a smooth toy denoiser, DPM++(2M) at 10 steps should land at
    least as close to the fine-grid solution as DDIM at 10 steps, and
    close to DDIM at 50 steps — the point of the second-order update."""
    from eovax.models.sr_diffusion import DPMSolverPlusPlus2M, make_sampler

    apply_fn, params = _toy_unet()
    den = SimpleDenoiser(apply_fn=apply_fn)
    cond = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 8, 4), dtype=np.float32)
    )
    x1 = DDIMSampler(den, steps=1).init(jax.random.PRNGKey(7), cond.shape)

    ref = np.asarray(DDIMSampler(den, steps=200)(params, x1, cond=cond))
    ddim10 = np.asarray(DDIMSampler(den, steps=10)(params, x1, cond=cond))
    dpm10 = np.asarray(DPMSolverPlusPlus2M(den, steps=10)(params, x1, cond=cond))

    err_ddim = np.abs(ddim10 - ref).mean()
    err_dpm = np.abs(dpm10 - ref).mean()
    # Second order must not be worse; on smooth problems it is clearly
    # better (typical ratios ~2-5x here).
    assert err_dpm <= err_ddim, (err_dpm, err_ddim)

    # factory spellings
    assert isinstance(make_sampler("dpm++2m", den, steps=4), DPMSolverPlusPlus2M)
    assert isinstance(make_sampler("DDIMSampler", den, steps=4), DDIMSampler)
    with pytest.raises(ValueError):
        make_sampler("euler", den, steps=4)


def test_dpmpp2m_final_step_first_order():
    """Regression (round-3 review, empirically 28x worse before the fix):
    the final step's sigma(0)=0 clamp makes h huge, so a second-order
    coefficient there would AMPLIFY the last two x0 predictions'
    difference ~30x. With a denoiser whose prediction drifts with t,
    DPM++(2M) must stay at least as accurate as DDIM."""
    from eovax.models.sr_diffusion import DPMSolverPlusPlus2M

    x0 = jnp.full((1, 8, 8, 4), 0.5)

    class Drifting:
        schedule = RectifiedSchedule()

        def denoise(self, params, x_t, t, cond=None):
            return x0 + 0.01 * t.reshape(-1, 1, 1, 1)

    den = Drifting()
    x1 = DDIMSampler(den, steps=1).init(jax.random.PRNGKey(0), x0.shape)
    for steps in (10, 50):
        ddim = np.asarray(DDIMSampler(den, steps=steps)(None, x1))
        dpm = np.asarray(DPMSolverPlusPlus2M(den, steps=steps)(None, x1))
        err_ddim = np.abs(ddim - np.asarray(x0)).max()
        err_dpm = np.abs(dpm - np.asarray(x0)).max()
        assert err_dpm <= err_ddim * 1.5, (steps, err_dpm, err_ddim)
