"""Diffusion machinery for latent super-resolution (azula replacement).

The reference trains stage 3 against the external ``azula`` library,
referenced only through config ``_target_`` strings
(configs_superres/eo_vae_latent.yaml:32-48: SimpleDenoiser + UNet +
RectifiedSchedule + DDIMSampler(steps=50); pixel baseline:
KarrasDenoiser + VPSchedule — configs_superres/pixel.yaml:33-48). SURVEY.md
§7 hard-part #7 calls for rebuilding these from their configs; everything
here is an original JAX implementation of those standard algorithms.

Conventions: continuous time t ∈ [0, 1]; a schedule defines
x_t = alpha(t)·x + sigma(t)·eps; denoisers predict E[x | x_t]; the DDIM
sampler runs the deterministic probability-flow update as a `lax.scan`
(compiler-friendly, one compiled program for all 50 steps).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Noise schedules
# ---------------------------------------------------------------------------


class RectifiedSchedule:
    """Rectified flow / linear interpolation: alpha = 1 − t, sigma = t."""

    def alpha(self, t: jax.Array) -> jax.Array:
        return 1.0 - t

    def sigma(self, t: jax.Array) -> jax.Array:
        return jnp.asarray(t)


class VPSchedule:
    """Variance-preserving: alpha = cos(π t / 2), sigma = sin(π t / 2)
    (alpha² + sigma² = 1)."""

    def alpha(self, t: jax.Array) -> jax.Array:
        return jnp.cos(0.5 * jnp.pi * t)

    def sigma(self, t: jax.Array) -> jax.Array:
        return jnp.sin(0.5 * jnp.pi * t)


@dataclasses.dataclass(frozen=True)
class DecaySchedule:
    """Variance-exploding schedule with geometrically decaying noise level:
    alpha = 1, sigma(t) = sigma_min^(1−t) · sigma_max^t (EDM's log-linear
    sigma ladder, Karras et al. 2022 §5).

    Fills the role of ``azula.noise.DecaySchedule``
    (configs_superres/eo_vae_latent_batch.yaml:44) — azula is a closed box
    for the reference (SURVEY.md §7), so the schedule is re-derived from
    its pairing with the Karras-preconditioned denoiser rather than
    translated.
    """

    sigma_min: float = 1e-3
    sigma_max: float = 80.0

    def alpha(self, t: jax.Array) -> jax.Array:
        return jnp.ones_like(jnp.asarray(t, jnp.float32))

    def sigma(self, t: jax.Array) -> jax.Array:
        t = jnp.asarray(t, jnp.float32)
        return self.sigma_min ** (1.0 - t) * self.sigma_max**t


# ---------------------------------------------------------------------------
# Denoisers
# ---------------------------------------------------------------------------


def _bshape(v: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a per-sample scalar over image dims."""
    return v.reshape(v.shape[0], *([1] * (x.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class SimpleDenoiser:
    """x0-prediction denoiser: backbone(x_t, t, cond) → E[x | x_t].

    ``loss(params, rng, x, t, cond)`` = MSE(x0_hat, x) with x_t sampled
    from the schedule — the training objective for the latent-SR stage.
    """

    apply_fn: Callable[..., jax.Array]  # (params, x_t, t, cond) -> x0_hat
    schedule: Any = dataclasses.field(default_factory=RectifiedSchedule)

    def denoise(self, params, x_t, t, cond=None):
        return self.apply_fn(params, x_t, t, cond)

    def postprocess(self, params, raw, x_t, t):
        """Raw backbone output → x0_hat (identity for x0-prediction);
        hook used by samplers that evaluate the backbone directly."""
        return raw.astype(jnp.float32)

    def loss(self, params, rng, x, t, cond=None):
        eps = jax.random.normal(rng, x.shape, jnp.float32)
        a = _bshape(self.schedule.alpha(t), x)
        s = _bshape(self.schedule.sigma(t), x)
        x_t = a * x + s * eps
        x0_hat = self.denoise(params, x_t, t, cond)
        return jnp.mean((x0_hat.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)


@dataclasses.dataclass(frozen=True)
class KarrasDenoiser:
    """EDM-preconditioned denoiser (Karras et al. 2022) for the pixel-space
    baseline: x0_hat = c_skip·x_t + c_out·backbone(c_in·x_t, t, cond),
    loss weighted by 1/c_out²."""

    apply_fn: Callable[..., jax.Array]
    schedule: Any = dataclasses.field(default_factory=VPSchedule)
    sigma_data: float = 1.0

    def _coeffs(self, t):
        a = self.schedule.alpha(t)
        s = self.schedule.sigma(t)
        # Work in the EDM sigma domain: sig = s / a (guard a→0).
        sig = s / jnp.maximum(a, 1e-4)
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sig**2 + sd2)
        c_out = sig * self.sigma_data / jnp.sqrt(sig**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sig**2 + sd2)
        return c_skip, c_out, c_in

    def denoise(self, params, x_t, t, cond=None):
        a = _bshape(self.schedule.alpha(t), x_t)
        x_hat = x_t / jnp.maximum(a, 1e-4)  # rescale to x + sig·eps domain
        c_skip, c_out, c_in = (_bshape(c, x_t) for c in self._coeffs(t))
        f = self.apply_fn(params, (c_in * x_hat).astype(x_t.dtype), t, cond)
        return c_skip * x_hat + c_out * f.astype(jnp.float32)

    def loss(self, params, rng, x, t, cond=None):
        eps = jax.random.normal(rng, x.shape, jnp.float32)
        a = _bshape(self.schedule.alpha(t), x)
        s = _bshape(self.schedule.sigma(t), x)
        x_t = a * x + s * eps
        x0_hat = self.denoise(params, x_t, t, cond)
        _, c_out, _ = (_bshape(c, x) for c in self._coeffs(t))
        w = 1.0 / jnp.maximum(c_out**2, 1e-8)
        return jnp.mean(w * (x0_hat - x.astype(jnp.float32)) ** 2)


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DDIMSampler:
    """Deterministic DDIM over the denoiser's schedule, as one lax.scan.

    Update (x0-parameterization):
        x_s = alpha_s · x0_hat + (sigma_s / sigma_t) · (x_t − alpha_t · x0_hat)
    over a uniform time grid 1 = t_0 > … > t_N = 0.
    """

    denoiser: Any
    steps: int = 50

    def init(self, rng, shape) -> jax.Array:
        """x_1 ~ N(0, sigma(1)²) — pure noise under both schedules."""
        s1 = self.denoiser.schedule.sigma(jnp.asarray(1.0, jnp.float32))
        return jax.random.normal(rng, shape, jnp.float32) * s1

    def __call__(self, params, x1: jax.Array, cond=None) -> jax.Array:
        sched = self.denoiser.schedule
        ts = jnp.linspace(1.0, 0.0, self.steps + 1)

        def body(x_t, i):
            t = jnp.full((x_t.shape[0],), ts[i], jnp.float32)
            s = jnp.full((x_t.shape[0],), ts[i + 1], jnp.float32)
            x0_hat = self.denoiser.denoise(params, x_t, t, cond).astype(jnp.float32)
            a_t = _bshape(sched.alpha(t), x_t)
            a_s = _bshape(sched.alpha(s), x_t)
            s_t = _bshape(jnp.maximum(sched.sigma(t), 1e-8), x_t)
            s_s = _bshape(sched.sigma(s), x_t)
            x_next = a_s * x0_hat + (s_s / s_t) * (x_t - a_t * x0_hat)
            return x_next, None

        x0, _ = jax.lax.scan(body, x1.astype(jnp.float32), jnp.arange(self.steps))
        return x0


@dataclasses.dataclass(frozen=True)
class DPMSolverPlusPlus2M:
    """DPM-Solver++(2M): deterministic second-order multistep sampler in
    the data-prediction (x0) parameterization (Lu et al. 2022, §4.2 /
    Algorithm 2 — "2M" = 2nd-order multistep, one denoiser eval per step).

    Per uniform grid 1 = t_0 > … > t_N = 0, with λ_t = log(α_t / σ_t):
        h_i = λ_{t_i} − λ_{t_{i−1}},  r_i = h_{i−1} / h_i
        D_i = (1 + 1/(2 r_i)) · x0_i − 1/(2 r_i) · x0_{i−1}   (D_1 = x0_1)
        x_{t_i} = (σ_{t_i}/σ_{t_{i−1}}) · x_{t_{i−1}} − α_{t_i}·expm1(−h_i)·D_i

    The second-order correction extrapolates the denoiser trajectory, so
    ~½–⅓ of the DDIM step count reaches comparable discretization error —
    a capability the reference (azula DDIM only) does not ship. Endpoint
    singularities (α(1)=0, σ(0)=0 ⇒ λ = ∓∞) are handled by clamping inside
    the log: the resulting |h| ≈ 90 makes expm1(−h) = −1 exactly, which is
    the analytic limit (first step ≡ DDIM step; last step returns D_N).
    No reference counterpart; same lax.scan single-program structure as
    :class:`DDIMSampler`.
    """

    denoiser: Any
    steps: int = 20

    def init(self, rng, shape) -> jax.Array:
        s1 = self.denoiser.schedule.sigma(jnp.asarray(1.0, jnp.float32))
        return jax.random.normal(rng, shape, jnp.float32) * s1

    def __call__(self, params, x1: jax.Array, cond=None) -> jax.Array:
        sched = self.denoiser.schedule
        ts = jnp.linspace(1.0, 0.0, self.steps + 1)
        tiny = 1e-20
        lam = jnp.log(jnp.maximum(sched.alpha(ts), tiny)) - jnp.log(
            jnp.maximum(sched.sigma(ts), tiny)
        )

        def body(carry, i):
            x_t, x0_prev = carry
            t = jnp.full((x_t.shape[0],), ts[i], jnp.float32)
            x0 = self.denoiser.denoise(params, x_t, t, cond).astype(jnp.float32)
            h = lam[i + 1] - lam[i]
            h_prev = lam[i] - lam[jnp.maximum(i - 1, 0)]
            # r → second-order weight; first step (h_prev = 0) and the
            # post-endpoint step (h_prev = ±inf-clamped huge) both reduce
            # toward first order, which is the correct limit. The FINAL
            # step must also drop to first order (diffusers
            # `lower_order_final` / k-diffusion's sigma==0 special case):
            # there sigma(0)=0 clamps h to ~40, making c = h/(2·h_prev)
            # ≈ 20-30 — which would AMPLIFY the last two predictions'
            # difference ~30× instead of integrating it (verified: 28×
            # worse than DDIM on a drifting denoiser before this fix).
            r = h_prev / h
            first_order = (i == 0) | (i == self.steps - 1)
            c = jnp.where(first_order, 0.0, 1.0 / (2.0 * jnp.maximum(r, 1e-8)))
            d = (1.0 + c) * x0 - c * x0_prev
            # scalar grid values broadcast over [B,H,W,C] directly
            s_t = jnp.maximum(sched.sigma(ts[i]), 1e-8)
            s_s = sched.sigma(ts[i + 1])
            a_s = sched.alpha(ts[i + 1])
            x_next = (s_s / s_t) * x_t - a_s * jnp.expm1(-h) * d
            return (x_next, x0), None

        (x0_final, _), _ = jax.lax.scan(
            body, (x1.astype(jnp.float32), jnp.zeros_like(x1, jnp.float32)),
            jnp.arange(self.steps),
        )
        return x0_final


#: accepted spellings → sampler class (config `_target_` names included).
_SAMPLERS = {
    "ddim": lambda den, steps: DDIMSampler(den, steps=steps),
    "ddimsampler": lambda den, steps: DDIMSampler(den, steps=steps),
    "dpm++2m": lambda den, steps: DPMSolverPlusPlus2M(den, steps=steps),
    "dpmsolverplusplus2m": lambda den, steps: DPMSolverPlusPlus2M(den, steps=steps),
}


def make_sampler(name: str, denoiser, *, steps: int):
    """Sampler factory by name ("ddim" | "dpm++2m", case-insensitive,
    config ``_target_`` spellings accepted)."""
    try:
        return _SAMPLERS[name.lower()](denoiser, steps)
    except KeyError:
        raise ValueError(
            f"Unknown sampler {name!r}; choose from {sorted(_SAMPLERS)}"
        ) from None


@dataclasses.dataclass(frozen=True)
class CachedDDIMSampler:
    """DDIM with UNet encoder-feature caching across timesteps.

    Implements "encoder propagation" (Li et al., Faster Diffusion,
    arXiv:2312.09608): the UNet's downsampling-path features change slowly
    across adjacent timesteps, so non-key steps reuse the previous key
    step's (bottleneck, skip) features and only run the decoder path with a
    fresh time embedding — cutting ~the encoder's share of FLOPs on
    (1 − 1/cache_every) of the steps. An approximation: outputs drift
    slightly from the exact sampler (opt-in; default sampler stays exact).

    Requires an eovax UNet (exposes encode_path/decode_path); runs as one
    `lax.scan` with the feature cache in the carry.
    """

    denoiser: Any
    unet: Any  # eovax.models.unet.UNet module
    steps: int = 50
    cache_every: int = 2

    def init(self, rng, shape) -> jax.Array:
        s1 = self.denoiser.schedule.sigma(jnp.asarray(1.0, jnp.float32))
        return jax.random.normal(rng, shape, jnp.float32) * s1

    def __call__(self, params, x1: jax.Array, cond=None) -> jax.Array:
        if not hasattr(self.denoiser, "postprocess"):
            # KarrasDenoiser applies EDM c_in preconditioning to the UNet
            # INPUT and combines c_skip/c_out on the output — the cached
            # encoder-propagation scheme feeds raw x_t and only
            # post-combines, so it is only valid for x0-prediction
            # denoisers (SimpleDenoiser). Fail clearly instead of an
            # AttributeError at trace time.
            raise TypeError(
                f"CachedDDIMSampler requires an x0-prediction denoiser "
                f"exposing .postprocess (e.g. SimpleDenoiser); got "
                f"{type(self.denoiser).__name__}. Use the exact "
                f"DDIMSampler for preconditioned (Karras) denoisers."
            )
        sched = self.denoiser.schedule
        ts = jnp.linspace(1.0, 0.0, self.steps + 1)
        unet = self.unet

        def full_eval(x_t, t):
            h, skips = unet.apply(
                {"params": params}, x_t, t, cond, method=unet.encode_path
            )
            out = unet.apply(
                {"params": params}, h, skips, t, method=unet.decode_path
            )
            return out, (h, skips)

        def cached_eval(cache, t):
            h, skips = cache
            return unet.apply(
                {"params": params}, h, skips, t, method=unet.decode_path
            )

        # Scan-carry cache placeholder: step 0 is always a key step that
        # rebuilds the cache before any cached_step reads it, so only the
        # SHAPE matters — eval_shape + zeros instead of a full UNet eval
        # whose output would be discarded (one of steps+1 evals, ~2%).
        t0 = jnp.full((x1.shape[0],), ts[0], jnp.float32)
        cache_shape = jax.eval_shape(
            lambda x, t: full_eval(x, t)[1], x1.astype(jnp.float32), t0
        )
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), cache_shape
        )

        def body(carry, i):
            x_t, cache = carry
            t = jnp.full((x_t.shape[0],), ts[i], jnp.float32)
            s = jnp.full((x_t.shape[0],), ts[i + 1], jnp.float32)

            def key_step(_):
                out, new_cache = full_eval(x_t, t)
                return out, new_cache

            def cached_step(_):
                return cached_eval(cache, t), cache

            is_key = (i % self.cache_every) == 0
            raw, cache_new = jax.lax.cond(is_key, key_step, cached_step, None)
            x0_hat = self.denoiser.postprocess(params, raw, x_t, t)

            a_t = _bshape(sched.alpha(t), x_t)
            a_s = _bshape(sched.alpha(s), x_t)
            s_t = _bshape(jnp.maximum(sched.sigma(t), 1e-8), x_t)
            s_s = _bshape(sched.sigma(s), x_t)
            x_next = a_s * x0_hat + (s_s / s_t) * (x_t - a_t * x0_hat)
            return (x_next, cache_new), None

        (x0, _), _ = jax.lax.scan(
            body, (x1.astype(jnp.float32), cache0), jnp.arange(self.steps)
        )
        return x0
