"""Golden-value parity tests: eovax NN primitives vs the torch reference.

Each test initializes the torch reference module, converts its state dict
through eovax.utils.torch_convert, and asserts that eovax (NHWC, fp32)
reproduces the torch output within fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eovax.utils.torch_convert import convert_state_dict
from tests._torch_ref import torch_modules, torch_state_dict_numpy

layers_t, dynconv_t, dist_t, model_t = torch_modules()

TOL = dict(rtol=2e-4, atol=2e-5)


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _from_torch(module, template):
    sd = torch_state_dict_numpy(module)
    updates, report = convert_state_dict(sd, template)
    assert not report.unexpected, f"unconverted keys: {report.unexpected}"
    from eovax.utils.torch_convert import _merge_arrays

    merged = {k: dict(v) for k, v in template.items()}
    _merge_arrays(merged, updates)
    return merged


@pytest.fixture(scope="module")
def x32():
    g = np.random.default_rng(0)
    return g.standard_normal((2, 64, 16, 16), dtype=np.float32)


def test_sincos_embed_parity():
    from eovax.nn.dynamic_conv import sincos_wavelength_embed

    wvs = torch.tensor([0.665, 0.56, 0.49])
    ref = dynconv_t.get_1d_sincos_pos_embed_from_grid_torch(256, wvs * 1000).numpy()
    ours = np.asarray(sincos_wavelength_embed(256, jnp.asarray(wvs.numpy()) * 1000.0))
    np.testing.assert_allclose(ours, ref, **TOL)


def test_resnet_block_parity(x32):
    torch.manual_seed(0)
    ref = layers_t.ResnetBlock(in_channels=64, out_channels=128).eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x32)).numpy()

    from eovax.nn.blocks import ResnetBlock

    mod = ResnetBlock(in_channels=64, out_channels=128)
    template = mod.init(jax.random.PRNGKey(0), _nhwc(x32))
    variables = _from_torch(ref, template)
    out = mod.apply(variables, _nhwc(x32))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, **TOL
    )


def test_attn_block_parity(x32):
    torch.manual_seed(1)
    ref = layers_t.AttnBlock(64).eval()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x32)).numpy()

    from eovax.nn.blocks import AttnBlock

    mod = AttnBlock(in_channels=64)
    template = mod.init(jax.random.PRNGKey(0), _nhwc(x32))
    variables = _from_torch(ref, template)
    out = mod.apply(variables, _nhwc(x32))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, rtol=5e-4, atol=5e-5
    )


def test_downsample_upsample_parity(x32):
    torch.manual_seed(2)
    down_ref = layers_t.Downsample(64).eval()
    up_ref = layers_t.Upsample(64).eval()
    with torch.no_grad():
        dref = down_ref(torch.from_numpy(x32)).numpy()
        uref = up_ref(torch.from_numpy(x32)).numpy()

    from eovax.nn.blocks import Downsample, Upsample

    dmod = Downsample(in_channels=64)
    dvars = _from_torch(down_ref, dmod.init(jax.random.PRNGKey(0), _nhwc(x32)))
    dout = dmod.apply(dvars, _nhwc(x32))
    np.testing.assert_allclose(np.transpose(np.asarray(dout), (0, 3, 1, 2)), dref, **TOL)

    umod = Upsample(in_channels=64)
    uvars = _from_torch(up_ref, umod.init(jax.random.PRNGKey(0), _nhwc(x32)))
    uout = umod.apply(uvars, _nhwc(x32))
    np.testing.assert_allclose(np.transpose(np.asarray(uout), (0, 3, 1, 2)), uref, **TOL)


@pytest.mark.parametrize("nwv", [2, 3, 12])
def test_dynamic_conv_encoder_parity(nwv):
    torch.manual_seed(3)
    ref = dynconv_t.DynamicConv(
        wv_planes=128, inter_dim=128, kernel_size=3, stride=1, padding=1,
        embed_dim=32, num_layers=2,
    ).eval()
    g = np.random.default_rng(3)
    x = g.standard_normal((2, nwv, 16, 16), dtype=np.float32)
    wvs = np.linspace(0.49, 2.2, nwv).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(wvs)).numpy()
        w_ref, b_ref = ref.get_distillation_weight(torch.from_numpy(wvs))
        w_ref, b_ref = w_ref.numpy(), b_ref.numpy()

    from eovax.nn.dynamic_conv import DynamicConv

    mod = DynamicConv(wv_planes=128, embed_dim=32, num_layers=2)
    template = mod.init(jax.random.PRNGKey(0), _nhwc(x), jnp.asarray(wvs))
    variables = _from_torch(ref, template)
    out = mod.apply(variables, _nhwc(x), jnp.asarray(wvs))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, rtol=5e-4, atol=5e-5
    )

    w, b = mod.apply(
        variables, jnp.asarray(wvs), method=DynamicConv.get_distillation_weight
    )
    np.testing.assert_allclose(np.asarray(w), w_ref, **TOL)
    np.testing.assert_allclose(np.asarray(b), b_ref, **TOL)


def test_dynamic_conv_decoder_parity():
    torch.manual_seed(4)
    ref = dynconv_t.DynamicConv_decoder(
        wv_planes=128, inter_dim=128, kernel_size=3, stride=1, padding=1,
        embed_dim=32, num_layers=2,
    ).eval()
    g = np.random.default_rng(4)
    x = g.standard_normal((2, 32, 16, 16), dtype=np.float32)
    wvs = np.array([0.665, 0.56, 0.49], dtype=np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(wvs)).numpy()
        w_ref, b_ref = ref.get_distillation_weight(torch.from_numpy(wvs))
        w_ref, b_ref = w_ref.numpy(), b_ref.numpy()

    from eovax.nn.dynamic_conv import DynamicConvDecoder

    mod = DynamicConvDecoder(wv_planes=128, embed_dim=32, num_layers=2)
    template = mod.init(jax.random.PRNGKey(0), _nhwc(x), jnp.asarray(wvs))
    variables = _from_torch(ref, template)
    out = mod.apply(variables, _nhwc(x), jnp.asarray(wvs))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, rtol=5e-4, atol=5e-5
    )

    w, b = mod.apply(
        variables, jnp.asarray(wvs), method=DynamicConvDecoder.get_distillation_weight
    )
    np.testing.assert_allclose(np.asarray(w), w_ref, **TOL)
    np.testing.assert_allclose(np.asarray(b), b_ref, **TOL)


def test_diagonal_gaussian_parity():
    g = np.random.default_rng(5)
    moments = g.standard_normal((2, 8, 4, 4), dtype=np.float32)
    ref = dist_t.DiagonalGaussianDistribution(torch.from_numpy(moments))

    from eovax.nn.distributions import DiagonalGaussian

    ours = DiagonalGaussian.from_moments(_nhwc(moments))
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours.mode()), (0, 3, 1, 2)), ref.mode().numpy(), **TOL
    )
    np.testing.assert_allclose(np.asarray(ours.kl()), ref.kl().numpy(), rtol=1e-4, atol=1e-4)
    sample = torch.from_numpy(
        np.transpose(g.standard_normal((2, 4, 4, 4), dtype=np.float32), (0, 3, 1, 2))
    )
    np.testing.assert_allclose(
        np.asarray(ours.nll(_nhwc(sample.numpy()))),
        ref.nll(sample).numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_latent_shuffle_parity():
    """Packed channel order must match torch's einops (c pi pj) pattern."""
    from einops import rearrange

    from eovax.nn.latent import patch_shuffle, patch_unshuffle

    g = np.random.default_rng(6)
    z = g.standard_normal((2, 8, 8, 8), dtype=np.float32)  # NCHW
    ref = rearrange(
        torch.from_numpy(z), "b c (i pi) (j pj) -> b (c pi pj) i j", pi=2, pj=2
    ).numpy()
    ours = patch_shuffle(_nhwc(z))
    np.testing.assert_array_equal(np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref)
    back = patch_unshuffle(ours)
    np.testing.assert_array_equal(np.asarray(back), np.transpose(z, (0, 2, 3, 1)))


def test_latent_batchnorm_matches_torch():
    from eovax.nn.latent import LatentBatchNorm

    torch_bn = torch.nn.BatchNorm2d(8, affine=False, track_running_stats=True)
    g = np.random.default_rng(7)
    mod = LatentBatchNorm(num_features=8)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 8)), use_running_average=False
    )

    # A few training steps: outputs and running stats must track torch.
    torch_bn.train()
    for step in range(3):
        x = g.standard_normal((4, 8, 6, 6), dtype=np.float32) * (step + 1) + step
        out_ref = torch_bn(torch.from_numpy(x)).detach().numpy()
        out, mutated = mod.apply(
            variables, _nhwc(x), use_running_average=False, mutable=["batch_stats"]
        )
        variables = {**variables, "batch_stats": mutated["batch_stats"]}
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, rtol=1e-4, atol=1e-4
        )

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["bn"]["mean"])
        if "bn" in variables["batch_stats"]
        else np.asarray(variables["batch_stats"]["mean"]),
        torch_bn.running_mean.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    stats = variables["batch_stats"]
    var = stats["bn"]["var"] if "bn" in stats else stats["var"]
    np.testing.assert_allclose(
        np.asarray(var), torch_bn.running_var.numpy(), rtol=1e-4, atol=1e-4
    )

    # Eval mode parity.
    torch_bn.eval()
    x = g.standard_normal((2, 8, 6, 6), dtype=np.float32)
    out_ref = torch_bn(torch.from_numpy(x)).detach().numpy()
    out = mod.apply(variables, _nhwc(x), use_running_average=True)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref, rtol=1e-4, atol=1e-4
    )


def test_eqvae_scale_resize_matches_torch_interpolate():
    """EQ-VAE's latent rescale must match F.interpolate(bilinear,
    align_corners=False) — which does NOT antialias. All SCALE_BINS are
    downscales, exactly where jax's default antialias diverges (round-3
    review fix: antialias=False)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    g = np.random.default_rng(3)
    x = g.standard_normal((2, 8, 32, 32)).astype(np.float32)  # NCHW
    for scale in (0.375, 0.5, 0.75):
        new = int(round(32 * scale / 4) * 4)  # ps-snapped like _apply_scale
        ref = F.interpolate(
            torch.from_numpy(x), size=(new, new), mode="bilinear",
            align_corners=False,
        ).numpy()
        got = jax.image.resize(
            jnp.asarray(x.transpose(0, 2, 3, 1)), (2, new, new, 8),
            method="bilinear", antialias=False,
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_factorized_generator_dropout_engages_with_rng():
    """The factorized weight generator carries the reference's 0.1
    transformer dropout (ref dynamic_conv.py:210): active exactly when a
    'dropout' RNG is supplied (train steps), deterministic otherwise."""
    import jax
    import jax.numpy as jnp

    from eovax.nn.dynamic_conv import DynamicConv

    conv = DynamicConv(
        embed_dim=16, kernel_size=3, wv_planes=32, generator_type="factorized"
    )
    wvs = jnp.asarray([0.665, 0.56, 0.49], jnp.float32)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    variables = conv.init(jax.random.PRNGKey(0), x, wvs)

    def weights(rngs=None):
        return conv.apply(
            variables, wvs,
            method=lambda c, w: c.get_distillation_weight(w),
            **({"rngs": rngs} if rngs else {}),
        )[0]

    w_det1, w_det2 = weights(), weights()
    np.testing.assert_array_equal(np.asarray(w_det1), np.asarray(w_det2))
    w_a = weights({"dropout": jax.random.PRNGKey(1)})
    w_b = weights({"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(w_a), np.asarray(w_b))
    assert not np.allclose(np.asarray(w_a), np.asarray(w_det1))
