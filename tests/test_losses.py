"""Loss-function tests: MS-SSIM blur correctness, FFL torch parity,
consistency-loss terms."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest
import torch


def _load_ref_ffl():
    spec = importlib.util.spec_from_file_location(
        "ref_ffl", "/root/reference/eo_vae/models/modules/ffl.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_blur_matrix_matches_naive_conv():
    from eovax.losses.msssim import _blur_matrix, _depthwise_blur, _gaussian_1d

    g = np.asarray(_gaussian_1d(5, 1.5))
    x = np.random.default_rng(0).standard_normal((2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(_depthwise_blur(jnp.asarray(x), 5, 1.5))

    # Naive VALID separable blur.
    ref = np.zeros((2, 12, 16, 3), np.float32)
    for a in range(5):
        ref += g[a] * x[:, a : a + 12]
    ref2 = np.zeros((2, 12, 12, 3), np.float32)
    for a in range(5):
        ref2 += g[a] * ref[:, :, a : a + 12]
    np.testing.assert_allclose(out, ref2, rtol=1e-5, atol=1e-6)


def test_msssim_basic_properties():
    from eovax.losses.msssim import multiscale_ssim

    g = np.random.default_rng(1)
    a = jnp.asarray(g.standard_normal((2, 128, 128, 3), dtype=np.float32))
    same = float(multiscale_ssim(a, a))
    assert same == pytest.approx(1.0, abs=1e-5)
    noisy = float(multiscale_ssim(a, a + 0.5))
    assert noisy < same


@pytest.mark.parametrize("patch_factor,log_matrix,batch_matrix", [
    (1, False, True), (2, True, True),
])
def test_ffl_torch_parity(patch_factor, log_matrix, batch_matrix):
    """Focal frequency loss vs the reference's vendored torch implementation
    (ffl.py:17-102). Only batch_matrix=True is comparable: the reference's
    per-patch normalization path crashes upstream (ffl.py:76 indexes a 2-D
    tensor with 5 indices) — every shipped config uses batch_matrix=True
    (consistency_loss.py:392). Our per-patch path implements the canonical
    per-(patch, channel) max instead."""
    from eovax.losses.ffl import focal_frequency_loss

    ref_mod = _load_ref_ffl()
    ref = ref_mod.FocalFrequencyLoss(
        loss_weight=1.0, alpha=1.0, patch_factor=patch_factor,
        ave_spectrum=False, log_matrix=log_matrix, batch_matrix=batch_matrix,
    )
    g = np.random.default_rng(2)
    pred = g.standard_normal((2, 3, 16, 16)).astype(np.float32)
    target = g.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        expected = float(ref(torch.from_numpy(pred), torch.from_numpy(target)))
    got = float(
        focal_frequency_loss(
            jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(target, (0, 2, 3, 1))),
            patch_factor=patch_factor, log_matrix=log_matrix,
            batch_matrix=batch_matrix,
        )
    )
    assert got == pytest.approx(expected, rel=1e-4)


def test_charbonnier_sam_gdl_torch_parity():
    """Scalar loss terms vs direct torch formulas (consistency_loss.py)."""
    from eovax.losses.consistency import (
        berhu_loss,
        charbonnier_loss,
        gradient_difference_loss,
        sam_loss,
        spatial_gradient_loss,
    )

    g = np.random.default_rng(3)
    a = g.standard_normal((2, 3, 16, 16)).astype(np.float32)
    b = g.standard_normal((2, 3, 16, 16)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ja = jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    jb = jnp.asarray(np.transpose(b, (0, 2, 3, 1)))

    # Charbonnier
    exp = float(torch.mean(torch.sqrt((ta - tb) ** 2 + 1e-3**2)))
    assert float(charbonnier_loss(ja, jb)) == pytest.approx(exp, rel=1e-5)

    # SAM (1 - cosine over channels)
    dot = torch.sum(ta * tb, dim=1)
    cos = dot / (torch.norm(ta, dim=1) * torch.norm(tb, dim=1) + 1e-8)
    exp = float((1 - cos).mean())
    assert float(sam_loss(ja, jb)) == pytest.approx(exp, rel=1e-4)

    # Gradient difference
    pdy = (ta[:, :, 1:] - ta[:, :, :-1]).abs()
    tdy = (tb[:, :, 1:] - tb[:, :, :-1]).abs()
    pdx = (ta[:, :, :, 1:] - ta[:, :, :, :-1]).abs()
    tdx = (tb[:, :, :, 1:] - tb[:, :, :, :-1]).abs()
    exp = float((pdx - tdx).abs().mean() + (pdy - tdy).abs().mean())
    assert float(gradient_difference_loss(ja, jb)) == pytest.approx(exp, rel=1e-4)

    # BerHu
    diff = (ta - tb).abs()
    mask = diff <= 0.2
    l2 = (diff[~mask] ** 2 + 0.04) / 0.4
    exp = float((diff[mask].sum() + l2.sum()) / diff.numel())
    assert float(berhu_loss(ja, jb)) == pytest.approx(exp, rel=1e-4)

    # Sobel spatial gradient loss runs and is symmetric-zero on identical.
    assert float(spatial_gradient_loss(ja, ja)) == 0.0
    assert float(spatial_gradient_loss(ja, jb)) > 0
