"""DOFA feature extractor + perceptual/discriminator head tests."""

import jax
import jax.numpy as jnp
import numpy as np

from eovax.models.dofa import (
    DOFADiscriminator,
    DOFALPIPS,
    OFAViT,
    get_2d_sincos_pos_embed,
)


def _tiny_vit():
    return OFAViT(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        wv_planes=64, out_indices=(0, 1),
    )


def test_pos_embed_shape():
    emb = get_2d_sincos_pos_embed(64, 4, cls_token=True)
    assert emb.shape == (1, 17, 64)
    assert np.allclose(emb[0, 0], 0.0)  # cls slot zeros


def test_ofavit_features_multichannel():
    vit = _tiny_vit()
    for c in (3, 12):
        x = jnp.zeros((2, 32, 32, c))
        wvs = jnp.linspace(0.4, 2.5, c)
        variables = vit.init(jax.random.PRNGKey(0), x, wvs)
        feats = vit.apply(variables, x, wvs)
        assert len(feats) == 2
        # 32px, patch16, pad1 → floor((32+2-16)/16)+1 = 2 → 4 patches + cls
        assert feats[0].shape == (2, 5, 64)


def test_dofa_lpips_and_discriminator():
    vit = _tiny_vit()
    lpips = DOFALPIPS(dofa=vit, num_layers=2)
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((2, 32, 32, 3), dtype=np.float32))
    wvs = jnp.asarray([0.665, 0.56, 0.49])
    variables = lpips.init(jax.random.PRNGKey(0), x, x, wvs)
    d_same = lpips.apply(variables, x, x, wvs)
    d_diff = lpips.apply(variables, x, x + 1.0, wvs)
    assert float(d_same) < 1e-6
    assert float(d_diff) > float(d_same)

    disc = DOFADiscriminator(dofa=vit, hidden_dim=32, num_layers=2)
    dv = disc.init(jax.random.PRNGKey(1), x, wvs)
    logits = disc.apply(dv, x, wvs)
    assert logits.shape[0] == 2 and logits.ndim == 2


def test_consistency_feature_term_with_dofa():
    """EOConsistencyLoss feature term wired to frozen DOFA features."""
    from eovax.losses import EOConsistencyLoss

    vit = _tiny_vit()
    x = jnp.zeros((1, 32, 32, 3))
    wvs = jnp.asarray([0.665, 0.56, 0.49])
    variables = vit.init(jax.random.PRNGKey(0), x, wvs)

    def dofa_features(images, wv):
        return vit.apply(variables, images, wv)

    loss = EOConsistencyLoss(
        pixel_weight=1.0, feature_weight=0.5, dofa_features=dofa_features
    )
    g = np.random.default_rng(1)
    a = jnp.asarray(g.standard_normal((1, 32, 32, 3), dtype=np.float32))
    total, logs = loss(a, wvs, a * 0.9, global_step=10)
    assert np.isfinite(float(total))
    assert "train/loss_feature" in logs
