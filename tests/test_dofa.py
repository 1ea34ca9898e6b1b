"""DOFA feature extractor + perceptual/discriminator head tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_dofav2_shapes_and_taps():
    from eovax.models.dofa import DOFAViTv2

    vit = DOFAViTv2(img_size=28, patch_size=14, embed_dim=32, depth=3,
                    num_heads=4, wv_planes=32, out_indices=(0, 2))
    x = jnp.zeros((2, 28, 28, 5))
    wvs = jnp.linspace(0.4, 2.5, 5)
    variables = vit.init(jax.random.PRNGKey(0), x, wvs)
    feats = vit.apply(variables, x, wvs)
    assert len(feats) == 2
    # 2×2 patches + cls prefix token (upstream keeps the prefix).
    assert feats[0].shape == (2, 5, 32)
    # LayerScale params present at timm paths (ls1/ls2 gamma).
    assert "gamma" in variables["params"]["blocks_0"]["ls1"]
    # Dynamic image size: pos embed resampled for a larger grid.
    x56 = jnp.zeros((2, 56, 56, 5))
    feats56 = vit.apply(variables, x56, wvs)
    assert feats56[0].shape == (2, 17, 32)


def test_dofav2_patch14_to_16_conversion():
    from eovax.models.dofa import DOFAViTv2

    vit = DOFAViTv2(img_size=32, patch_size=14, embed_dim=32, depth=1,
                    num_heads=4, wv_planes=32, out_indices=(0,),
                    convert_patch_14_to_16=True)
    x = jnp.zeros((1, 32, 32, 3))
    wvs = jnp.linspace(0.4, 2.5, 3)
    variables = vit.init(jax.random.PRNGKey(0), x, wvs)
    feats = vit.apply(variables, x, wvs)
    assert feats[0].shape == (1, 5, 32)  # 32/16=2 → 4 patches + cls


def test_dofav3_features_and_lpips_taps():
    from eovax.models.dofa import DOFAViTv3

    vit = DOFAViTv3(img_size=32, patch_size=16, embed_dim=32, depth=4,
                    num_heads=4, wv_planes=32, out_indices=(0, 1),
                    num_reg_tokens=4)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32)
    )
    wvs = jnp.asarray([0.665, 0.56, 0.49])
    variables = vit.init(jax.random.PRNGKey(0), x, wvs)
    out = vit.apply(variables, x, wvs)
    # Second-to-last block output, prefix (1 cls + 4 reg) removed.
    assert out.shape == (2, 4, 32)
    taps = vit.apply(variables, x, wvs, method=DOFAViTv3.forward_lpips)
    assert len(taps) == 2 and all(t.shape == (2, 4, 32) for t in taps)
    assert "reg_token" in variables["params"]


def test_rope_rotation_preserves_norm_and_relativity():
    from eovax.models.dofa import _apply_rope, _rope_2d

    cos, sin = _rope_2d(4, 4, 16)
    assert cos.shape == (16, 16)
    g = np.random.default_rng(0)
    q = jnp.asarray(g.standard_normal((1, 2, 16 + 2, 16), dtype=np.float32))
    q_rot = _apply_rope(q, (cos, sin), num_prefix=2)
    # Prefix untouched; rotation is norm-preserving.
    np.testing.assert_array_equal(np.asarray(q_rot[:, :, :2]), np.asarray(q[:, :, :2]))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot[:, :, 2:]), axis=-1),
        np.linalg.norm(np.asarray(q[:, :, 2:]), axis=-1),
        rtol=1e-5,
    )


def test_dofav2_converter_maps_timm_keys():
    """A timm-style torch state dict (model.blocks.N.*, model.cls_token,
    ls1/ls2 gammas) converts onto the flax tree with zero unexpected
    block keys (VERDICT #7 done-criterion, minus the real weights)."""
    from eovax.models.dofa import DOFAViTv2
    from eovax.utils.torch_convert import convert_state_dict

    vit = DOFAViTv2(img_size=28, patch_size=14, embed_dim=32, depth=2,
                    num_heads=4, wv_planes=32, out_indices=(1,))
    x = jnp.zeros((1, 28, 28, 3))
    wvs = jnp.linspace(0.4, 2.5, 3)
    template = vit.init(jax.random.PRNGKey(0), x, wvs)

    g = np.random.default_rng(3)
    d, mlp = 32, 128
    sd = {}
    sd["model.cls_token"] = g.standard_normal((1, 1, d)).astype(np.float32)
    sd["model.pos_embed"] = g.standard_normal((1, 5, d)).astype(np.float32)
    for i in range(2):
        p = f"model.blocks.{i}."
        sd[p + "norm1.weight"] = g.standard_normal(d).astype(np.float32)
        sd[p + "norm1.bias"] = g.standard_normal(d).astype(np.float32)
        sd[p + "attn.qkv.weight"] = g.standard_normal((3 * d, d)).astype(np.float32)
        sd[p + "attn.qkv.bias"] = g.standard_normal(3 * d).astype(np.float32)
        sd[p + "attn.proj.weight"] = g.standard_normal((d, d)).astype(np.float32)
        sd[p + "attn.proj.bias"] = g.standard_normal(d).astype(np.float32)
        sd[p + "ls1.gamma"] = g.standard_normal(d).astype(np.float32)
        sd[p + "ls2.gamma"] = g.standard_normal(d).astype(np.float32)
        sd[p + "norm2.weight"] = g.standard_normal(d).astype(np.float32)
        sd[p + "norm2.bias"] = g.standard_normal(d).astype(np.float32)
        sd[p + "mlp.fc1.weight"] = g.standard_normal((mlp, d)).astype(np.float32)
        sd[p + "mlp.fc1.bias"] = g.standard_normal(mlp).astype(np.float32)
        sd[p + "mlp.fc2.weight"] = g.standard_normal((d, mlp)).astype(np.float32)
        sd[p + "mlp.fc2.bias"] = g.standard_normal(d).astype(np.float32)

    stripped = {k[len("model."):]: v for k, v in sd.items()}
    updates, report = convert_state_dict(stripped, template)
    assert not report.unexpected, report.unexpected
    assert len(report.converted) == len(sd)
    # Spot-check layout: qkv Linear [O,I] → kernel [I,O].
    np.testing.assert_allclose(
        updates["params"]["blocks_0"]["attn_qkv"]["kernel"],
        sd["model.blocks.0.attn.qkv.weight"].T,
    )
    np.testing.assert_allclose(
        updates["params"]["blocks_1"]["ls1"]["gamma"],
        sd["model.blocks.1.ls1.gamma"],
    )


def test_builder_out_indices_match_reference():
    """Tap defaults pinned to the reference builders
    (/root/reference/eo_vae/models/dofa.py:597,613,627,641); v3's last tap
    must stay < depth-1 (forward_lpips iterates blocks[:-1])."""
    from eovax.models.dofa import (
        DOFAViTv2,
        DOFAViTv3,
        OFAViT,
        dofa_vit_base_patch16,
        dofa_vit_large_patch16,
    )

    assert dofa_vit_base_patch16().out_indices == (4, 6, 10, 11)
    assert dofa_vit_large_patch16().out_indices == (5, 11, 17, 22)
    assert OFAViT().out_indices == (5, 11, 17, 22)
    assert DOFAViTv2().out_indices == (4, 6, 10, 11)
    v3 = DOFAViTv3()
    assert v3.out_indices == (5, 11, 17, 22)
    assert max(v3.out_indices) < v3.depth - 1  # reachable through blocks[:-1]


def test_dofav3_converter_maps_dinov3_keys():
    """A DINOv3-style torch state dict (model.reg_token, model.cls_token,
    blocks.N.{qkv, ls1/ls2, norms, mlp}) converts onto the v3 flax tree
    with zero unexpected keys (VERDICT r3 item #6 — the v3 analogue of the
    v2 converter test)."""
    from eovax.models.dofa import DOFAViTv3
    from eovax.utils.torch_convert import convert_state_dict

    vit = DOFAViTv3(img_size=32, patch_size=16, embed_dim=32, depth=3,
                    num_heads=4, wv_planes=32, out_indices=(1,),
                    num_reg_tokens=2)
    x = jnp.zeros((1, 32, 32, 3))
    wvs = jnp.linspace(0.4, 2.5, 3)
    template = vit.init(jax.random.PRNGKey(0), x, wvs)

    g = np.random.default_rng(7)
    d, mlp = 32, 128
    sd = {}
    sd["model.cls_token"] = g.standard_normal((1, 1, d)).astype(np.float32)
    sd["model.reg_token"] = g.standard_normal((1, 2, d)).astype(np.float32)
    for i in range(3):
        p = f"model.blocks.{i}."
        sd[p + "norm1.weight"] = g.standard_normal(d).astype(np.float32)
        sd[p + "norm1.bias"] = g.standard_normal(d).astype(np.float32)
        sd[p + "attn.qkv.weight"] = g.standard_normal((3 * d, d)).astype(np.float32)
        sd[p + "attn.qkv.bias"] = g.standard_normal(3 * d).astype(np.float32)
        sd[p + "attn.proj.weight"] = g.standard_normal((d, d)).astype(np.float32)
        sd[p + "attn.proj.bias"] = g.standard_normal(d).astype(np.float32)
        sd[p + "ls1.gamma"] = g.standard_normal(d).astype(np.float32)
        sd[p + "ls2.gamma"] = g.standard_normal(d).astype(np.float32)
        sd[p + "norm2.weight"] = g.standard_normal(d).astype(np.float32)
        sd[p + "norm2.bias"] = g.standard_normal(d).astype(np.float32)
        sd[p + "mlp.fc1.weight"] = g.standard_normal((mlp, d)).astype(np.float32)
        sd[p + "mlp.fc1.bias"] = g.standard_normal(mlp).astype(np.float32)
        sd[p + "mlp.fc2.weight"] = g.standard_normal((d, mlp)).astype(np.float32)
        sd[p + "mlp.fc2.bias"] = g.standard_normal(d).astype(np.float32)

    stripped = {k[len("model."):]: v for k, v in sd.items()}
    updates, report = convert_state_dict(stripped, template)
    # The FINAL block is unreachable (both forward paths iterate
    # blocks[:-1], ref dofa.py:548/586), so flax never materializes its
    # params: its 14 keys are reported unexpected and dropped. Everything
    # else must convert.
    assert all(k.startswith("blocks.2.") for k in report.unexpected), (
        report.unexpected
    )
    assert len(report.unexpected) == 14
    assert len(report.converted) == len(sd) - 14
    # Register tokens land on the flax param; qkv Linear [O,I] → [I,O].
    np.testing.assert_allclose(
        updates["params"]["reg_token"], sd["model.reg_token"]
    )
    np.testing.assert_allclose(
        updates["params"]["blocks_1"]["attn_qkv"]["kernel"],
        sd["model.blocks.1.attn.qkv.weight"].T,
    )
    np.testing.assert_allclose(
        updates["params"]["blocks_1"]["ls2"]["gamma"],
        sd["model.blocks.1.ls2.gamma"],
    )


def test_dofav3_rope_coords_flag():
    """The RoPE coordinate convention is a constructor knob: both
    conventions run, produce different features with the SAME params
    (so checkpoint matching is config-only), and an unknown name raises."""
    from eovax.models.dofa import DOFAViTv3, _rope_2d

    # 4×4 patch grid: RoPE is relative, so the conventions only separate
    # when their coordinate SPACINGS differ (box: 2/grid, grid: 1); a 2×2
    # grid makes them coincide up to a global offset that cancels in q·k.
    kw = dict(img_size=64, patch_size=16, embed_dim=32, depth=2,
              num_heads=4, wv_planes=32, out_indices=(0,))
    box = DOFAViTv3(rope_coords="box", **kw)
    grid = DOFAViTv3(rope_coords="grid", **kw)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 3), dtype=np.float32))
    wvs = jnp.linspace(0.4, 2.5, 3)
    variables = box.init(jax.random.PRNGKey(0), x, wvs)
    f_box = box.apply(variables, x, wvs)
    f_grid = grid.apply(variables, x, wvs)  # same params, different phases
    assert f_box.shape == f_grid.shape == (1, 16, 32)
    assert not np.allclose(np.asarray(f_box), np.asarray(f_grid))

    with pytest.raises(ValueError, match="box.*grid|grid.*box"):
        _rope_2d(2, 2, 8, coords="diagonal")
