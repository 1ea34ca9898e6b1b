"""Embedding modules vs the reference semantics
(/root/reference/eo_vae/models/modules/embeddings.py — the reference file
itself is unimportable (broken `.uvit_torch_utils` import at line 13), so
the torch golden below inlines its exact formula, cited per line)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eovax.nn.embeddings import (
    LearnedPositionalEmbedding,
    RelativePositionBias,
    TimestepEmbedding,
    Timesteps,
    get_timestep_embedding,
    _relative_position_index,
)


def _torch_timestep_embedding(timesteps, dim, flip_sin_to_cos, shift, scale, max_period=10000):
    """Inlined from embeddings.py:20-72 (diffusers formula)."""
    import math

    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2 == 1:
        emb = torch.nn.functional.pad(emb, (0, 1, 0, 0))
    return emb


@pytest.mark.parametrize("dim,flip,shift,scale", [
    (128, False, 1.0, 1.0),
    (64, True, 0.0, 2.0),
    (33, False, 1.0, 1.0),  # odd dim -> zero pad
])
def test_timestep_embedding_torch_parity(dim, flip, shift, scale):
    t = np.array([0.0, 1.0, 17.5, 999.0], dtype=np.float32)
    ours = get_timestep_embedding(
        jnp.asarray(t), dim, flip_sin_to_cos=flip, downscale_freq_shift=shift, scale=scale
    )
    ref = _torch_timestep_embedding(torch.from_numpy(t), dim, flip, shift, scale)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5, rtol=1e-5)
    # Timesteps module wrapper
    mod = Timesteps(dim, flip_sin_to_cos=flip, downscale_freq_shift=shift, scale=scale)
    out2 = mod.apply({}, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ours))


def test_timestep_embedding_mlp():
    mod = TimestepEmbedding(time_embed_dim=32, cond_proj_dim=8, post_act_fn="silu")
    sample = jnp.ones((2, 16))
    cond = jnp.ones((2, 8))
    variables = mod.init(jax.random.PRNGKey(0), sample, cond)
    out = mod.apply(variables, sample, cond)
    assert out.shape == (2, 32)
    # cond_proj is bias-free (embeddings.py:117)
    assert "bias" not in variables["params"]["cond_proj"]
    # out_dim override
    mod2 = TimestepEmbedding(time_embed_dim=32, out_dim=12)
    v2 = mod2.init(jax.random.PRNGKey(0), sample)
    assert mod2.apply(v2, sample).shape == (2, 12)


def test_relative_position_index_matches_torch_reference():
    """Index math vs the torch meshgrid formula (embeddings.py:181-201)."""
    h, w = 3, 4
    coords = torch.stack(torch.meshgrid(
        [torch.arange(h), torch.arange(w)], indexing="ij"))
    flat = coords.view(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    ref = rel.sum(-1).numpy()
    np.testing.assert_array_equal(_relative_position_index(h, w), ref)


def test_relative_position_bias_shapes_and_extrapolation():
    mod = RelativePositionBias(window_size=4, num_heads=2)
    variables = mod.init(jax.random.PRNGKey(0), (1, 4, 4))
    assert variables["params"]["relative_bias_table"].shape == (7, 7, 2)

    out = mod.apply(variables, (3, 4, 4))
    assert out.shape == (3 * 2, 16, 16)
    assert np.allclose(np.asarray(out), 0)  # zero-init table

    # larger grid: padded regions carry the -1e7 sentinel
    big = mod.apply(variables, (1, 6, 6))
    assert big.shape == (2, 36, 36)
    assert float(jnp.min(big)) == -(10.0**7)
    # in-window relative offsets still read the (zero) table
    assert float(big[0, 0, 0]) == 0.0


def test_learned_positional_embedding():
    mod = LearnedPositionalEmbedding(embeds_shape=(8, 16))
    x = jnp.zeros((2, 8, 16))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(variables["params"]["embeds"]), atol=1e-6)

    # [C,H,W] table against flattened [B, H*W, C] states (embeddings.py:303-309)
    mod3 = LearnedPositionalEmbedding(embeds_shape=(6, 2, 4))
    x3 = jnp.zeros((1, 8, 6))
    v3 = mod3.init(jax.random.PRNGKey(1), x3)
    out3 = mod3.apply(v3, x3)
    table = np.asarray(v3["params"]["embeds"])  # [6,2,4]
    np.testing.assert_allclose(
        np.asarray(out3[0]), table.reshape(6, 8).T, atol=1e-6)

    with pytest.raises(ValueError):
        mod.apply(variables, jnp.zeros((2, 8, 17)))
