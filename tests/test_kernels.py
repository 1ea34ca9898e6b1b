"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ref_attention(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqc,bkc->bqk", q, k) * scale
    return jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(logits, -1), v)


@pytest.mark.parametrize("s,d,bq,bk", [(256, 64, 128, 128), (512, 128, 128, 256)])
def test_flash_attention_matches_reference(s, d, bq, bk):
    from eovax.kernels.attention import flash_attention

    g = np.random.default_rng(0)
    q = jnp.asarray(g.standard_normal((2, s, d), dtype=np.float32))
    k = jnp.asarray(g.standard_normal((2, s, d), dtype=np.float32))
    v = jnp.asarray(g.standard_normal((2, s, d), dtype=np.float32))
    out = flash_attention(q, k, v, block_q=bq, block_k=bk, interpret=True)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sdpa_auto_small_path_matches():
    from eovax.kernels.attention import sdpa_auto

    g = np.random.default_rng(1)
    q = jnp.asarray(g.standard_normal((1, 64, 32), dtype=np.float32))
    out = sdpa_auto(q, q, q)
    ref = _ref_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
