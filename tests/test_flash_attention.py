"""Pallas flash attention vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_fo1_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_reference,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("causal", [False, True])
def test_matches_reference(rng, causal):
    b, h, sq, sk, d = 1, 2, 72, 72, 16
    q = _rand(rng, b, h, sq, d)
    k = _rand(rng, b, h, sk, d)
    v = _rand(rng, b, h, sk, d)
    ref = flash_attention_reference(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, block_q=16, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kv_len_masking(rng):
    b, h, sq, sk, d = 1, 1, 24, 64, 8
    q = _rand(rng, b, h, sq, d)
    k = _rand(rng, b, h, sk, d)
    v = _rand(rng, b, h, sk, d)
    kv_len = 37
    ref = flash_attention_reference(q, k, v, kv_len=kv_len)
    out = flash_attention(q, k, v, kv_len=kv_len, block_q=16, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # keys beyond kv_len must not matter
    k2 = k.at[:, :, kv_len:].set(999.0)
    v2 = v.at[:, :, kv_len:].set(-999.0)
    out2 = flash_attention(q, k2, v2, kv_len=kv_len, block_q=16, block_k=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)


def test_gqa_grouping(rng):
    b, h, hkv, s, d = 1, 4, 2, 40, 8
    q = _rand(rng, b, h, s, d)
    k = _rand(rng, b, hkv, s, d)
    v = _rand(rng, b, hkv, s, d)
    ref = flash_attention_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=16, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_unaligned_lengths(rng):
    """Sq/Sk not multiples of the block sizes."""
    b, h, sq, sk, d = 2, 2, 37, 53, 16
    q = _rand(rng, b, h, sq, d)
    k = _rand(rng, b, h, sk, d)
    v = _rand(rng, b, h, sk, d)
    ref = flash_attention_reference(q, k, v, kv_len=sk)
    out = flash_attention(q, k, v, kv_len=sk, block_q=16, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
