"""Ring (context-parallel) attention vs dense causal GQA attention on the
8-virtual-device mesh."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vlm_fo1_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _dense_reference(q, k, v, q_pos, kv_pos, kv_valid):
    b, s, hq, hd = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    qg = q.reshape(b, s, hkv, groups, hd)
    logits = np.einsum("bsngh,bcnh->bngsc", qg, k).astype(np.float32)
    logits /= np.sqrt(hd)
    mask = ((kv_pos[:, None, None, None, :] <= q_pos[:, None, None, :, None])
            & kv_valid[:, None, None, None, :])
    logits = np.where(mask, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = np.where(mask, p, 0.0)
    p /= np.maximum(p.sum(-1, keepdims=True), 1e-30)
    out = np.einsum("bngsc,bcnh->bngsh", p, v)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, s, hq, hd)


@pytest.mark.parametrize("hq,hkv,ragged", [(4, 2, False), (8, 2, True)])
def test_ring_matches_dense(rng, hq, hkv, ragged):
    n_dev = 8
    b, s, hd = 2, 64, 8     # s divides n_dev
    q = rng.standard_normal((b, s, hq, hd)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, hd)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, hd)).astype(np.float32)
    pos = np.broadcast_to(np.arange(s)[None], (b, s)).copy()
    valid = np.ones((b, s), bool)
    if ragged:
        valid[0, 50:] = False
        valid[1, 33:] = False

    want = _dense_reference(q, k, v, pos, pos, valid)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("sp",))
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                  P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"))
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(pos), jnp.asarray(pos),
                        jnp.asarray(valid)))
    # rows whose query is padding are irrelevant; compare valid rows only
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-5, atol=2e-5)


def test_prefill_sequence_parallel_matches_dense(rng):
    """Full-trunk SP prefill (shard_map + ring attention over 8 devices)
    must reproduce the dense prefill: same KV cache, same next-token
    logits."""
    from jax.sharding import Mesh

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models import llm
    from vlm_fo1_tpu.runtime.generate import (
        prefill,
        prefill_sequence_parallel,
    )

    cfg = FO1Config.tiny().text
    params = llm.init_text_params(jax.random.PRNGKey(0), cfg)
    b, s, pad = 2, 27, 32
    ids = rng.integers(0, cfg.vocab_size, (b, pad))
    embeds = llm.embed_tokens(params, jnp.asarray(ids))
    pos = np.broadcast_to(np.arange(pad)[None, None], (3, b, pad)).copy()
    seq_lens = jnp.asarray([s, s - 5], np.int32)
    cache_len = pad + 8

    cache_ref, logits_ref = prefill(params, cfg, embeds, jnp.asarray(pos),
                                    seq_lens, cache_len=cache_len)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    cache_sp, logits_sp = prefill_sequence_parallel(
        params, cfg, embeds, jnp.asarray(pos), seq_lens,
        cache_len=cache_len, mesh=mesh)

    np.testing.assert_allclose(np.asarray(logits_sp),
                               np.asarray(logits_ref), rtol=2e-4, atol=2e-4)
    # caches agree on the prompt region (rows < seq_len per batch)
    k_ref = np.asarray(cache_ref["k"])
    k_sp = np.asarray(cache_sp["k"])
    for i, sl in enumerate([s, s - 5]):
        np.testing.assert_allclose(k_sp[:, i, :sl], k_ref[:, i, :sl],
                                   rtol=2e-4, atol=2e-4)


def test_prefill_sequence_parallel_int4_mlp_params(rng):
    """ADVICE r3: the ring trunk body must dispatch fused-int4 MLP nodes
    (text_forward_ring used to hardcode gate/up/down and KeyError'd on
    int4-mlp-quantized params). SP prefill with a quantized trunk must run
    and roughly track the dense quantized prefill."""
    from jax.sharding import Mesh

    from vlm_fo1_tpu.config import FO1Config
    from vlm_fo1_tpu.models import llm
    from vlm_fo1_tpu.quant import quantize_mlp_int4
    from vlm_fo1_tpu.runtime.generate import (
        prefill,
        prefill_sequence_parallel,
    )

    cfg = FO1Config.tiny().text
    params = llm.init_text_params(jax.random.PRNGKey(0), cfg)
    # (eligibility %128 only gates the TPU kernel; the CPU dispatch uses
    # the XLA reference, so the tiny intermediate=96 trunk is fine here)
    params["layers"]["mlp"] = quantize_mlp_int4(params["layers"]["mlp"])
    assert "fused_int4" in params["layers"]["mlp"]

    b, s, pad = 1, 19, 24
    ids = rng.integers(0, cfg.vocab_size, (b, pad))
    embeds = llm.embed_tokens(params, jnp.asarray(ids))
    pos = np.broadcast_to(np.arange(pad)[None, None], (3, b, pad)).copy()
    seq_lens = jnp.asarray([s], np.int32)

    cache_ref, logits_ref = prefill(params, cfg, embeds, jnp.asarray(pos),
                                    seq_lens, cache_len=pad + 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    cache_sp, logits_sp = prefill_sequence_parallel(
        params, cfg, embeds, jnp.asarray(pos), seq_lens,
        cache_len=pad + 8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(logits_sp),
                               np.asarray(logits_ref), rtol=2e-3, atol=2e-3)
