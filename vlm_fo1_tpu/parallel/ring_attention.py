"""Ring (context-parallel) attention over a mesh axis.

Sequence-parallel growth path (SURVEY.md §2.4: the reference has no
distributed attention; its long-context handling is architectural). Each
device holds a sequence chunk of Q/K/V; K/V blocks rotate around the ring
via jax.lax.ppermute while a flash-style online softmax accumulates — peak
memory per device stays O(S_local^2) and the collectives ride the mesh
axis (ICI). Designed for use inside jax.shard_map with the sequence axis
sharded over the mesh's "model" (or a dedicated "sp") axis.

GQA layout matches models/llm._attention: q [B, Sl, Hq, hd],
k/v [B, Sl, Hkv, hd] with Hq a multiple of Hkv. Causal + ragged masking is
position-based: q_pos / kv_pos carry GLOBAL sequence positions so chunk
boundaries need no special cases; kv_valid masks padding rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_attention(q, k, v, q_pos, kv_pos, kv_valid, axis_name: str):
    """Returns [B, Sl, Hq, hd] attention outputs (same dtype as q).

    q_pos: [B, Sl] global positions of local queries
    kv_pos: [B, Sl] global positions of local keys
    kv_valid: [B, Sl] bool, False for padding keys
    """
    n = jax.lax.psum(1, axis_name)
    b, sl, hq, hd = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    qg = q.reshape(b, sl, hkv, groups, hd)

    neg = jnp.float32(-1e30)
    m0 = jnp.full((b, hkv, groups, sl), neg, jnp.float32)
    l0 = jnp.zeros((b, hkv, groups, sl), jnp.float32)
    a0 = jnp.zeros((b, hkv, groups, sl, hd), jnp.float32)
    # fresh accumulators are unvarying over the mesh axis but become varying
    # once mixed with sharded data; align the loop-carry types up front
    if hasattr(jax.lax, "pcast"):
        m0, l0, a0 = (jax.lax.pcast(t, axis_name, to="varying")
                      for t in (m0, l0, a0))
    else:  # older jax
        m0, l0, a0 = (jax.lax.pvary(t, (axis_name,)) for t in (m0, l0, a0))
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(_, carry):
        kb, vb, pb, vm, m, l, acc = carry
        logits = jnp.einsum("bsngh,bcnh->bngsc", qg, kb,
                            preferred_element_type=jnp.float32) * scale
        mask = ((pb[:, None, None, None, :] <= q_pos[:, None, None, :, None])
                & vm[:, None, None, None, :])
        logits = jnp.where(mask, logits, neg)
        m_new = jnp.maximum(m, logits.max(-1))
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(-1)
        acc = (acc * corr[..., None]
               + jnp.einsum("bngsc,bcnh->bngsh", p,
                            vb.astype(jnp.float32)))
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        pb = jax.lax.ppermute(pb, axis_name, perm)
        vm = jax.lax.ppermute(vm, axis_name, perm)
        return kb, vb, pb, vm, m_new, l, acc

    carry = (k, v, kv_pos, kv_valid, m0, l0, a0)
    *_, l, acc = jax.lax.fori_loop(0, n, body, carry)
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, sl, hq, hd).astype(q.dtype)
