"""Blocked flash attention (Pallas/TPU) for the ViT full-attention blocks and
LLM prefill.

Why: the reference leans on varlen FlashAttention-2 CUDA kernels
(modeling_qwen2_5_vl.py:205, flash_attn_varlen_func). XLA alone would
materialize [Sq, Sk] logits — 28GB for a 2048px image's 21k-token ViT
sequence — so the full-attention blocks and long prefills need an online-
softmax kernel. This implements the canonical TPU flash pattern: grid
(batch*heads, q_blocks, k_blocks) with VMEM accumulators carried across the
innermost (sequential) k dimension, fp32 softmax state, optional causal
masking and a key-validity length.

GQA is expressed through the index maps (query head h reads k/v head
h // group). Not a training kernel yet: backward runs through the reference
jnp path (see flash_attention_reference).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def flash_attention_reference(q, k, v, *, causal=False, kv_len=None,
                              kv_valid=None, scale=None):
    """jnp oracle with identical semantics: q [B,H,Sq,D], k/v [B,Hkv,Sk,D]."""
    b, h, sq, d = q.shape
    hkv = k.shape[1]
    groups = h // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    kx = jnp.repeat(k, groups, axis=1)
    vx = jnp.repeat(v, groups, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kx,
                        preferred_element_type=jnp.float32) * scale
    sk = k.shape[2]
    mask = jnp.ones((sq, sk), bool)
    if causal:
        mask &= jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None] + (sk - sq)
    if kv_len is not None:
        mask &= jnp.arange(sk)[None, :] < kv_len
    if kv_valid is not None:
        mask &= kv_valid[None, :]
    logits = jnp.where(mask[None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), vx)


def _kernel(kv_len_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, acc, m_s, l_s,
            *, scale, causal, block_q, block_k, sq, sk):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0].astype(jnp.float32)          # [BQ, D]
    k = k_ref[0].astype(jnp.float32)          # [BK, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    # masks: kv validity + causal (bottom-right aligned)
    kpos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                   (block_q, block_k), 1)
    mask = kpos < kv_len_ref[0]
    if valid_ref is not None:
        # arbitrary per-key validity (interspersed padding, e.g. the padded
        # window layout of the ViT)
        mask &= (valid_ref[:, 0] > 0)[None, :]
    if causal:
        qpos = (qi * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
        mask &= kpos <= qpos + (sk - sq)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_s[:]                            # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_s[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_s[:] = m_new
    l_s[:] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc[:] / jnp.maximum(l_s[:], 1e-30)).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,          # [B, H, Sq, D]
    k: jnp.ndarray,          # [B, Hkv, Sk, D]
    v: jnp.ndarray,          # [B, Hkv, Sk, D]
    *,
    causal: bool = False,
    kv_len: int | jnp.ndarray | None = None,  # keys >= kv_len are masked
    kv_valid: jnp.ndarray | None = None,      # [Sk] bool, arbitrary key mask
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Online-softmax attention. Sq/Sk padded internally to block multiples;
    pad queries produce garbage rows that callers slice away (their keys are
    masked by kv_len / kv_valid)."""
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    groups = h // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_len is None:
        kv_len = sk
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(1)

    block_q = min(block_q, max(sq, 16))
    block_k = min(block_k, max(sk, 128))
    sq_pad = -(-sq // block_q) * block_q
    sk_pad = -(-sk // block_k) * block_k
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))

    qr = q.reshape(b * h, sq_pad, d)
    kr = k.reshape(b * hkv, sk_pad, d)
    vr = v.reshape(b * hkv, sk_pad, d)

    grid = (b * h, sq_pad // block_q, sk_pad // block_k)
    kernel = functools.partial(
        _kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, sq=sq, sk=sk)

    in_specs = [
        # index maps receive the scalar-prefetch ref as last arg
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, kv: (bh, qi, 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda bh, qi, ki, kv, g=groups: (bh // g, ki, 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda bh, qi, ki, kv, g=groups: (bh // g, ki, 0)),
    ]
    inputs = [kv_len, qr, kr, vr]
    if kv_valid is not None:
        vmask = jnp.zeros((sk_pad, 1), jnp.int32).at[:sk, 0].set(
            kv_valid.astype(jnp.int32))
        in_specs.append(pl.BlockSpec((block_k, 1),
                                     lambda bh, qi, ki, kv: (ki, 0)))
        inputs.append(vmask)
        kern = kernel
    else:
        def kern(kv_ref, q_ref, k_ref, v_ref, o_ref, acc, m_s, l_s):
            return kernel(kv_ref, q_ref, k_ref, v_ref, None, o_ref,
                          acc, m_s, l_s)

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda bh, qi, ki, kv: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        interpret=interpret,
    )(*inputs)

    out = out.reshape(b, h, sq_pad, d)
    return out[:, :, :sq]
