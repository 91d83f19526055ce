"""CAbstractor / TokenPacker projector variants (reference
multimodal_projector/builder.py:44-61,117-217, honeybee.py:37-127)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.models.projector import (
    adaptive_avg_pool_nchw,
    cabstractor_forward,
    init_cabstractor_params,
    init_projector_params,
    init_tokenpacker_params,
    projector_forward,
    tokenpacker_forward,
)


def _naive_adaptive_pool(x, o):
    b, c, h, w = x.shape
    out = np.zeros((b, c, o, o), np.float32)
    for i in range(o):
        for j in range(o):
            y0, y1 = int(np.floor(i * h / o)), int(np.ceil((i + 1) * h / o))
            x0, x1 = int(np.floor(j * w / o)), int(np.ceil((j + 1) * w / o))
            out[:, :, i, j] = x[:, :, y0:y1, x0:x1].mean(axis=(2, 3))
    return out


@pytest.mark.parametrize("h,o", [(12, 12), (24, 12), (17, 5), (7, 7)])
def test_adaptive_avg_pool_matches_naive(rng, h, o):
    x = rng.standard_normal((2, 3, h, h)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool_nchw(jnp.asarray(x), o))
    want = _naive_adaptive_pool(x, o)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cabstractor_shapes_and_grad(rng):
    l, in_dim, out_dim, nq = 36, 8, 12, 9
    p = init_cabstractor_params(jax.random.PRNGKey(0), l, in_dim, out_dim,
                                hidden=16, depth=2, num_queries=nq)
    x = jnp.asarray(rng.standard_normal((2, l, in_dim)).astype(np.float32))
    y = cabstractor_forward(p, x, num_queries=nq)
    assert y.shape == (2, nq, out_dim)
    assert np.isfinite(np.asarray(y)).all()

    loss = lambda pp: cabstractor_forward(pp, x, num_queries=nq).sum()
    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_cabstractor_identity_pool_when_same_grid(rng):
    """num_queries == num_input_tokens -> the adaptive pool is a no-op, so
    the pipeline is s1 -> s2 -> readout with no resampling artifacts."""
    l, nq = 16, 16
    p = init_cabstractor_params(jax.random.PRNGKey(1), l, 6, 6, hidden=8,
                                depth=1, num_queries=nq)
    x = jnp.asarray(rng.standard_normal((1, l, 6)).astype(np.float32))
    y = cabstractor_forward(p, x, num_queries=nq)
    assert y.shape == (1, nq, 6)


def test_tokenpacker_shapes_and_grad(rng):
    raw_grid, mm, hid, e = 8, 10, 20, 16
    p = init_tokenpacker_params(jax.random.PRNGKey(0), mm, hid, embed_dim=e)
    x = jnp.asarray(rng.standard_normal((2, raw_grid ** 2, mm))
                    .astype(np.float32))
    xm = jnp.asarray(rng.standard_normal((2, raw_grid ** 2, mm * 4))
                     .astype(np.float32))
    y = tokenpacker_forward(p, x, xm, raw_grid=raw_grid, scale_factor=2,
                            num_heads=4)
    assert y.shape == (2, (raw_grid // 2) ** 2, hid)
    assert np.isfinite(np.asarray(y)).all()

    loss = lambda pp: tokenpacker_forward(pp, x, xm, raw_grid=raw_grid,
                                          scale_factor=2, num_heads=4).sum()
    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_tokenpacker_window_locality(rng):
    """Each output query may depend ONLY on its scale_factor^2 local window
    of the multi-level features (builder.py:175-210 grouping)."""
    raw_grid, mm, hid, e, sf = 4, 6, 8, 8, 2
    p = init_tokenpacker_params(jax.random.PRNGKey(2), mm, hid, embed_dim=e)
    x = jnp.asarray(rng.standard_normal((1, raw_grid ** 2, mm))
                    .astype(np.float32))
    xm = rng.standard_normal((1, raw_grid ** 2, mm * 4)).astype(np.float32)
    base = np.asarray(tokenpacker_forward(p, x, jnp.asarray(xm),
                                          raw_grid=raw_grid, scale_factor=sf,
                                          num_heads=2))
    # perturb the token at fine coords (0,0) -> only output query (0,0) moves
    xm2 = xm.copy()
    xm2[0, 0] += 10.0
    out2 = np.asarray(tokenpacker_forward(p, x, jnp.asarray(xm2),
                                          raw_grid=raw_grid, scale_factor=sf,
                                          num_heads=2))
    delta = np.abs(out2 - base).max(axis=-1)[0]   # [g*g]
    # layer-norm shrinks the absolute shift; what matters is that query (0,0)
    # moved and no other query did at all
    assert delta[0] > 1e-8                        # query (0,0) changed
    assert np.all(delta[1:] == 0.0), "leak outside the local window"


def test_builder_dispatch_new_types(rng):
    p = init_projector_params(jax.random.PRNGKey(0), "cabstract", 8, 12,
                              num_input_tokens=16, num_queries=4)
    x = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    y = projector_forward(p, "cabstract", x, num_queries=4)
    assert y.shape == (1, 4, 12)

    p = init_projector_params(jax.random.PRNGKey(1), "tokenpacker", 8, 12)
    x1 = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    xm = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
    y = projector_forward(p, "tokenpacker", (x1, xm), raw_grid=4)
    assert y.shape == (1, 4, 12)


def _tp_state_dict(rng, mm, hid, e):
    sd = {}
    sd["q_proj_1.weight"] = rng.standard_normal((e, mm)).astype(np.float32)
    for p, i in [("k_proj_1", mm * 4), ("v_proj_1", mm * 4)]:
        sd[f"{p}.0.weight"] = rng.standard_normal((e, i)).astype(np.float32)
        sd[f"{p}.0.bias"] = rng.standard_normal(e).astype(np.float32)
        sd[f"{p}.2.weight"] = rng.standard_normal((e, e)).astype(np.float32)
        sd[f"{p}.2.bias"] = rng.standard_normal(e).astype(np.float32)
    for p in ["ln_q_1", "ln_k_1", "ln_v_1"]:
        sd[f"{p}.weight"] = np.ones(e, np.float32)
        sd[f"{p}.bias"] = np.zeros(e, np.float32)
    sd["clip_attn.in_proj_weight"] = rng.standard_normal((3 * e, e)).astype(np.float32)
    sd["clip_attn.in_proj_bias"] = rng.standard_normal(3 * e).astype(np.float32)
    sd["clip_attn.out_proj.weight"] = rng.standard_normal((e, e)).astype(np.float32)
    sd["clip_attn.out_proj.bias"] = rng.standard_normal(e).astype(np.float32)
    sd["mlp.0.weight"] = rng.standard_normal((hid, e)).astype(np.float32)
    sd["mlp.0.bias"] = rng.standard_normal(hid).astype(np.float32)
    sd["mlp.2.weight"] = rng.standard_normal((hid, hid)).astype(np.float32)
    sd["mlp.2.bias"] = rng.standard_normal(hid).astype(np.float32)
    return sd


def test_tokenpacker_converter_roundtrip(rng):
    from vlm_fo1_tpu.models.projector import convert_projector_params

    mm, hid, e, raw_grid = 6, 10, 8, 4
    sd = _tp_state_dict(rng, mm, hid, e)
    p = convert_projector_params(sd, "tokenpacker")
    x = jnp.asarray(rng.standard_normal((1, raw_grid ** 2, mm)).astype(np.float32))
    xm = jnp.asarray(rng.standard_normal((1, raw_grid ** 2, mm * 4)).astype(np.float32))
    y = tokenpacker_forward(p, x, xm, raw_grid=raw_grid, num_heads=2)
    assert y.shape == (1, 4, hid)
    assert np.isfinite(np.asarray(y)).all()
    # packed in_proj slices land in the right q/k/v slots
    np.testing.assert_allclose(
        np.asarray(p["attn"]["in_k"]["w"]),
        sd["clip_attn.in_proj_weight"][e:2 * e].T)


def test_cabstractor_converter_roundtrip(rng):
    from vlm_fo1_tpu.models.projector import convert_projector_params

    in_dim, hidden, out_dim, nq, l = 6, 8, 10, 4, 16

    def conv_sd(prefix, i, o, k, sd, bias=False):
        sd[f"{prefix}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = rng.standard_normal(o).astype(np.float32)

    sd = {"pos_emb": rng.standard_normal((1, l, in_dim)).astype(np.float32)}
    for net, stage_in in [(0, in_dim), (2, hidden)]:
        for bi in [1, 2]:
            pre = f"net.{net}.b{bi}"
            ic = stage_in if bi == 1 else hidden
            rd = int(round(ic * 0.25))
            conv_sd(f"{pre}.conv1.conv", ic, hidden, 1, sd)
            conv_sd(f"{pre}.conv2.conv", 1, hidden, 3, sd)  # depthwise: I=1
            conv_sd(f"{pre}.se.fc1", hidden, rd, 1, sd, bias=True)
            conv_sd(f"{pre}.se.fc2", rd, hidden, 1, sd, bias=True)
            conv_sd(f"{pre}.conv3.conv", hidden, hidden, 1, sd)
            for n in ["conv1.bn", "conv2.bn", "conv3.bn"]:
                sd[f"{pre}.{n}.weight"] = np.ones(hidden, np.float32)
                sd[f"{pre}.{n}.bias"] = np.zeros(hidden, np.float32)
            if ic != hidden:
                conv_sd(f"{pre}.downsample.conv", ic, hidden, 1, sd)
                sd[f"{pre}.downsample.bn.weight"] = np.ones(hidden, np.float32)
                sd[f"{pre}.downsample.bn.bias"] = np.zeros(hidden, np.float32)
    sd["readout.0.weight"] = rng.standard_normal((out_dim, hidden)).astype(np.float32)
    sd["readout.0.bias"] = rng.standard_normal(out_dim).astype(np.float32)
    sd["readout.2.weight"] = rng.standard_normal((out_dim, out_dim)).astype(np.float32)
    sd["readout.2.bias"] = rng.standard_normal(out_dim).astype(np.float32)

    p = convert_projector_params(sd, "cabstract")
    assert len(p["s1"]) == 2 and len(p["s2"]) == 2
    x = jnp.asarray(rng.standard_normal((1, l, in_dim)).astype(np.float32))
    y = cabstractor_forward(p, x, num_queries=nq)
    assert y.shape == (1, nq, out_dim)
    assert np.isfinite(np.asarray(y)).all()
