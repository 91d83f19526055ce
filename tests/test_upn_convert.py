"""UPN checkpoint converter round-trip: a fabricated torch .pth with the
reference's key families (backbone.model.backbone.* as the real module
tree nests it — verified in test_upn_oracle.py — plus transformer.encoder/
decoder.*, input_proj.*, bbox_embed.*, prompt embeddings — the state dict
the reference loads via checkpoint["model"], inference_wrapper.py:24-26)
must load through UPNWrapper into the exact same pytree, and a renamed key
must fail loudly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.ops.msda import offsets_lane_perm
from vlm_fo1_tpu.upn.model import UPNConfig, init_upn_params
from vlm_fo1_tpu.upn.swin import SwinConfig
from vlm_fo1_tpu.upn.wrapper import UPNWrapper

torch = pytest.importorskip("torch")

TINY_SWIN = SwinConfig(embed_dim=16, depths=(1, 1, 2, 1),
                       num_heads=(1, 2, 4, 8), window_size=4)
TINY_UPN = UPNConfig(d_model=32, n_heads=4, n_points=2,
                     num_encoder_layers=2, num_decoder_layers=2,
                     d_ffn=64, num_queries=20, gn_groups=8, pos_feats=16)


def _inv_lin(sd, name, p):
    """JAX linear {w [in,out], b} -> reference torch Linear keys."""
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    if "b" in p:
        sd[f"{name}.bias"] = np.asarray(p["b"])


def _inv_ln(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _inv_msda(sd, prefix, p, cfg):
    # convert.py permutes checkpoint offset lanes head-major -> level-major;
    # invert that here so the fabricated .pth is reference-(head-major-)shaped
    perm = offsets_lane_perm(cfg.n_heads, cfg.num_feature_levels, cfg.n_points)
    inv = np.argsort(np.asarray(perm))
    so_w = np.asarray(p["sampling_offsets"]["w"])[:, inv]
    so_b = np.asarray(p["sampling_offsets"]["b"])[inv]
    sd[f"{prefix}.sampling_offsets.weight"] = np.ascontiguousarray(so_w.T)
    sd[f"{prefix}.sampling_offsets.bias"] = so_b
    for k in ("attention_weights", "value_proj", "output_proj"):
        _inv_lin(sd, f"{prefix}.{k}", p[k])


def params_to_reference_sd(params, cfg: UPNConfig, swin_cfg: SwinConfig):
    """Inverse of upn/convert.py: JAX pytree -> reference-keyed state dict."""
    sd = {}

    # ---- Swin under the Joiner prefix (backbone.model.backbone.*)
    bp = "backbone.model.backbone"
    swin = params["backbone"]
    sd[f"{bp}.patch_embed.proj.weight"] = np.asarray(
        swin["patch_embed"]["proj"]["w"])
    sd[f"{bp}.patch_embed.proj.bias"] = np.asarray(
        swin["patch_embed"]["proj"]["b"])
    _inv_ln(sd, f"{bp}.patch_embed.norm", swin["patch_embed"]["norm"])
    for i, stage in enumerate(swin["stages"]):
        for j, blk in enumerate(stage["blocks"]):
            b = f"{bp}.layers.{i}.blocks.{j}"
            _inv_ln(sd, f"{b}.norm1", blk["norm1"])
            _inv_ln(sd, f"{b}.norm2", blk["norm2"])
            _inv_lin(sd, f"{b}.attn.qkv", blk["attn"]["qkv"])
            _inv_lin(sd, f"{b}.attn.proj", blk["attn"]["proj"])
            sd[f"{b}.attn.relative_position_bias_table"] = np.asarray(
                blk["attn"]["rel_bias"])
            _inv_lin(sd, f"{b}.mlp.fc1", blk["mlp"]["fc1"])
            _inv_lin(sd, f"{b}.mlp.fc2", blk["mlp"]["fc2"])
        if "downsample" in stage:
            _inv_ln(sd, f"{bp}.layers.{i}.downsample.norm",
                    stage["downsample"]["norm"])
            sd[f"{bp}.layers.{i}.downsample.reduction.weight"] = \
                np.ascontiguousarray(
                    np.asarray(stage["downsample"]["reduction"]["w"]).T)
    for i in swin_cfg.out_indices:
        _inv_ln(sd, f"{bp}.norm{i}", swin["out_norms"][str(i)])

    # ---- input projections (conv + GN)
    for l, proj in enumerate(params["input_proj"]):
        sd[f"input_proj.{l}.0.weight"] = np.asarray(proj["conv"]["w"])
        sd[f"input_proj.{l}.0.bias"] = np.asarray(proj["conv"]["b"])
        _inv_ln(sd, f"input_proj.{l}.1", proj["gn"])

    # ---- transformer
    sd["transformer.level_embed"] = np.asarray(params["level_embed"])
    for i, enc in enumerate(params["encoder"]):
        p = f"transformer.encoder.layers.{i}"
        _inv_msda(sd, f"{p}.self_attn", enc["self_attn"], cfg)
        _inv_ln(sd, f"{p}.norm1", enc["norm1"])
        _inv_lin(sd, f"{p}.linear1", enc["linear1"])
        _inv_lin(sd, f"{p}.linear2", enc["linear2"])
        _inv_ln(sd, f"{p}.norm2", enc["norm2"])
    for i, dec in enumerate(params["decoder"]["layers"]):
        p = f"transformer.decoder.layers.{i}"
        _inv_msda(sd, f"{p}.cross_attn", dec["cross_attn"], cfg)
        _inv_ln(sd, f"{p}.norm1", dec["norm1"])
        sd[f"{p}.self_attn.in_proj_weight"] = np.ascontiguousarray(
            np.asarray(dec["self_attn"]["in_proj"]["w"]).T)
        sd[f"{p}.self_attn.in_proj_bias"] = np.asarray(
            dec["self_attn"]["in_proj"]["b"])
        _inv_lin(sd, f"{p}.self_attn.out_proj", dec["self_attn"]["out_proj"])
        _inv_ln(sd, f"{p}.norm2", dec["norm2"])
        _inv_lin(sd, f"{p}.linear1", dec["linear1"])
        _inv_lin(sd, f"{p}.linear2", dec["linear2"])
        _inv_ln(sd, f"{p}.norm3", dec["norm3"])
    _inv_ln(sd, "transformer.decoder.norm", params["decoder"]["norm"])
    for j, lp in enumerate(params["decoder"]["ref_point_head"]["layers"]):
        _inv_lin(sd, f"transformer.decoder.ref_point_head.layers.{j}", lp)
    sd["transformer.tgt_embed.weight"] = np.asarray(params["tgt_embed"])
    _inv_lin(sd, "transformer.enc_output", params["enc_output"])
    _inv_ln(sd, "transformer.enc_output_norm", params["enc_output_norm"])
    for j, lp in enumerate(params["bbox_embed"]["layers"]):
        _inv_lin(sd, f"bbox_embed.0.layers.{j}", lp)
    for j, lp in enumerate(params["enc_out_bbox_embed"]["layers"]):
        _inv_lin(sd, f"transformer.enc_out_bbox_embed.layers.{j}", lp)
    sd["transformer.fine_grained_prompt.weight"] = np.asarray(
        params["fine_grained_prompt"])
    sd["transformer.coarse_grained_prompt.weight"] = np.asarray(
        params["coarse_grained_prompt"])
    return sd


def _fabricate_pth(tmp_path, params, name="upn.pth"):
    sd = params_to_reference_sd(params, TINY_UPN, TINY_SWIN)
    torch_sd = {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}
    path = tmp_path / name
    torch.save({"model": torch_sd}, str(path))
    return path, sd


def test_upn_pth_round_trip(tmp_path):
    params = init_upn_params(jax.random.PRNGKey(3), TINY_UPN, TINY_SWIN,
                             jnp.float32)
    path, _ = _fabricate_pth(tmp_path, params)

    upn = UPNWrapper(str(path), cfg=TINY_UPN, swin_cfg=TINY_SWIN,
                     dtype=jnp.float32)

    flat0, tree0 = jax.tree.flatten_with_path(params)
    flat1, tree1 = jax.tree.flatten_with_path(upn.params)
    assert tree0 == tree1, "loaded pytree structure differs from init"
    for (p0, a0), (p1, a1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_array_equal(
            np.asarray(a0), np.asarray(a1),
            err_msg=f"leaf {jax.tree_util.keystr(p0)} did not round-trip")


def test_upn_pth_forward_equivalence(tmp_path, rng):
    """Loading through the .pth must reproduce the directly-injected forward
    bit-for-bit (fp32; conversion is key mapping + transposes only)."""
    from vlm_fo1_tpu.upn.wrapper import _jit_forward

    params = init_upn_params(jax.random.PRNGKey(3), TINY_UPN, TINY_SWIN,
                             jnp.float32)
    path, _ = _fabricate_pth(tmp_path, params)
    upn = UPNWrapper(str(path), cfg=TINY_UPN, swin_cfg=TINY_SWIN,
                     dtype=jnp.float32)

    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    padded = UPNWrapper._pad_to_bucket(upn, img)[None]
    hw = jnp.asarray([[64, 96]], np.int32)
    out_direct = _jit_forward(params, TINY_UPN, TINY_SWIN,
                              jnp.asarray(padded), hw, "fine_grained_prompt")
    out_loaded = _jit_forward(upn.params, TINY_UPN, TINY_SWIN,
                              jnp.asarray(padded), hw, "fine_grained_prompt")
    np.testing.assert_array_equal(np.asarray(out_direct["pred_boxes"]),
                                  np.asarray(out_loaded["pred_boxes"]))
    np.testing.assert_array_equal(np.asarray(out_direct["pred_logits"]),
                                  np.asarray(out_loaded["pred_logits"]))


def test_upn_pth_module_prefix_and_missing_key(tmp_path):
    params = init_upn_params(jax.random.PRNGKey(4), TINY_UPN, TINY_SWIN,
                             jnp.float32)
    sd = params_to_reference_sd(params, TINY_UPN, TINY_SWIN)

    # DDP-style "module." prefix is stripped on load (convert.py:151)
    torch_sd = {f"module.{k}": torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}
    path = tmp_path / "upn_ddp.pth"
    torch.save({"model": torch_sd}, str(path))
    upn = UPNWrapper(str(path), cfg=TINY_UPN, swin_cfg=TINY_SWIN,
                     dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(upn.params["level_embed"]),
                                  np.asarray(params["level_embed"]))

    # a renamed key family must fail loudly, not load silently
    bad = {k: torch.from_numpy(np.array(v, copy=True))
           for k, v in sd.items()}
    bad["transformer.level_embeds"] = bad.pop("transformer.level_embed")
    path2 = tmp_path / "upn_bad.pth"
    torch.save({"model": bad}, str(path2))
    with pytest.raises(KeyError):
        UPNWrapper(str(path2), cfg=TINY_UPN, swin_cfg=TINY_SWIN,
                   dtype=jnp.float32)
