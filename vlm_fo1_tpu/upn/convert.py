"""UPN checkpoint conversion: reference torch .pth -> JAX pytree.

The released UPN checkpoint is a torch state dict under `checkpoint["model"]`
(reference inference_wrapper.py:24-26). Key structure follows the reference
module tree (backbone.model.0.* for the Swin inside the Joiner,
transformer.encoder/decoder.*, input_proj.*, bbox_embed.*).
"""

from __future__ import annotations

import numpy as np

from vlm_fo1_tpu.checkpoint import _lin, _ln, _t, to_device_tree
from vlm_fo1_tpu.upn.model import UPNConfig
from vlm_fo1_tpu.upn.swin import SwinConfig


def convert_swin(sd: dict, cfg: SwinConfig) -> dict:
    stages = []
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}"
            blocks.append({
                "norm1": _ln(sd, f"{b}.norm1"),
                "norm2": _ln(sd, f"{b}.norm2"),
                "attn": {
                    "qkv": _lin(sd, f"{b}.attn.qkv"),
                    "proj": _lin(sd, f"{b}.attn.proj"),
                    "rel_bias": np.asarray(
                        sd[f"{b}.attn.relative_position_bias_table"]),
                },
                "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                        "fc2": _lin(sd, f"{b}.mlp.fc2")},
            })
        stage = {"blocks": blocks}
        if f"layers.{i}.downsample.norm.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, f"layers.{i}.downsample.norm"),
                "reduction": {"w": _t(sd[f"layers.{i}.downsample.reduction.weight"])},
            }
        stages.append(stage)
    return {
        "patch_embed": {
            "proj": {"w": np.asarray(sd["patch_embed.proj.weight"]),
                     "b": np.asarray(sd["patch_embed.proj.bias"])},
            "norm": _ln(sd, "patch_embed.norm"),
        },
        "stages": stages,
        "out_norms": {str(i): _ln(sd, f"norm{i}") for i in cfg.out_indices},
    }


def _mlp_layers(sd, prefix, n):
    return {"layers": [_lin(sd, f"{prefix}.layers.{j}") for j in range(n)]}


def _msda(sd, prefix, cfg):
    # the offsets projection's output lanes are stored level-major in this
    # build (reference is head-major) — permute checkpoint columns/bias
    # (ops/msda.offsets_lane_perm)
    from vlm_fo1_tpu.ops.msda import offsets_lane_perm

    perm = offsets_lane_perm(cfg.n_heads, cfg.num_feature_levels,
                             cfg.n_points)
    so = _lin(sd, f"{prefix}.sampling_offsets")
    so = {"w": so["w"][:, perm], "b": so["b"][perm]}
    return {
        "sampling_offsets": so,
        "attention_weights": _lin(sd, f"{prefix}.attention_weights"),
        "value_proj": _lin(sd, f"{prefix}.value_proj"),
        "output_proj": _lin(sd, f"{prefix}.output_proj"),
    }


def convert_upn(sd: dict, cfg: UPNConfig, swin_cfg: SwinConfig) -> dict:
    """sd: flat state dict of the whole UPN model (numpy arrays).

    The Swin lives under `backbone.model.backbone.` in the reference module
    tree (SwinWrapper.model = Joiner whose named attr is `backbone`,
    wrapper.py:64-75,207 — verified by instantiating the reference UPN in
    test_upn_oracle.py); older DETR-style `backbone.0.body.` and indexed
    `backbone.model.0.` layouts are accepted as fallbacks."""
    swin_sd = {}
    for prefix in ("backbone.model.backbone.", "backbone.model.0.",
                   "backbone.0.body."):
        swin_sd = {k[len(prefix):]: v for k, v in sd.items()
                   if k.startswith(prefix)}
        if swin_sd:
            break

    input_proj = []
    for l in range(cfg.num_feature_levels):
        input_proj.append({
            "conv": {"w": np.asarray(sd[f"input_proj.{l}.0.weight"]),
                     "b": np.asarray(sd[f"input_proj.{l}.0.bias"])},
            "gn": _ln(sd, f"input_proj.{l}.1"),
        })

    enc = []
    for i in range(cfg.num_encoder_layers):
        p = f"transformer.encoder.layers.{i}"
        enc.append({
            "self_attn": _msda(sd, f"{p}.self_attn", cfg),
            "norm1": _ln(sd, f"{p}.norm1"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm2": _ln(sd, f"{p}.norm2"),
        })

    dec = []
    for i in range(cfg.num_decoder_layers):
        p = f"transformer.decoder.layers.{i}"
        dec.append({
            "cross_attn": _msda(sd, f"{p}.cross_attn", cfg),
            "norm1": _ln(sd, f"{p}.norm1"),
            "self_attn": {
                "in_proj": {"w": _t(sd[f"{p}.self_attn.in_proj_weight"]),
                            "b": np.asarray(sd[f"{p}.self_attn.in_proj_bias"])},
                "out_proj": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "norm2": _ln(sd, f"{p}.norm2"),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm3": _ln(sd, f"{p}.norm3"),
        })

    return {
        "backbone": convert_swin(swin_sd, swin_cfg),
        "input_proj": input_proj,
        "level_embed": np.asarray(sd["transformer.level_embed"]),
        "encoder": enc,
        "decoder": {
            "layers": dec,
            "norm": _ln(sd, "transformer.decoder.norm"),
            "ref_point_head": _mlp_layers(
                sd, "transformer.decoder.ref_point_head", 2),
        },
        "tgt_embed": np.asarray(sd["transformer.tgt_embed.weight"]),
        "enc_output": _lin(sd, "transformer.enc_output"),
        "enc_output_norm": _ln(sd, "transformer.enc_output_norm"),
        # decoder bbox heads are shared (dec_pred_bbox_embed_share=True)
        "bbox_embed": _mlp_layers(sd, "bbox_embed.0", 3),
        "enc_out_bbox_embed": _mlp_layers(
            sd, "transformer.enc_out_bbox_embed", 3),
        "fine_grained_prompt": np.asarray(
            sd["transformer.fine_grained_prompt.weight"]),
        "coarse_grained_prompt": np.asarray(
            sd["transformer.coarse_grained_prompt.weight"]),
    }


def load_upn_checkpoint(ckpt_path: str, cfg: UPNConfig, swin_cfg: SwinConfig,
                        dtype) -> dict:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    sd = {k.replace("module.", ""): v.numpy() for k, v in state.items()}
    return to_device_tree(convert_upn(sd, cfg, swin_cfg), dtype)
