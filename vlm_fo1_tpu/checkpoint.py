"""Checkpoint I/O: HF safetensors / torch state-dict -> JAX pytrees.

The released VLM-FO1 checkpoint stores everything in sharded safetensors with
prefixes `model.vision_tower.`, `model.vision_tower_aux.`, `model.layers.*`,
`model.mm_projector*`, `model.object_vp_extractor.*`, `lm_head.`
(reference model/builder.py:90-132 scans shards and prefix-strips tower
weights). Here each converter takes a flat {name: np.ndarray} dict (already
prefix-stripped) and emits the corresponding param pytree. Linear kernels are
transposed to [in, out]; fused qkv layouts are preserved.

Key-map verification status (r4): the inner tower key families come from
REAL module trees, not fabrications — convert_vision_tower consumes the
installed HF Qwen2.5-VL ViT's state_dict (test_vit.py), convert_davit the
reference torch DaViT's (test_davit_oracle.py), upn/convert the reference
UPN package's (test_upn_oracle.py). The outer `model.vision_tower(.aux)
.image_tower.` wrapper prefixes match the reference wrappers' attribute
names (qwen2_5_vl_encoder.py:206, davit_aux_encoder.py:44) and the strip
set at model/builder.py:110-132; the sharded-checkpoint scan itself is
covered by test_from_pretrained.py's fabricated two-shard layout.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from vlm_fo1_tpu.config import DaViTConfig, FO1Config, TextConfig, ViTConfig


def _t(w) -> np.ndarray:
    """HF linear weight [out, in] -> [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd, name, bias=True):
    p = {"w": _t(sd[f"{name}.weight"])}
    if bias and f"{name}.bias" in sd:
        p["b"] = np.asarray(sd[f"{name}.bias"])
    return p


def _rms(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"])}


def _ln(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _conv(sd, name, bias=True):
    p = {"w": np.asarray(sd[f"{name}.weight"])}
    if bias and f"{name}.bias" in sd:
        p["b"] = np.asarray(sd[f"{name}.bias"])
    return p


def convert_vision_tower(sd: dict, cfg: ViTConfig) -> dict:
    """Keys relative to the ViT root (e.g. `blocks.0.attn.qkv.weight`)."""
    from vlm_fo1_tpu.models.vit import vit_group_structure

    pe = np.asarray(sd["patch_embed.proj.weight"])  # [D, C, T, ph, pw]
    pe = pe.reshape(pe.shape[0], -1).T              # [patch_dim, D]
    blocks = []
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        blocks.append({
            "norm1": _rms(sd, f"{b}.norm1"),
            "norm2": _rms(sd, f"{b}.norm2"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "mlp": {"gate_proj": _lin(sd, f"{b}.mlp.gate_proj"),
                    "up_proj": _lin(sd, f"{b}.mlp.up_proj"),
                    "down_proj": _lin(sd, f"{b}.mlp.down_proj")},
        })

    # stack into the scanned (window*, full) group layout (models/vit.py)
    g, wpg = vit_group_structure(cfg)
    period = wpg + 1
    win_groups, full_blocks = [], []
    for gi in range(g):
        grp = blocks[gi * period:(gi + 1) * period]
        if wpg > 0:
            win_groups.append(jax.tree.map(lambda *xs: np.stack(xs), *grp[:-1]))
        full_blocks.append(grp[-1])
    stacked = {"full": jax.tree.map(lambda *xs: np.stack(xs), *full_blocks)}
    if wpg > 0:
        stacked["window"] = jax.tree.map(lambda *xs: np.stack(xs), *win_groups)

    return {
        "patch_embed": {"proj": {"w": np.ascontiguousarray(pe)}},
        "blocks": stacked,
        "merger": {
            "ln_q": _rms(sd, "merger.ln_q"),
            "fc1": _lin(sd, "merger.mlp.0"),
            "fc2": _lin(sd, "merger.mlp.2"),
        },
    }


def convert_text_model(sd: dict, cfg: TextConfig) -> dict:
    """Keys relative to the LLM trunk (`model.` prefix stripped), plus
    `lm_head.weight` if untied."""
    layers = []
    for i in range(cfg.num_hidden_layers):
        l = f"layers.{i}"
        layers.append({
            "input_layernorm": _rms(sd, f"{l}.input_layernorm"),
            "post_attention_layernorm": _rms(sd, f"{l}.post_attention_layernorm"),
            "attn": {
                "q_proj": _lin(sd, f"{l}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{l}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{l}.self_attn.v_proj"),
                "o_proj": _lin(sd, f"{l}.self_attn.o_proj", bias=False),
            },
            "mlp": {"gate_proj": _lin(sd, f"{l}.mlp.gate_proj", bias=False),
                    "up_proj": _lin(sd, f"{l}.mlp.up_proj", bias=False),
                    "down_proj": _lin(sd, f"{l}.mlp.down_proj", bias=False)},
        })
    # stack per-layer trees for the scanned trunk (models/llm.py)
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params = {
        "embed_tokens": {"w": np.asarray(sd["embed_tokens.weight"])},
        "layers": stacked,
        "norm": _rms(sd, "norm"),
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = {"w": _t(sd["lm_head.weight"])}
    return params


def convert_davit(sd: dict, cfg: DaViTConfig) -> dict:
    """Keys relative to the DaViT root (`image_tower.` stripped)."""

    def prenorm_block(prefix, attn_name, attn_keys):
        p = {
            "conv1": {"dw": _conv(sd, f"{prefix}.conv1.fn.dw")},
            "conv2": {"dw": _conv(sd, f"{prefix}.conv2.fn.dw")},
            "ffn": {
                "norm": _ln(sd, f"{prefix}.ffn.norm"),
                "fc1": _lin(sd, f"{prefix}.ffn.fn.net.fc1"),
                "fc2": _lin(sd, f"{prefix}.ffn.fn.net.fc2"),
            },
            attn_name: {
                "norm": _ln(sd, f"{prefix}.{attn_keys}.norm"),
                "qkv": _lin(sd, f"{prefix}.{attn_keys}.fn.qkv"),
                "proj": _lin(sd, f"{prefix}.{attn_keys}.fn.proj"),
            },
        }
        return p

    stages = []
    for i in range(cfg.num_stages):
        conv = {"proj": _conv(sd, f"convs.{i}.proj")}
        if f"convs.{i}.norm.weight" in sd:
            conv["norm"] = _ln(sd, f"convs.{i}.norm")
        blocks = []
        for j in range(cfg.depths[i]):
            b = f"blocks.{i}.{j}"
            blocks.append({
                "spatial": prenorm_block(f"{b}.spatial_block", "attn",
                                         "window_attn"),
                "channel": prenorm_block(f"{b}.channel_block", "attn",
                                         "channel_attn"),
            })
        stages.append({"conv": conv, "blocks": blocks})
    return {"stages": stages}


def load_safetensors_dir(model_path: str) -> dict:
    """Read all *.safetensors shards in a checkpoint dir into one flat dict
    of numpy arrays (reference model/builder.py:90-101)."""
    from safetensors import safe_open

    state = {}
    files = sorted(f for f in os.listdir(model_path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors shards in {model_path}")
    for fname in files:
        with safe_open(os.path.join(model_path, fname), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return state


def strip_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def to_device_tree(tree, dtype=jnp.bfloat16):
    """Move a numpy pytree to device, casting floating arrays to `dtype`."""
    import jax

    def conv(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating):
            return jnp.asarray(x, dtype=dtype)
        return jnp.asarray(x)

    return jax.tree.map(conv, tree)


def load_fo1_checkpoint(model_path: str, cfg: FO1Config, dtype=jnp.bfloat16) -> dict:
    """Assemble the full FO1 param tree from a released checkpoint directory.

    Key layout (verified against the reference loader model/builder.py):
      model.vision_tower.image_tower.*   -> ViT
      model.vision_tower_aux.image_tower.* -> DaViT
      model.mm_projector.* / model.mm_projector_aux.* -> projectors
      model.object_vp_extractor.*        -> HFRE (LayerNorms, optional MLPs)
      model.embed_tokens / model.layers.* / model.norm / lm_head -> LLM
    """
    from vlm_fo1_tpu.models.projector import convert_projector_params

    sd = load_safetensors_dir(model_path)
    params = {
        "vision_tower": convert_vision_tower(
            strip_prefix(sd, "model.vision_tower.image_tower."), cfg.vision),
        "vision_tower_aux": convert_davit(
            strip_prefix(sd, "model.vision_tower_aux.image_tower."), cfg.davit),
        "text": convert_text_model(
            {**strip_prefix(sd, "model."), **{k: v for k, v in sd.items()
                                              if k.startswith("lm_head")}},
            cfg.text),
        "mm_projector": convert_projector_params(
            strip_prefix(sd, "model.mm_projector."), cfg.mm_projector_type),
        "mm_projector_aux": convert_projector_params(
            strip_prefix(sd, "model.mm_projector_aux."), cfg.mm_projector_aux_type),
    }
    hfre_sd = strip_prefix(sd, "model.object_vp_extractor.")
    hfre = {}
    if "vt_region_norm.weight" in hfre_sd:
        hfre["vt_region_norm"] = _ln(hfre_sd, "vt_region_norm")
    if "aux_region_norm.weight" in hfre_sd:
        hfre["aux_region_norm"] = _ln(hfre_sd, "aux_region_norm")
    params["hfre"] = hfre
    return to_device_tree(params, dtype)
