"""End-to-end checkpoint loading: fabricate a released-layout checkpoint
directory (sharded safetensors with the reference's key prefixes,
model/builder.py:90-132) for the tiny config, then load_fo1_checkpoint ->
FO1Model -> generate."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_fo1_tpu.checkpoint import load_fo1_checkpoint
from vlm_fo1_tpu.config import FO1Config
from vlm_fo1_tpu.models.davit import init_davit_params
from vlm_fo1_tpu.models.fo1 import FO1Model

sys.path.insert(0, os.path.dirname(__file__))
from conftest import StubTokenizer  # noqa: E402


def _vit_sd(cfg):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    hf = Qwen2_5_VLVisionConfig(
        depth=cfg.depth, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_heads=cfg.num_heads,
        out_hidden_size=cfg.out_hidden_size,
        fullatt_block_indexes=list(cfg.fullatt_block_indexes),
        window_size=cfg.window_size)
    hf._attn_implementation = "eager"
    torch.manual_seed(0)
    m = Qwen2_5_VisionTransformerPretrainedModel(hf).eval()
    return {k: v.numpy() for k, v in m.state_dict().items()}


def _text_sd(cfg):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    hf = Qwen2_5_VLConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": list(cfg.mrope_section)},
        vision_config=dict(depth=1, hidden_size=16, intermediate_size=32,
                           num_heads=2, out_hidden_size=cfg.hidden_size))
    hf._attn_implementation = "eager"
    torch.manual_seed(7)
    m = Qwen2_5_VLForConditionalGeneration(hf).eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    out = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            out["model." + k[len("model.language_model."):]] = v
        elif k.startswith("lm_head"):
            out[k] = v
    return out


def _davit_sd(cfg, key):
    """Invert init_davit_params into the reference DaViT torch naming
    (checkpoint.convert_davit's expectations)."""
    params = init_davit_params(key, cfg)
    sd = {}

    def conv(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"])
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def prenorm(prefix, p, attn_name, attn_key):
        conv(f"{prefix}.conv1.fn.dw", p["conv1"]["dw"])
        conv(f"{prefix}.conv2.fn.dw", p["conv2"]["dw"])
        ln(f"{prefix}.ffn.norm", p["ffn"]["norm"])
        lin(f"{prefix}.ffn.fn.net.fc1", p["ffn"]["fc1"])
        lin(f"{prefix}.ffn.fn.net.fc2", p["ffn"]["fc2"])
        ln(f"{prefix}.{attn_key}.norm", p[attn_name]["norm"])
        lin(f"{prefix}.{attn_key}.fn.qkv", p[attn_name]["qkv"])
        lin(f"{prefix}.{attn_key}.fn.proj", p[attn_name]["proj"])

    for i, stage in enumerate(params["stages"]):
        conv(f"convs.{i}.proj", stage["conv"]["proj"])
        if "norm" in stage["conv"]:
            ln(f"convs.{i}.norm", stage["conv"]["norm"])
        for j, blk in enumerate(stage["blocks"]):
            prenorm(f"blocks.{i}.{j}.spatial_block", blk["spatial"],
                    "attn", "window_attn")
            prenorm(f"blocks.{i}.{j}.channel_block", blk["channel"],
                    "attn", "channel_attn")
    return sd, params


def _proj_sd(key, in_dim, out_dim):
    k1, k2 = jax.random.split(key)
    w0 = np.asarray(jax.random.normal(k1, (out_dim, in_dim))) * 0.02
    w2 = np.asarray(jax.random.normal(k2, (out_dim, out_dim))) * 0.02
    return {"0.weight": w0.astype(np.float32),
            "0.bias": np.zeros(out_dim, np.float32),
            "2.weight": w2.astype(np.float32),
            "2.bias": np.zeros(out_dim, np.float32)}


def test_fabricated_checkpoint_loads_and_generates(tmp_path, rng):
    from safetensors.numpy import save_file

    cfg = FO1Config.tiny()
    flat = {}
    for k, v in _vit_sd(cfg.vision).items():
        flat[f"model.vision_tower.image_tower.{k}"] = v
    flat.update(_text_sd(cfg.text))
    davit_sd, davit_params = _davit_sd(cfg.davit, jax.random.PRNGKey(3))
    for k, v in davit_sd.items():
        flat[f"model.vision_tower_aux.image_tower.{k}"] = v
    for k, v in _proj_sd(jax.random.PRNGKey(4), cfg.mm_hidden_size,
                         cfg.text.hidden_size).items():
        flat[f"model.mm_projector.{k}"] = v
    for k, v in _proj_sd(jax.random.PRNGKey(5), cfg.mm_region_hidden_size,
                         cfg.text.hidden_size).items():
        flat[f"model.mm_projector_aux.{k}"] = v

    # two shards, like the released checkpoint
    keys = sorted(flat)
    half = len(keys) // 2
    save_file({k: np.ascontiguousarray(flat[k]) for k in keys[:half]},
              str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file({k: np.ascontiguousarray(flat[k]) for k in keys[half:]},
              str(tmp_path / "model-00002-of-00002.safetensors"))

    params = load_fo1_checkpoint(str(tmp_path), cfg, dtype=jnp.float32)

    # davit round-trip is exact (fabricated by inverting our init)
    for got, want in zip(jax.tree.leaves(params["vision_tower_aux"]),
                         jax.tree.leaves(davit_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    model = FO1Model(cfg, params, tokenizer=StubTokenizer())
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (80, 96, 3), dtype=np.uint8))
    msgs = [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": img}},
        {"type": "text", "text": "detect things"}],
        "bbox_list": [[2.0, 2.0, 50.0, 60.0], [10.0, 5.0, 70.0, 40.0]]}]
    r = model.generate(msgs, max_new_tokens=4, max_pixels=128 * 128)
    assert r.num_steps >= 1
    assert np.isfinite(np.asarray(r.token_ids)).all()
