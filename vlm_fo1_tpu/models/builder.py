"""Name-dispatch encoder builders (reference multimodal_encoder/builder.py:5-38).

The reference dispatches on the tower name embedded in the checkpoint config
("qwen2.5-vl..." -> Qwen ViT wrapper, "davit..." -> DaViT); here the same
names resolve to (init_fn, forward_fn, config) triples over the functional
modules. Composition normally goes through FO1Config / FO1Model — these
builders exist for API parity and for using a tower standalone.
"""

from __future__ import annotations

from vlm_fo1_tpu.config import DaViTConfig, ViTConfig


def build_vision_tower(vision_tower_name: str, cfg: ViTConfig | None = None):
    """'qwen2.5-vl*' -> (init_vit_params, vit_forward, ViTConfig)."""
    name = (vision_tower_name or "").lower()
    if "qwen2.5-vl" in name or "qwen2_5" in name:
        from vlm_fo1_tpu.models.vit import init_vit_params, vit_forward

        return init_vit_params, vit_forward, (cfg or ViTConfig())
    raise ValueError(f"unknown vision tower: {vision_tower_name}")


def build_vision_tower_aux(vision_tower_name: str,
                           cfg: DaViTConfig | None = None):
    """'davit*' -> (init_davit_params, davit_forward, DaViTConfig)."""
    name = (vision_tower_name or "").lower()
    if "davit" in name:
        from vlm_fo1_tpu.models.davit import davit_forward, init_davit_params

        return init_davit_params, davit_forward, (cfg or DaViTConfig())
    raise ValueError(f"unknown aux vision tower: {vision_tower_name}")
