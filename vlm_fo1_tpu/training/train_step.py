"""Multimodal LM training step (capability extension over the reference,
which is inference-only — SURVEY.md §2.4). Full pipeline differentiation:
ViT + DaViT + HFRE + projectors + trunk -> causal LM cross-entropy -> adamw.

Used by __graft_entry__.dryrun_multichip to validate the DP+TP sharded
program, and as the seed of a fine-tuning capability.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from vlm_fo1_tpu.config import FO1Config
from vlm_fo1_tpu.models import llm
from vlm_fo1_tpu.models.davit import davit_forward
from vlm_fo1_tpu.models.hfre import hfre_forward
from vlm_fo1_tpu.models.projector import projector_forward
from vlm_fo1_tpu.models.vit import captures_to_feature_map, vit_forward

IGNORE = -100


def multimodal_lm_loss(params, cfg: FO1Config, batch, *, num_windows, grid,
                       remat: bool = False):
    """Cross-entropy of next-token prediction over a spliced multimodal
    sequence. batch (per device-batch row b):
      patches [B, P, pd], rot_cos/rot_sin [P, hd], valid [P],
      inv_unit_idx [U], inv_token_idx [S], aux_image [B, Ha, Wa, 3],
      aux_boxes/vt_boxes [B, N, 4], input_ids [B, S], image_positions [B, U],
      region_positions [B, N], position_ids [3, B, S], labels [B, S]
    """
    tokens, captures = vit_forward(
        params["vision_tower"], cfg.vision, batch["patches"],
        batch["rot_cos"], batch["rot_sin"], batch["valid"],
        num_windows=num_windows, inv_unit_idx=batch["inv_unit_idx"],
        remat=remat)
    vis = projector_forward(params["mm_projector"], cfg.mm_projector_type,
                            tokens)  # [B, U, D]
    vt_map = captures_to_feature_map(captures, batch["inv_token_idx"], grid,
                                     cfg.vision.spatial_merge_size)
    stage_maps = davit_forward(params["vision_tower_aux"], cfg.davit,
                               batch["aux_image"])

    def regions_one(aux_maps, aux_b, vt_m, vt_b):
        feats = hfre_forward(params.get("hfre", {}), cfg.hfre, aux_maps,
                             aux_b, vt_m, vt_b)
        return projector_forward(params["mm_projector_aux"],
                                 cfg.mm_projector_aux_type,
                                 feats.astype(vis.dtype))

    reg = jax.vmap(regions_one)(list(stage_maps), batch["aux_boxes"], vt_map,
                                batch["vt_boxes"])  # [B, N, D]

    def splice_one(ids, v, ip, r, rp):
        emb = llm.embed_tokens(params["text"], jnp.maximum(ids, 0))
        emb = emb.at[ip].set(v.astype(emb.dtype))
        emb = emb.at[rp].set(r.astype(emb.dtype))
        return emb

    embeds = jax.vmap(splice_one)(batch["input_ids"], vis,
                                  batch["image_positions"], reg,
                                  batch["region_positions"])

    cos, sin = llm.mrope_cos_sin(batch["position_ids"], cfg.text)
    s = embeds.shape[1]
    mask = (jnp.arange(s)[None, None, :] <= jnp.arange(s)[None, :, None])[:, None]
    hidden, _ = llm.text_forward(params["text"], cfg.text, embeds, cos, sin,
                                 mask, remat=remat)
    logits = llm.lm_head_logits(params["text"], cfg.text, hidden)

    labels = batch["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE
    safe = jnp.maximum(shift_labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        shift_logits.astype(jnp.float32), safe)
    loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
    return loss


def make_train_step(cfg: FO1Config, optimizer, *, num_windows, grid,
                    remat: bool = False):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    loss). jit/pjit-ready: shard params/batch before calling. remat=True
    checkpoints the trunk layers (O(1) activation memory in depth)."""

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(multimodal_lm_loss)(
            params, cfg, batch, num_windows=num_windows, grid=grid,
            remat=remat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
