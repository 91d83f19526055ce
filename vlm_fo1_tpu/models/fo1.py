"""FO1 model composition: dual vision towers + HFRE + projectors + LLM.

The TPU counterpart of OmChatQwen25VLForCausalLM (reference
omchat_qwen2_5_vl.py) and OmChatMetaModel (omchat_arch.py:7-33). Device work
is split into three jitted programs, cached per static geometry:

  encode   (per image grid x box bucket): ViT padded-window forward with
           multi-level captures + DaViT + HFRE + both projectors
  prefill  (per prompt-length bucket): multimodal splice -> trunk -> KV cache
  decode   (one program): static-cache while_loop

Host code (numpy) does image preprocessing, window planning, token expansion
and M-RoPE indices — everything data-dependent and branchy.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vlm_fo1_tpu import preprocess as pp
from vlm_fo1_tpu.config import FO1Config
from vlm_fo1_tpu.models import llm
from vlm_fo1_tpu.models.davit import davit_forward, init_davit_params
from vlm_fo1_tpu.models.hfre import hfre_forward
from vlm_fo1_tpu.models.projector import init_projector_params, projector_forward
from vlm_fo1_tpu.models.vit import (
    captures_to_feature_map,
    init_vit_params,
    vit_forward,
)
from vlm_fo1_tpu.preprocess.tokens import (
    SpliceInfo,
    build_chat_tokens,
    expand_multimodal_tokens,
)
from vlm_fo1_tpu.preprocess.windowing import build_vit_plan, pad_pixel_values
from vlm_fo1_tpu.runtime.generate import (
    GenerationConfig,
    decode_chunk,
    decode_loop,
    decode_to_text,
    pad_to_bucket,
    prefill,
    prefill_into_slots,
    sample_first,
)

BOX_BUCKET = 10  # boxes padded to a multiple of this (cap 100)


def _round_boxes(n: int) -> int:
    return max(BOX_BUCKET, -(-n // BOX_BUCKET) * BOX_BUCKET)


def _model_float_dtype(tree):
    """Compute dtype of a (possibly int8-quantized) param tree: prefer a
    half-precision float leaf if any exists (quantization scales stay fp32
    even in a bf16 model), else fp32."""
    dts = {jnp.dtype(leaf.dtype) for leaf in jax.tree.leaves(tree)}
    for cand in (jnp.bfloat16, jnp.float16):
        if jnp.dtype(cand) in dts:
            return cand
    return jnp.float32


def _normalize_on_device(patches, aux_image, cfg: FO1Config, dtype):
    """uint8 inputs carry raw pixels (half the host->device bytes of bf16):
    apply the /255-mean-std affine here in fp32 — XLA fuses it into the
    first matmul — then cast. Float inputs pass through (already normalized
    on host). Dtypes are static under jit, so this is a trace-time branch."""
    from vlm_fo1_tpu.preprocess.image import (
        AUX_IMAGE_MEAN,
        AUX_IMAGE_STD,
        qwen_patch_norm_vectors,
    )

    if patches is not None and patches.dtype == jnp.uint8:
        mean, std = qwen_patch_norm_vectors(
            cfg.vision.patch_size, cfg.vision.temporal_patch_size)
        x = patches.astype(jnp.float32) / 255.0
        patches = ((x - mean) / std).astype(dtype)
    if aux_image is not None and aux_image.dtype == jnp.uint8:
        x = aux_image.astype(jnp.float32) / 255.0
        aux_image = ((x - AUX_IMAGE_MEAN) / AUX_IMAGE_STD).astype(dtype)
    return patches, aux_image


def _device_preproc_batched(raw, cfg: FO1Config, gather_idx, dt):
    """Raw smart-resized uint8 images [B, H, W, C] -> (ViT patches in the
    padded window layout, DaViT aux input), entirely on device.

    The ViT half is EXACT vs the host pipeline (patchify/temporal-duplicate/
    window-pad are pure relayouts that commute with the elementwise
    normalize; same fp32 affine, same cast). The aux half approximates the
    reference's PIL-bicubic 768^2 squash of the shortest-edge-resized image
    (mm_utils.py aux branch) with a device bicubic resize of the
    smart-resized image — one extra resampling generation; the win is
    shipping ONE raw image (~0.6MB) instead of uint8 patch rows + a
    768^2 aux image (~3.3MB) over the ~20MB/s tunneled host->device link."""
    from vlm_fo1_tpu.preprocess.image import (
        AUX_IMAGE_MEAN,
        AUX_IMAGE_STD,
        qwen_patch_norm_vectors,
    )

    ph = cfg.vision.patch_size
    m = cfg.vision.spatial_merge_size
    tps = cfg.vision.temporal_patch_size
    b, hb, wb, c = raw.shape
    gh, gw = hb // ph, wb // ph

    # patchify: [B,H,W,C] -> rows ordered (h_block, w_block, merge_h,
    # merge_w), row layout [c, t, ph, pw] (image.py qwen_image_patchify_u8)
    x = raw.reshape(b, gh // m, m, ph, gw // m, m, ph, c)
    x = x.transpose(0, 1, 4, 2, 5, 7, 3, 6)  # [B,ghm,gwm,m,mw,C,ph,pw]
    x = x.reshape(b, gh * gw, c, 1, ph, ph)
    x = jnp.broadcast_to(x, (b, gh * gw, c, tps, ph, ph))
    x = x.reshape(b, gh * gw, c * tps * ph * ph)
    x = jnp.take(x, gather_idx, axis=1)  # pad to the window layout
    mean, std = qwen_patch_norm_vectors(ph, tps)
    patches = ((x.astype(jnp.float32) / 255.0 - mean) / std).astype(dt)

    size = cfg.aux_image_size
    aux = jax.image.resize(raw.astype(jnp.float32), (b, size, size, c),
                           method="cubic") / 255.0
    aux = ((aux - AUX_IMAGE_MEAN) / AUX_IMAGE_STD).astype(dt)
    return patches, aux


@partial(jax.jit, static_argnames=("cfg", "num_windows", "grid"))
def _encode_image_and_regions(
    params, cfg: FO1Config,
    patches,              # [1, P, patch_dim] (float, or uint8 raw pixels)
    rot_cos, rot_sin, valid, inv_unit_idx, inv_token_idx,
    aux_image,            # [1, Ha, Wa, 3] (float, or uint8 raw pixels)
    aux_boxes, vt_boxes,  # [Nb, 4] (bucketed)
    *, num_windows: int, grid: tuple,
):
    """One compiled program for the whole vision + region path."""
    dt = _model_float_dtype(params["vision_tower"])
    patches, aux_image = _normalize_on_device(patches, aux_image, cfg, dt)
    tokens, captures = vit_forward(
        params["vision_tower"], cfg.vision, patches, rot_cos, rot_sin, valid,
        num_windows=num_windows, inv_unit_idx=inv_unit_idx)
    vision_tokens = projector_forward(
        params["mm_projector"], cfg.mm_projector_type, tokens)[0]

    vt_map = captures_to_feature_map(captures, inv_token_idx, grid,
                                     cfg.vision.spatial_merge_size)[0]
    stage_maps = davit_forward(params["vision_tower_aux"], cfg.davit, aux_image)
    region_feats = hfre_forward(params.get("hfre", {}), cfg.hfre,
                                [m[0] for m in stage_maps],
                                aux_boxes, vt_map, vt_boxes)
    region_tokens = projector_forward(
        params["mm_projector_aux"], cfg.mm_projector_aux_type,
        region_feats.astype(vision_tokens.dtype))
    return vision_tokens, region_tokens


@partial(jax.jit, static_argnames=("cfg", "num_windows", "grid"))
def _encode_image_and_regions_batched(
    params, cfg: FO1Config,
    patches,              # [B, P, patch_dim] — or raw uint8 [B, H, W, 3]
    rot_cos, rot_sin, valid, inv_unit_idx, inv_token_idx,
    aux_image,            # [B, Ha, Wa, 3] (None in raw mode)
    aux_boxes, vt_boxes,  # [B, Nb, 4] (shared bucket)
    gather_idx=None,      # [P] window-pad gather (raw mode only)
    *, num_windows: int, grid: tuple,
):
    """Batched encode for same-geometry images: the ViT/DaViT stacks are
    batch-native, the HFRE (per-image ROI pooling) is vmapped over the batch.
    The single biggest serving-throughput lever (SURVEY.md §7 step 9) — the
    reference loops images one-by-one (qwen2_5_vl_encoder.py:228-257)."""
    dt = _model_float_dtype(params["vision_tower"])
    if patches.ndim == 4:  # raw uint8 images: full preproc on device
        patches, aux_image = _device_preproc_batched(
            patches, cfg, gather_idx, dt)
    patches, aux_image = _normalize_on_device(patches, aux_image, cfg, dt)
    tokens, captures = vit_forward(
        params["vision_tower"], cfg.vision, patches, rot_cos, rot_sin, valid,
        num_windows=num_windows, inv_unit_idx=inv_unit_idx)
    vision_tokens = projector_forward(
        params["mm_projector"], cfg.mm_projector_type, tokens)  # [B, U, D]

    vt_maps = captures_to_feature_map(captures, inv_token_idx, grid,
                                      cfg.vision.spatial_merge_size)
    stage_maps = davit_forward(params["vision_tower_aux"], cfg.davit,
                               aux_image)
    hfre_p = params.get("hfre", {})
    region_feats = jax.vmap(
        lambda maps, ab, vm, vb: hfre_forward(hfre_p, cfg.hfre, maps, ab,
                                              vm, vb)
    )(stage_maps, aux_boxes, vt_maps, vt_boxes)
    region_tokens = projector_forward(
        params["mm_projector_aux"], cfg.mm_projector_aux_type,
        region_feats.astype(vision_tokens.dtype))
    return vision_tokens, region_tokens  # [B, U, D], [B, Nb, D]


@partial(jax.jit, static_argnames=("cfg", "num_windows"))
def _encode_image_only(params, cfg: FO1Config, patches, rot_cos, rot_sin,
                       valid, inv_unit_idx, *, num_windows: int):
    """Vision tokens for an extra (region-less) image in a multi-image
    prompt."""
    patches, _ = _normalize_on_device(
        patches, None, cfg, _model_float_dtype(params["vision_tower"]))
    tokens, _ = vit_forward(
        params["vision_tower"], cfg.vision, patches, rot_cos, rot_sin, valid,
        num_windows=num_windows, inv_unit_idx=inv_unit_idx,
        capture_multi_level=False)
    return projector_forward(params["mm_projector"], cfg.mm_projector_type,
                             tokens)[0]


@partial(jax.jit, static_argnames=("pad_len",))
def _splice_embeds(params_text, input_ids, image_feats, image_positions,
                   region_feats, region_positions, *, pad_len: int):
    """Embed + scatter features; positions padded with index S point at an
    extra scratch row which is dropped, so box-count bucketing never writes
    into the real sequence."""
    s = input_ids.shape[0]
    embeds = llm.embed_tokens(params_text, jnp.maximum(input_ids, 0))
    scratch = jnp.zeros((s + 1, embeds.shape[-1]), embeds.dtype)
    scratch = scratch.at[:s].set(embeds)
    scratch = scratch.at[image_positions].set(image_feats.astype(embeds.dtype))
    scratch = scratch.at[region_positions].set(region_feats.astype(embeds.dtype))
    out = scratch[:s]
    pad = jnp.zeros((pad_len - s, embeds.shape[-1]), embeds.dtype)
    return jnp.concatenate([out, pad], axis=0)[None]


@partial(jax.jit, static_argnames=("pad_len",))
def _splice_embeds_batched(params_text, input_ids, image_feats,
                           image_positions, region_feats, region_positions,
                           *, pad_len: int):
    """Whole-batch embed + scatter: one program instead of B per-row
    _splice_embeds dispatches. Callers pad input_ids to [B, pad_len] and
    point padded image/region positions at the scratch row `pad_len`, which
    is dropped. Requires equal per-row feature counts (the batched serving
    path guarantees one shared geometry / box bucket)."""
    b, L = input_ids.shape
    assert L == pad_len
    embeds = llm.embed_tokens(params_text, jnp.maximum(input_ids, 0))
    d = embeds.shape[-1]
    scratch = jnp.zeros((b, L + 1, d), embeds.dtype).at[:, :L].set(embeds)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    scratch = scratch.at[rows, image_positions].set(
        image_feats.astype(embeds.dtype))
    scratch = scratch.at[rows, region_positions].set(
        region_feats.astype(embeds.dtype))
    return scratch[:, :L]


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "num_windows", "grid",
                                   "pad_len", "cache_len"))
def _serve_batch(params, cfg: FO1Config, gen_cfg, patches, rot_cos, rot_sin,
                 valid, inv_unit_idx, inv_token_idx, aux_image, aux_boxes,
                 vt_boxes, ids, img_pos, reg_pos, pos, seq_lens, deltas, rng,
                 gather_idx=None,
                 *, num_windows: int, grid: tuple, pad_len: int,
                 cache_len: int):
    """The whole serving step — batched encode, embedding splice, prefill and
    the decode loop — as ONE compiled program. On the tunneled device link
    every program launch and transfer enqueue carries real latency, so the
    multi-program path (6 launches per batch) leaves the device idle between
    programs; fusing them removes those gaps and lets XLA reuse the
    intermediate buffers. Returns (tokens [B, max_new], num_steps)."""
    vtok, rtok = _encode_image_and_regions_batched.__wrapped__(
        params, cfg, patches, rot_cos, rot_sin, valid, inv_unit_idx,
        inv_token_idx, aux_image, aux_boxes, vt_boxes, gather_idx,
        num_windows=num_windows, grid=grid)
    embeds = _splice_embeds_batched.__wrapped__(
        params["text"], ids, vtok, img_pos, rtok, reg_pos, pad_len=pad_len)
    cache, first_logits = prefill.__wrapped__(
        params["text"], cfg.text, embeds, pos, seq_lens, cache_len=cache_len)
    tokens, steps, _ = decode_loop.__wrapped__(
        params["text"], cfg.text, gen_cfg, cache, first_logits, seq_lens,
        deltas, rng, prompt_pad=pad_len)
    return tokens, steps


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "num_windows", "grid",
                                   "pad_len", "cache_len"))
def _session_start(params, cfg: FO1Config, gen_cfg, patches, rot_cos,
                   rot_sin, valid, inv_unit_idx, inv_token_idx, aux_image,
                   aux_boxes, vt_boxes, ids, img_pos, reg_pos, pos, seq_lens,
                   rng, gather_idx=None, *, num_windows: int, grid: tuple,
                   pad_len: int, cache_len: int):
    """Continuous-batching session opener: batched encode + splice +
    prefill + first-token sample as ONE program (the decode runs separately
    in chunks — models/fo1.py `decode_session_chunk`). Returns
    (kv_cache, tok0 [B], done0 [B])."""
    vtok, rtok = _encode_image_and_regions_batched.__wrapped__(
        params, cfg, patches, rot_cos, rot_sin, valid, inv_unit_idx,
        inv_token_idx, aux_image, aux_boxes, vt_boxes, gather_idx,
        num_windows=num_windows, grid=grid)
    embeds = _splice_embeds_batched.__wrapped__(
        params["text"], ids, vtok, img_pos, rtok, reg_pos, pad_len=pad_len)
    cache, first_logits = prefill.__wrapped__(
        params["text"], cfg.text, embeds, pos, seq_lens, cache_len=cache_len)
    tok0, done0 = sample_first.__wrapped__(first_logits, gen_cfg, rng)
    return cache, tok0, done0


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "num_windows", "grid",
                                   "pad_len"),
         donate_argnames=("kv_cache", "cur", "row_steps", "done", "seq_lens",
                          "rope_deltas", "row_max", "tail"))
def _session_refill(params, cfg: FO1Config, gen_cfg, patches, rot_cos,
                    rot_sin, valid, inv_unit_idx, inv_token_idx, aux_image,
                    aux_boxes, vt_boxes, ids, img_pos, reg_pos, pos,
                    seq_lens_g, deltas_g, row_max_g, slots, kv_cache, cur,
                    row_steps, done, seq_lens, rope_deltas, row_max, tail,
                    rng, gather_idx=None, *, num_windows: int, grid: tuple,
                    pad_len: int):
    """Refill freed decode slots with G new requests: encode + splice +
    prefill-into-slots + first-token sample + per-row state scatter, one
    program. The whole session state is donated through so refills are
    in-place. Returns the updated state pytree + tok0 [G]."""
    vtok, rtok = _encode_image_and_regions_batched.__wrapped__(
        params, cfg, patches, rot_cos, rot_sin, valid, inv_unit_idx,
        inv_token_idx, aux_image, aux_boxes, vt_boxes, gather_idx,
        num_windows=num_windows, grid=grid)
    embeds = _splice_embeds_batched.__wrapped__(
        params["text"], ids, vtok, img_pos, rtok, reg_pos, pad_len=pad_len)
    kv_cache, logits = prefill_into_slots.__wrapped__(
        params["text"], cfg.text, embeds, pos, seq_lens_g, kv_cache, slots)
    tok0, done0 = sample_first.__wrapped__(logits, gen_cfg, rng)
    cur = cur.at[slots].set(tok0)
    row_steps = row_steps.at[slots].set(1)
    done = done.at[slots].set(done0)
    seq_lens = seq_lens.at[slots].set(seq_lens_g)
    rope_deltas = rope_deltas.at[slots].set(deltas_g)
    row_max = row_max.at[slots].set(row_max_g)
    tail = tail.at[slots].set(jnp.full((tail.shape[1],), -1, jnp.int32))
    return (kv_cache, cur, row_steps, done, seq_lens, rope_deltas, row_max,
            tail, tok0)


@dataclass
class GenerationResult:
    text: str
    token_ids: np.ndarray        # generated ids (trimmed at EOS)
    prompt_len: int
    num_steps: int


class FO1Model:
    """Stateful convenience wrapper over the functional model."""

    def __init__(self, cfg: FO1Config, params: dict, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        # device-resident ViT plan arrays keyed by image grid: the rotary
        # tables / window permutations are pure functions of the geometry,
        # so re-uploading them every call wastes several host->device round
        # trips per image on the (slow) tunneled link
        self._plan_device_cache: dict = {}
        self._gather_device_cache: dict = {}  # raw-mode window-pad gathers

    def _device_plan(self, grid, plan):
        key = tuple(int(g) for g in grid)
        hit = self._plan_device_cache.get(key)
        if hit is None:
            hit = jax.device_put((
                np.asarray(plan.rot_cos), np.asarray(plan.rot_sin),
                np.asarray(plan.valid), np.asarray(plan.inv_unit_idx),
                np.asarray(plan.inv_token_idx)))
            self._plan_device_cache[key] = hit
        return hit

    # ------------------------------------------------------------- init

    @classmethod
    def random_init(cls, cfg: FO1Config, seed: int = 0, dtype=jnp.float32,
                    tokenizer=None) -> "FO1Model":
        key = jax.random.PRNGKey(seed)
        k = jax.random.split(key, 5)
        vt_in = (cfg.vision.hidden_size * len(cfg.vision.fullatt_block_indexes)
                 + sum(cfg.hfre.aux_region_feature_dims))
        params = {
            "vision_tower": init_vit_params(k[0], cfg.vision, dtype),
            "vision_tower_aux": init_davit_params(k[1], cfg.davit, dtype),
            "text": llm.init_text_params(k[2], cfg.text, dtype),
            "mm_projector": init_projector_params(
                k[3], cfg.mm_projector_type, cfg.mm_hidden_size,
                cfg.text.hidden_size, dtype),
            "mm_projector_aux": init_projector_params(
                k[4], cfg.mm_projector_aux_type, cfg.mm_region_hidden_size,
                cfg.text.hidden_size, dtype),
            "hfre": {},
        }
        return cls(cfg, params, tokenizer)

    @classmethod
    def from_pretrained(cls, model_path: str, dtype=jnp.bfloat16,
                        tokenizer=None) -> "FO1Model":
        import os

        from vlm_fo1_tpu.checkpoint import load_fo1_checkpoint

        cfg = FO1Config.from_hf_config(os.path.join(model_path, "config.json"))
        params = load_fo1_checkpoint(model_path, cfg, dtype)
        if tokenizer is None:
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(model_path)
            except Exception:
                tokenizer = None
        return cls(cfg, params, tokenizer)

    # ------------------------------------------------------ host pipeline

    def prepare(self, messages: list[dict], max_pixels: int | None = None,
                device_preproc: bool = False,
                geometry_factor: int | None = None):
        """Host-side preparation mirroring prepare_inputs
        (reference mm_utils.py:530-655). Returns everything the device
        programs need.

        device_preproc=True (single-image prompts): ship ONE smart-resized
        raw uint8 image and run patchify/window-pad/normalize AND the aux
        768^2 squash on device (_device_preproc_batched) — ~5x fewer bytes
        over the slow tunneled link. ViT numerics exact; the aux input is
        one resampling generation removed from the reference's (bicubic
        from the smart-resized image instead of from the shortest-edge
        image)."""
        cfg = self.cfg
        prompt, tokens, media_urls, bbox_list = build_chat_tokens(
            self.tokenizer, messages)
        if not media_urls:
            raise ValueError("FO1 requires at least one image/video message")

        # load media: plain entries are images, {"video": frames} are videos
        media = []
        for u in media_urls:
            if isinstance(u, dict) and "video" in u:
                media.append(("video", [pp.load_image(f) for f in u["video"]]))
            else:
                media.append(("image", pp.load_image(u)))

        # shortest-edge resize + box rescale for images (regions attach to
        # the first image slot, matching the reference single-image flow)
        first_image_idx = next((i for i, (k, _) in enumerate(media)
                                if k == "image"), None)
        boxes = []
        if first_image_idx is not None:
            imgs = [m for k, m in media if k == "image"]
            per_image = [list(bbox_list or [])] + [[] for _ in imgs[1:]]
            imgs, bbox_lists = pp.resize_shortest_edge_images_and_bboxes(
                imgs, per_image, max_size=cfg.max_image_long_side)
            boxes = bbox_lists[0][:cfg.max_regions]
            it = iter(imgs)
            media = [(k, next(it) if k == "image" else m) for k, m in media]

        # per-slot primary preprocessing + window plans (the reference loops
        # media one-by-one through the tower, qwen2_5_vl_encoder.py:238)
        pvs, grids, plans, slot_ids = [], [], [], []
        raw_image = None
        raw_mode = (device_preproc and len(media) == 1
                    and media[0][0] == "image")
        for kind, m in media:
            if kind == "video":
                pv, grid = pp.qwen_video_preprocess(
                    m, patch_size=cfg.vision.patch_size,
                    merge_size=cfg.vision.spatial_merge_size,
                    min_pixels=cfg.min_pixels,
                    max_pixels=max_pixels or 1024 * 1024)
                slot_ids.append(cfg.video_token_id)
            elif raw_mode:
                # minimal-bytes mode: ship the smart-resized raw image only;
                # patchify + window-pad + aux squash happen on device
                raw_image, grid = pp.qwen_image_raw_u8(
                    m, patch_size=cfg.vision.patch_size,
                    merge_size=cfg.vision.spatial_merge_size,
                    min_pixels=cfg.min_pixels,
                    max_pixels=max_pixels or cfg.max_pixels,
                    round_factor=geometry_factor)
                pv = None
                slot_ids.append(cfg.image_token_id)
            else:
                # ship raw uint8; the /255-mean-std affine runs on device
                # fused into patch embed (see _normalize_on_device)
                pv, grid = pp.qwen_image_patchify_u8(
                    m, patch_size=cfg.vision.patch_size,
                    merge_size=cfg.vision.spatial_merge_size,
                    min_pixels=cfg.min_pixels,
                    max_pixels=max_pixels or cfg.max_pixels,
                    round_factor=geometry_factor)
                slot_ids.append(cfg.image_token_id)
            pvs.append(pv)
            grids.append(grid)
            plans.append(build_vit_plan(grid, cfg.vision))

        # aux branch + boxes only when the first slot is an image
        if first_image_idx == 0:
            img = media[0][1]
            grid = grids[0]
            # raw mode derives the aux squash on device from raw_image
            aux = None if raw_mode else pp.aux_image_u8(img,
                                                        cfg.aux_image_size)
            w, h = img.size
            aux_boxes = np.asarray(
                pp.adjust_bbox(boxes, h, w, cfg.aux_image_size,
                               cfg.aux_image_size)
                if boxes else np.zeros((0, 4)), np.float32).reshape(-1, 4)
            # rescale aux-space boxes into ViT-input pixel space
            # (reference omchat_qwen2_5_vl.py:94-99)
            sx = grid[2] * cfg.vision.patch_size / cfg.aux_image_size
            sy = grid[1] * cfg.vision.patch_size / cfg.aux_image_size
            vt_boxes = aux_boxes * np.array([sx, sy, sx, sy], np.float32)
        else:
            aux = None
            boxes = []
            aux_boxes = np.zeros((0, 4), np.float32)
            vt_boxes = np.zeros((0, 4), np.float32)

        info = expand_multimodal_tokens(tokens,
                                        [p.num_units for p in plans],
                                        slot_ids)
        pos_ids, deltas = pp.get_rope_index(
            info.input_ids[None], grids,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            tokens_per_second=cfg.vision.tokens_per_second,
            second_per_grid_ts=[1.0] * sum(k == "video" for k, _ in media))
        return {
            "prompt": prompt, "media": media, "bbox_list": boxes,
            "pixel_values": pvs[0], "grid": grids[0], "plan": plans[0],
            "pixel_values_list": pvs, "grids": grids, "plans": plans,
            "first_is_image": first_image_idx == 0,
            "aux": aux, "aux_boxes": aux_boxes, "vt_boxes": vt_boxes,
            "raw_image": raw_image,
            "splice": info, "position_ids": pos_ids, "rope_deltas": deltas,
        }

    # ---------------------------------------------------------- device

    def encode(self, prep: dict):
        """Run the jitted vision/region program. Returns
        (vision_tokens [U, D], region_tokens [n_real, D])."""
        cfg = self.cfg
        plan = prep["plan"]
        dt = jax.tree.leaves(self.params["vision_tower"])[0].dtype
        first_is_image = prep.get("first_is_image", True)

        if prep.get("raw_image") is not None and prep["pixel_values"] is None:
            # a raw-mode prep routed through the non-fused path (streaming /
            # profiling): materialize the host representations from the
            # already-resized raw image
            from PIL import Image as _Image

            prep["pixel_values"] = pp.patchify_raw_np(
                prep["raw_image"], cfg.vision.patch_size,
                cfg.vision.spatial_merge_size,
                cfg.vision.temporal_patch_size)
            prep["pixel_values_list"] = [prep["pixel_values"]]
            prep["aux"] = pp.aux_image_u8(
                _Image.fromarray(prep["raw_image"]), cfg.aux_image_size)

        if first_is_image:
            n_real = len(prep["aux_boxes"])
            nb = _round_boxes(max(n_real, 1))
            dummy = np.array([[0.0, 10.0, 0.0, 10.0]], np.float32)
            aux_b = np.concatenate(
                [prep["aux_boxes"], np.tile(dummy, (nb - n_real, 1))])[:nb]
            vt_b = np.concatenate(
                [prep["vt_boxes"], np.tile(dummy, (nb - n_real, 1))])[:nb]
            pv = pad_pixel_values(prep["pixel_values"], plan)[None]
            # uint8 pixel values go up raw (normalized on device)
            patches = jnp.asarray(pv) if pv.dtype == np.uint8 \
                else jnp.asarray(pv, dtype=dt)
            aux = prep["aux"]
            if aux.dtype == np.uint8:          # already [H, W, C]
                aux_img = jnp.asarray(aux[None])
            else:                              # host-normalized [C, H, W]
                aux_img = jnp.asarray(aux.transpose(1, 2, 0)[None], dtype=dt)
            rot_cos, rot_sin, valid, inv_u, inv_t = self._device_plan(
                prep["grid"], plan)
            vision_tokens, region_tokens = _encode_image_and_regions(
                self.params, cfg, patches, rot_cos, rot_sin, valid, inv_u,
                inv_t, aux_img, jnp.asarray(aux_b), jnp.asarray(vt_b),
                num_windows=plan.num_windows, grid=prep["grid"])
            rest = zip(prep["pixel_values_list"][1:], prep["plans"][1:])
        else:
            # first slot is a video: no region branch
            n_real = 0
            nb = _round_boxes(1)
            d_model = cfg.text.hidden_size
            region_tokens = jnp.zeros((nb, d_model), dtype=dt)
            vision_tokens = None
            rest = zip(prep["pixel_values_list"], prep["plans"])

        extra = []
        grids_rest = (prep["grids"][1:] if first_is_image else prep["grids"])
        for (pv, pl_i), g_i in zip(rest, grids_rest):
            rc, rs, va, iu, _ = self._device_plan(g_i, pl_i)
            pv_p = pad_pixel_values(pv, pl_i)[None]
            pv_d = jnp.asarray(pv_p) if pv_p.dtype == np.uint8 \
                else jnp.asarray(pv_p, dtype=dt)
            extra.append(_encode_image_only(
                self.params, cfg, pv_d, rc, rs, va, iu,
                num_windows=pl_i.num_windows))
        if vision_tokens is None:
            vision_tokens = jnp.concatenate(extra, axis=0)
        elif extra:
            vision_tokens = jnp.concatenate([vision_tokens, *extra], axis=0)
        return vision_tokens, region_tokens[:n_real], nb, region_tokens

    def _stop_token_sequences(self, stop_strings) -> tuple:
        """Tokenize stop keywords into id tuples for the jitted n-gram stop
        (reference KeywordsStoppingCriteria matches keywords both as id
        sequences and decoded strings, mm_utils.py:137-181; the id-sequence
        match happens inside decode_loop, the string match in
        decode_to_text). Accepts strings or pre-tokenized id sequences."""
        seqs = []
        for s in stop_strings or ():
            if isinstance(s, (list, tuple)):
                seqs.append(tuple(int(t) for t in s))
            elif self.tokenizer is not None:
                seqs.append(tuple(int(t) for t in self.tokenizer.encode(s)))
        return tuple(seqs)

    @staticmethod
    def _trim_stop_tail(out: np.ndarray, stop_seqs: tuple) -> np.ndarray:
        """Drop a trailing matched stop sequence from generated ids."""
        for seq in stop_seqs:
            n = len(seq)
            if n and len(out) >= n and out[-n:].tolist() == list(seq):
                return out[:-n]
        return out

    def generate(
        self,
        messages: list[dict],
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        max_pixels: int | None = None,
        eos_token_id: int | None = None,
        stop_strings=None,
        streamer=None,
        timer=None,
    ) -> GenerationResult:
        """streamer: optional callable(text_so_far) — switches to a
        step-by-step decode (the reference streams via HF TextStreamer,
        mm_utils.py:628-630). timer: optional runtime.profiler.StageTimer.
        stop_strings: extra stop keywords (strings or id sequences) beyond
        EOS — multi-token keywords stop the jitted loop via n-gram match."""
        from vlm_fo1_tpu.runtime.profiler import StageTimer

        cfg = self.cfg
        stop_seqs = self._stop_token_sequences(stop_strings)
        # mid-pipeline device syncs exist only for stage profiling: each
        # synchronized dispatch costs a full ~26ms host<->device round trip
        # on the tunneled link, so without a caller timer everything stays
        # async until the final token fetch
        profiling = timer is not None
        timer = timer or StageTimer()
        with timer.stage("prepare"):
            prep = self.prepare(messages, max_pixels=max_pixels)
        if not profiling and streamer is None and self._fusable([prep]):
            # single-stream latency rides the same one-launch program as
            # batched serving (per-launch latency dominates small prompts
            # on the tunneled link)
            handle = self._launch_fused(
                [prep], max_new_tokens=max_new_tokens,
                temperature=temperature, top_p=top_p, seed=seed,
                eos_token_id=eos_token_id, stop_sequences=stop_seqs)
            return self.finish_batch(handle)[0]
        with timer.stage("encode"):
            vision_tokens, region_tokens, nb, region_padded = self.encode(prep)
            if profiling:
                jax.block_until_ready(vision_tokens)

        info: SpliceInfo = prep["splice"]
        s = info.seq_len
        pad_len = pad_to_bucket(s, 128)
        # bucket the scatter positions: extra rows target the scratch slot
        n_real = len(info.region_positions)
        reg_pos = np.full(nb, s, np.int32)
        reg_pos[:n_real] = info.region_positions
        with timer.stage("prefill"):
            embeds = _splice_embeds(
                self.params["text"], jnp.asarray(info.input_ids),
                vision_tokens, jnp.asarray(info.image_positions),
                region_padded, jnp.asarray(reg_pos), pad_len=pad_len)

            pos = np.zeros((3, 1, pad_len), np.int32)
            pos[:, :, :s] = prep["position_ids"]
            cache_len = pad_len + max_new_tokens
            cache, first_logits = prefill(
                self.params["text"], cfg.text, embeds, jnp.asarray(pos),
                jnp.asarray([s]), cache_len=cache_len)
            if profiling:
                jax.block_until_ready(first_logits)

        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos,
            pad_token_id=cfg.pad_token_id, stop_sequences=stop_seqs)
        with timer.stage("decode"):
            if streamer is not None:
                tokens, steps = self._decode_streaming(
                    cache, first_logits, s, int(prep["rope_deltas"][0, 0]),
                    gen_cfg, streamer,
                    stop_strings=[x for x in (stop_strings or ())
                                  if isinstance(x, str)])
            else:
                tokens, steps, _ = decode_loop(
                    self.params["text"], cfg.text, gen_cfg, cache,
                    first_logits, jnp.asarray([s]),
                    jnp.asarray(prep["rope_deltas"][:, 0]),
                    jax.random.PRNGKey(seed))
                if profiling:
                    jax.block_until_ready(tokens)
        tokens = np.asarray(tokens)[0]
        steps = int(steps)
        out = tokens[:steps]
        if eos in out.tolist():
            out = out[:out.tolist().index(eos)]
        out = self._trim_stop_tail(out, stop_seqs)
        text = decode_to_text(self.tokenizer, tokens[:steps], eos,
                              stop_strings=("<|im_end|>",) + tuple(
                                  x for x in (stop_strings or ())
                                  if isinstance(x, str))) \
            if self.tokenizer else ""
        return GenerationResult(text=text, token_ids=out,
                                prompt_len=s, num_steps=steps)

    @staticmethod
    def _fusable(preps: list[dict]) -> bool:
        """True when a batch can run as the single fused serving program:
        single-image prompts sharing one geometry (so the vision inputs
        stack and every row has the same image-token count)."""
        return (
            all(p.get("first_is_image", True) and len(p["plans"]) == 1
                for p in preps)
            and len({tuple(int(g) for g in p["grid"])
                     for p in preps}) == 1
            # uniform transfer mode: all raw-image or all patchified
            and len({p.get("raw_image") is not None for p in preps}) == 1)

    def _launch_fused(
        self,
        preps: list[dict],
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        eos_token_id: int | None = None,
        stop_sequences: tuple = (),
    ) -> dict:
        """launch_batch via the single fused program (_serve_batch): one
        device launch per batch instead of encode + splice + prefill +
        decode (+ stacks) — the per-program launch latency on the tunneled
        link was a measurable share of the serving cycle."""
        cfg = self.cfg
        enc = self._stack_batch_inputs(preps)
        b = len(preps)
        splices = [p["splice"] for p in preps]
        seq_lens = np.array([s.seq_len for s in splices], np.int32)
        pad_len = pad_to_bucket(int(seq_lens.max()), 128)
        ids = np.zeros((b, pad_len), np.int32)
        img_pos = np.empty((b, len(splices[0].image_positions)), np.int32)
        reg_pos = np.full((b, enc["nb"]), pad_len, np.int32)
        pos = np.zeros((3, b, pad_len), np.int32)
        for i, (p, info) in enumerate(zip(preps, splices)):
            ids[i, :info.seq_len] = info.input_ids
            img_pos[i] = info.image_positions
            reg_pos[i, :len(info.region_positions)] = info.region_positions
            pos[:, i, :info.seq_len] = p["position_ids"][:, 0]
        deltas = np.array([int(p["rope_deltas"][0, 0]) for p in preps],
                          np.int32)

        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos, pad_token_id=cfg.pad_token_id,
            stop_sequences=stop_sequences)
        tokens, steps = _serve_batch(
            self.params, cfg, gen_cfg, enc["patches"], *enc["plan_arrays"],
            enc["aux"], enc["aux_boxes"], enc["vt_boxes"], jnp.asarray(ids),
            jnp.asarray(img_pos), jnp.asarray(reg_pos), jnp.asarray(pos),
            jnp.asarray(seq_lens), jnp.asarray(deltas),
            jax.random.PRNGKey(seed), enc["gather_idx"],
            num_windows=enc["num_windows"],
            grid=enc["grid"], pad_len=pad_len,
            cache_len=pad_len + max_new_tokens)
        return {"tokens": tokens, "steps": steps, "seq_lens": seq_lens,
                "eos": eos, "stop_sequences": stop_sequences}

    def _encode_many(self, preps: list[dict]):
        """Encode a list of prepared inputs, batching same-geometry
        single-image items through one _encode_image_and_regions_batched
        call. Returns per-item (splice, nb, vision_tokens, region_padded)."""
        batchable = (
            len(preps) > 1
            and all(p.get("first_is_image", True) and len(p["plans"]) == 1
                    for p in preps)
            and len({tuple(int(g) for g in p["grid"])
                     for p in preps}) == 1
            and len({p.get("raw_image") is not None for p in preps}) == 1)
        if not batchable:
            out = []
            for p in preps:
                vision_tokens, _, nb, region_padded = self.encode(p)
                out.append((p["splice"], nb, vision_tokens, region_padded))
            return out
        enc = self._stack_batch_inputs(preps)
        vtok, rtok = _encode_image_and_regions_batched(
            self.params, self.cfg, enc["patches"], *enc["plan_arrays"],
            enc["aux"], enc["aux_boxes"], enc["vt_boxes"], enc["gather_idx"],
            num_windows=enc["num_windows"], grid=enc["grid"])
        return [(p["splice"], enc["nb"], vtok[i], rtok[i])
                for i, p in enumerate(preps)]

    def _stack_batch_inputs(self, preps: list[dict]) -> dict:
        """Host-side stacking + device transfer of a same-geometry batch's
        vision inputs (shared by the batched encode and the fused serving
        program)."""
        plan = preps[0]["plan"]
        grid = preps[0]["grid"]
        dt = _model_float_dtype(self.params["vision_tower"])
        nb = _round_boxes(max(max(len(p["aux_boxes"]) for p in preps), 1))
        dummy = np.array([[0.0, 10.0, 0.0, 10.0]], np.float32)

        def padded(b):
            return np.concatenate([b, np.tile(dummy, (nb - len(b), 1))])[:nb]

        gather_d = None
        if all(p.get("raw_image") is not None for p in preps):
            # raw mode: ship ONE uint8 image per row; device does patchify,
            # window-pad (via the cached gather) and the aux squash
            patches_d = jnp.asarray(np.stack([p["raw_image"] for p in preps]))
            aux_d = None
            key = tuple(int(g) for g in grid)
            gather_d = self._gather_device_cache.get(key)
            if gather_d is None:
                gather_d = jax.device_put(np.asarray(plan.gather_idx))
                self._gather_device_cache[key] = gather_d
        else:
            patches = np.stack([pad_pixel_values(p["pixel_values"], plan)
                                for p in preps])
            aux = np.stack([p["aux"] if p["aux"].dtype == np.uint8
                            else p["aux"].transpose(1, 2, 0) for p in preps])
            patches_d = jnp.asarray(patches) if patches.dtype == np.uint8 \
                else jnp.asarray(patches, dtype=dt)
            aux_d = jnp.asarray(aux) if aux.dtype == np.uint8 \
                else jnp.asarray(aux, dtype=dt)
        aux_b = np.stack([padded(p["aux_boxes"]) for p in preps])
        vt_b = np.stack([padded(p["vt_boxes"]) for p in preps])
        return {
            "patches": patches_d, "aux": aux_d,
            "aux_boxes": jnp.asarray(aux_b), "vt_boxes": jnp.asarray(vt_b),
            "plan_arrays": self._device_plan(grid, plan),
            "gather_idx": gather_d,
            "num_windows": plan.num_windows, "grid": grid, "nb": nb,
        }

    def generate_batch(
        self,
        messages_list: list[list[dict]],
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        max_pixels: int | None = None,
        eos_token_id: int | None = None,
    ) -> list[GenerationResult]:
        """Batched generation (throughput path — the reference eval loops are
        strictly batch-1, SURVEY.md §3.4). Vision encodes run per item (jit
        cached per geometry); prefill and the decode loop run as one batch
        with ragged prompts right-padded to a shared bucket."""
        preps = [self.prepare(messages, max_pixels=max_pixels)
                 for messages in messages_list]
        handle = self.launch_batch(
            preps, max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, seed=seed, eos_token_id=eos_token_id)
        return self.finish_batch(handle)

    def launch_batch(
        self,
        preps: list[dict],
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        eos_token_id: int | None = None,
        stop_strings=None,
    ) -> dict:
        """Dispatch the full device pipeline (encode -> splice -> prefill ->
        decode loop) for a batch of prepared inputs WITHOUT any host<->device
        synchronization: every return value is an in-flight device array.
        `finish_batch` blocks and decodes. The launch/finish split is what
        lets a serving pipeline overlap host preprocessing of the next batch
        with device compute of this one (runtime/serving.py)."""
        if self._fusable(preps):
            return self._launch_fused(
                preps, max_new_tokens=max_new_tokens, temperature=temperature,
                top_p=top_p, seed=seed, eos_token_id=eos_token_id)
        cfg = self.cfg
        splices = self._encode_many(preps)

        pad_len = pad_to_bucket(max(s.seq_len for s, *_ in splices), 128)
        uniform = len({
            (tuple(vt.shape), tuple(rp.shape), len(s.image_positions))
            for s, _, vt, rp in splices}) == 1
        if uniform:
            # one batched splice program: B per-row dispatches and ~3B small
            # host->device transfers collapse into 1 dispatch + 3 transfers
            # (every transfer enqueue costs tunnel latency on this link)
            bsz = len(splices)
            ids = np.zeros((bsz, pad_len), np.int32)
            img_pos = np.empty((bsz, len(splices[0][0].image_positions)),
                               np.int32)
            reg_pos = np.full((bsz, splices[0][1]), pad_len, np.int32)
            for i, (info, _, _, _) in enumerate(splices):
                ids[i, :info.seq_len] = info.input_ids
                img_pos[i] = info.image_positions
                reg_pos[i, :len(info.region_positions)] = \
                    info.region_positions
            embeds = _splice_embeds_batched(
                self.params["text"], jnp.asarray(ids),
                jnp.stack([vt for _, _, vt, _ in splices]),
                jnp.asarray(img_pos),
                jnp.stack([rp for _, _, _, rp in splices]),
                jnp.asarray(reg_pos), pad_len=pad_len)
        else:
            rows = []
            for info, nb, vision_tokens, region_padded in splices:
                reg_pos = np.full(nb, info.seq_len, np.int32)
                reg_pos[:len(info.region_positions)] = info.region_positions
                rows.append(_splice_embeds(
                    self.params["text"], jnp.asarray(info.input_ids),
                    vision_tokens, jnp.asarray(info.image_positions),
                    region_padded, jnp.asarray(reg_pos), pad_len=pad_len)[0])
            embeds = jnp.stack(rows)

        b = len(preps)
        seq_lens = np.array([s.seq_len for s, *_ in splices], np.int32)
        pos = np.zeros((3, b, pad_len), np.int32)
        for i, prep in enumerate(preps):
            pos[:, i, :seq_lens[i]] = prep["position_ids"][:, 0]
        deltas = np.array([int(p["rope_deltas"][0, 0]) for p in preps],
                          np.int32)

        cache_len = pad_len + max_new_tokens
        cache, first_logits = prefill(
            self.params["text"], cfg.text, embeds, jnp.asarray(pos),
            jnp.asarray(seq_lens), cache_len=cache_len)

        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos, pad_token_id=cfg.pad_token_id)
        tokens, steps, _ = decode_loop(
            self.params["text"], cfg.text, gen_cfg, cache, first_logits,
            jnp.asarray(seq_lens), jnp.asarray(deltas),
            jax.random.PRNGKey(seed), prompt_pad=pad_len)
        return {"tokens": tokens, "steps": steps, "seq_lens": seq_lens,
                "eos": eos}

    def finish_batch(self, handle: dict) -> list[GenerationResult]:
        """Block on a launch_batch handle and decode the results."""
        tokens = np.asarray(handle["tokens"])
        steps = int(handle["steps"])
        seq_lens, eos = handle["seq_lens"], handle["eos"]
        stop_seqs = handle.get("stop_sequences", ())

        results = []
        for i in range(tokens.shape[0]):
            row = tokens[i, :steps]
            out = row
            if eos in out.tolist():
                out = out[:out.tolist().index(eos)]
            out = self._trim_stop_tail(out, stop_seqs)
            text = decode_to_text(self.tokenizer, row, eos) \
                if self.tokenizer else ""
            results.append(GenerationResult(
                text=text, token_ids=out, prompt_len=int(seq_lens[i]),
                num_steps=steps))
        return results

    # ---------------------------------------------- continuous batching
    # (VERDICT r4 #4): the batch-synchronous decode_loop holds every slot
    # until ALL rows finish, so one long answer blocks 15 finished slots.
    # A session decodes in chunks; between chunks, finished slots are
    # refilled with new prepared requests (encode + prefill-into-slot +
    # state scatter as one program). The reference has no batching at all.

    def _session_token_arrays(self, preps: list[dict], enc: dict,
                              pad_len: int):
        """ids/img_pos/reg_pos/pos/seq_lens/deltas host arrays for a
        same-geometry prep batch at a FIXED pad_len bucket."""
        b = len(preps)
        splices = [p["splice"] for p in preps]
        seq_lens = np.array([s.seq_len for s in splices], np.int32)
        if int(seq_lens.max()) > pad_len:
            raise ValueError(
                f"prompt length {int(seq_lens.max())} exceeds the session "
                f"pad bucket {pad_len}")
        ids = np.zeros((b, pad_len), np.int32)
        img_pos = np.empty((b, len(splices[0].image_positions)), np.int32)
        reg_pos = np.full((b, enc["nb"]), pad_len, np.int32)
        pos = np.zeros((3, b, pad_len), np.int32)
        for i, (p, info) in enumerate(zip(preps, splices)):
            ids[i, :info.seq_len] = info.input_ids
            img_pos[i] = info.image_positions
            reg_pos[i, :len(info.region_positions)] = info.region_positions
            pos[:, i, :info.seq_len] = p["position_ids"][:, 0]
        deltas = np.array([int(p["rope_deltas"][0, 0]) for p in preps],
                          np.int32)
        return ids, img_pos, reg_pos, pos, seq_lens, deltas

    def start_session(
        self,
        preps: list[dict],
        max_new_tokens: int = 512,
        row_max: list[int] | None = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        eos_token_id: int | None = None,
        stop_sequences: tuple = (),
        chunk: int = 32,
        pad_len: int | None = None,
    ) -> dict:
        """Open a continuous-batching session over a same-geometry prep
        batch. `row_max` gives per-request token budgets (<= max_new_tokens,
        which sizes the shared cache). Returns the session state dict; drive
        it with decode_session_chunk / refill_session."""
        if not self._fusable(preps):
            raise ValueError("session batches must share one geometry "
                             "(see FO1Model._fusable)")
        cfg = self.cfg
        b = len(preps)
        enc = self._stack_batch_inputs(preps)
        splices = [p["splice"] for p in preps]
        pad_len = pad_len or pad_to_bucket(
            max(s.seq_len for s in splices), 128)
        ids, img_pos, reg_pos, pos, seq_lens, deltas = \
            self._session_token_arrays(preps, enc, pad_len)
        row_max = list(row_max or [max_new_tokens] * b)
        assert len(row_max) == b and max(row_max) <= max_new_tokens

        eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
        gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=eos, pad_token_id=cfg.pad_token_id,
            stop_sequences=stop_sequences)
        tlen = max([len(s) for s in stop_sequences] or [1])
        cache, tok0, done0 = _session_start(
            self.params, cfg, gen_cfg, enc["patches"], *enc["plan_arrays"],
            enc["aux"], enc["aux_boxes"], enc["vt_boxes"], jnp.asarray(ids),
            jnp.asarray(img_pos), jnp.asarray(reg_pos), jnp.asarray(pos),
            jnp.asarray(seq_lens), jax.random.PRNGKey(seed),
            enc["gather_idx"], num_windows=enc["num_windows"],
            grid=enc["grid"], pad_len=pad_len,
            cache_len=pad_len + max_new_tokens)
        return {
            "cache": cache, "cur": tok0,
            "row_steps": jnp.ones((b,), jnp.int32),
            "done": done0, "seq_lens": jnp.asarray(seq_lens),
            "deltas": jnp.asarray(deltas),
            "row_max": jnp.asarray(row_max, jnp.int32),
            "tail": jnp.full((b, tlen), -1, jnp.int32),
            "tok0": tok0,
            "gen_cfg": gen_cfg, "prompt_pad": pad_len, "chunk": chunk,
            "grid": enc["grid"], "batch": b, "eos": eos,
            "stop_sequences": stop_sequences, "seed": seed, "ticks": 0,
        }

    def decode_session_chunk(self, sess: dict):
        """Run one decode chunk on the session (async dispatch). Returns
        (tokens [B, chunk] device array, prev_row_steps device array,
        steps_taken device scalar) — the freshly generated tokens for row b
        are tokens[b, :new_row_steps[b] - prev_row_steps[b]]."""
        sess["ticks"] += 1
        prev_steps = sess["row_steps"]
        tokens, cur, row_steps, done, tail, steps, cache = decode_chunk(
            self.params["text"], self.cfg.text, sess["gen_cfg"],
            sess["cache"], sess["cur"], prev_steps, sess["done"],
            sess["seq_lens"], sess["deltas"], sess["row_max"], sess["tail"],
            jax.random.PRNGKey(sess["seed"] + 7919 * sess["ticks"]),
            prompt_pad=sess["prompt_pad"], chunk=sess["chunk"])
        sess.update(cache=cache, cur=cur, row_steps=row_steps, done=done,
                    tail=tail)
        return tokens, prev_steps, steps

    def refill_session(self, sess: dict, preps: list[dict],
                       slots: list[int],
                       row_max: list[int] | None = None) -> jnp.ndarray:
        """Fill freed slots with new prepared requests (same geometry as the
        session). Returns tok0 [G] — each refilled row's first generated
        token (the driver records it as that request's first output)."""
        assert len(preps) == len(slots) > 0
        enc = self._stack_batch_inputs(preps)
        if tuple(enc["grid"]) != tuple(sess["grid"]):
            raise ValueError("refill geometry differs from the session's")
        ids, img_pos, reg_pos, pos, seq_lens_g, deltas_g = \
            self._session_token_arrays(preps, enc, sess["prompt_pad"])
        row_max = list(row_max
                       or [sess["gen_cfg"].max_new_tokens] * len(preps))
        assert max(row_max) <= sess["gen_cfg"].max_new_tokens
        sess["ticks"] += 1
        (cache, cur, row_steps, done, seq_lens, deltas, row_maxd, tail,
         tok0) = _session_refill(
            self.params, self.cfg, sess["gen_cfg"], enc["patches"],
            *enc["plan_arrays"], enc["aux"], enc["aux_boxes"],
            enc["vt_boxes"], jnp.asarray(ids), jnp.asarray(img_pos),
            jnp.asarray(reg_pos), jnp.asarray(pos), jnp.asarray(seq_lens_g),
            jnp.asarray(deltas_g), jnp.asarray(row_max, jnp.int32),
            jnp.asarray(slots, jnp.int32), sess["cache"], sess["cur"],
            sess["row_steps"], sess["done"], sess["seq_lens"],
            sess["deltas"], sess["row_max"], sess["tail"],
            jax.random.PRNGKey(sess["seed"] + 7919 * sess["ticks"] + 1),
            enc["gather_idx"], num_windows=enc["num_windows"],
            grid=enc["grid"], pad_len=sess["prompt_pad"])
        sess.update(cache=cache, cur=cur, row_steps=row_steps, done=done,
                    seq_lens=seq_lens, deltas=deltas, row_max=row_maxd,
                    tail=tail)
        return tok0

    def _decode_streaming(self, cache, first_logits, seq_len, delta, gen_cfg,
                          streamer, stop_strings=()):
        """Host-driven step decode that invokes `streamer(text_so_far)` after
        every token (interactive parity with the reference's TextStreamer).
        stop_strings are matched at STRING level against the decoded text —
        the robust half of KeywordsStoppingCriteria (mm_utils.py:158-172):
        keywords whose token boundaries shift under BPE still stop."""
        from vlm_fo1_tpu.runtime.generate import decode_step

        tokens = []
        cur = int(np.asarray(jnp.argmax(first_logits, -1))[0])
        for step in range(gen_cfg.max_new_tokens):
            tokens.append(cur)
            text_now = None
            if self.tokenizer is not None:
                text_now = decode_to_text(
                    self.tokenizer, tokens, gen_cfg.eos_token_id,
                    stop_strings=("<|im_end|>",) + tuple(stop_strings))
                streamer(text_now)
            if cur == gen_cfg.eos_token_id:
                break
            if text_now is not None and stop_strings:
                # raw decode (no strip/trim) for containment, like the
                # reference's KeywordsStoppingCriteria string check
                raw = self.tokenizer.decode([int(t) for t in tokens])
                if any(s in raw for s in stop_strings):
                    break
            logits, cache = decode_step(
                self.params["text"], self.cfg.text, cache,
                jnp.asarray([cur], jnp.int32),
                jnp.asarray([seq_len + delta + step], jnp.int32),
                jnp.asarray(seq_len + step, jnp.int32))
            cur = int(np.asarray(jnp.argmax(logits, -1))[0])
        out = np.full((1, gen_cfg.max_new_tokens), gen_cfg.pad_token_id,
                      np.int32)
        out[0, :len(tokens)] = tokens
        return out, len(tokens)
