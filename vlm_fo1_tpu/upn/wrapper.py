"""UPNWrapper: the UPN public API (reference inference_wrapper.py:29-237).

    upn = UPNWrapper(ckpt_path)            # or UPNWrapper.random_init()
    raw = upn.inference(image, prompt_type="fine_grained_prompt")
    det = upn.filter(raw, min_score=0.3, nms_value=0.8)

Preprocessing matches the reference transform (shortest side 800, long side
cap 1333, ImageNet normalize — transform.py:6-142); images are padded to a
stride-128 bucket with a validity mask so jit recompiles only per bucket, and
the model runs one compiled program per bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from vlm_fo1_tpu.ops.nms import nms_numpy
from vlm_fo1_tpu.upn.model import UPNConfig, init_upn_params, upn_forward
from vlm_fo1_tpu.upn.swin import swin_large_config

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
BUCKET = 128


@partial(jax.jit, static_argnames=("cfg", "swin_cfg", "prompt"))
def _jit_forward(params, cfg, swin_cfg, image, valid_hw, prompt,
                 orig_wh=None):
    """image arrives as RAW uint8 pixels (2.75MB/image over the tunneled
    link instead of 11MB fp32); ImageNet-normalize on device and cast to
    the model's compute dtype. When `orig_wh` [B, 2] f32 is given, the
    host postprocess (sigmoid + cxcywh->xyxy original-pixel scaling +
    score sort, reference inference_wrapper.py:136-184) is fused in too —
    one dispatch, one small [B, nq, 5] pull instead of two dispatches and
    a host sort."""
    dts = {jnp.dtype(l.dtype) for l in jax.tree.leaves(params)}
    cdt = (jnp.bfloat16 if jnp.dtype(jnp.bfloat16) in dts else jnp.float32)
    if image.dtype == jnp.uint8:
        mean = jnp.asarray(IMAGENET_MEAN * 255.0)
        std = jnp.asarray(IMAGENET_STD * 255.0)
        image = ((image.astype(jnp.float32) - mean) / std).astype(cdt)
        # The reference pads with 0.0 AFTER normalization
        # (nested_tensor.py nested_tensor_from_tensor_list); uint8 zero-pad
        # would normalize to ~-2 (black), and Swin has no pixel-validity
        # masking — so zero the invalid bucket region in normalized space.
        rows = jnp.arange(image.shape[1])[None, :, None]   # [1, H, 1]
        cols = jnp.arange(image.shape[2])[None, None, :]   # [1, 1, W]
        valid = ((rows < valid_hw[:, 0, None, None])
                 & (cols < valid_hw[:, 1, None, None]))    # [B, H, W]
        image = image * valid[..., None].astype(cdt)
    else:  # pre-normalized fp32 (parity tests) — already zero-padded
        image = image.astype(cdt)
    out = upn_forward(params, cfg, swin_cfg, image, valid_hw, prompt)
    if orig_wh is not None:
        boxes = out["pred_boxes"].astype(jnp.float32)      # cxcywh [0,1]
        scores = jax.nn.sigmoid(out["pred_logits"].astype(jnp.float32))
        wh = orig_wh[:, None]                              # [B, 1, 2]
        half = boxes[..., 2:4] / 2
        xyxy = jnp.concatenate([(boxes[..., 0:2] - half) * wh,
                                (boxes[..., 0:2] + half) * wh], -1)
        order = jnp.argsort(-scores[..., 0], axis=-1, stable=True)
        out = dict(out)
        out["xyxy_sorted"] = jnp.take_along_axis(xyxy, order[..., None], 1)
        out["scores_sorted"] = jnp.take_along_axis(scores,
                                                   order[..., None], 1)
    return out


class UPNWrapper:
    def __init__(self, ckpt_path: str | None = None,
                 cfg: UPNConfig | dict | str | None = None, swin_cfg=None,
                 dtype=jnp.bfloat16, seed: int = 0):
        # cfg may be a typed UPNConfig, a reference-style `model` dict, or
        # a path to a reference config .py (mmengine Config.fromfile
        # equivalent — inference_wrapper.py:16-26)
        if isinstance(cfg, str):
            cfg = UPNConfig.from_config_file(cfg)
        elif isinstance(cfg, dict):
            cfg = UPNConfig.from_config_dict(cfg)
        # bf16 default: the MSDA gathers stream multi-GB corner patches per
        # image and the gather dtype follows the value dtype — bf16 halves
        # that traffic (2.0s -> see README). The box-coordinate chain inside
        # upn_forward is pinned to fp32 regardless; pass dtype=jnp.float32
        # for full-precision features (the parity tests do, via random_init).
        self.cfg = cfg or UPNConfig()
        self.swin_cfg = swin_cfg or swin_large_config()
        if ckpt_path is not None:
            from vlm_fo1_tpu.upn.convert import load_upn_checkpoint

            self.params = load_upn_checkpoint(ckpt_path, self.cfg,
                                              self.swin_cfg, dtype)
        else:
            self.params = init_upn_params(jax.random.PRNGKey(seed), self.cfg,
                                          self.swin_cfg, dtype)

    @classmethod
    def random_init(cls, cfg=None, swin_cfg=None, seed=0, dtype=jnp.float32):
        return cls(None, cfg, swin_cfg, dtype, seed)

    # ------------------------------------------------------------- host

    def transform_image(self, image_pil: Image.Image,
                        short_side: int = 800, max_size: int = 1333):
        """Shortest-edge resize capped at max_size. Returns raw uint8
        pixels ([H, W, 3], (H, W)) — ImageNet normalization happens on
        DEVICE inside _jit_forward, so the tunneled host->device transfer
        ships 1/4 the bytes of a pre-normalized fp32 image."""
        w, h = image_pil.size
        scale = short_side / min(h, w)
        if max(h, w) * scale > max_size:
            scale = max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = image_pil.resize((nw, nh), Image.Resampling.BILINEAR)
        return np.asarray(img, np.uint8), (nh, nw)

    def _pad_to_bucket(self, arr: np.ndarray):
        h, w, _ = arr.shape
        ph = -(-h // BUCKET) * BUCKET
        pw = -(-w // BUCKET) * BUCKET
        out = np.zeros((ph, pw, 3), arr.dtype)
        out[:h, :w] = arr
        return out

    # ----------------------------------------------------------- device

    def inference(self, image, prompt_type: str = "fine_grained_prompt",
                  batch_size: int = 4):
        """image: path / PIL / list of either. Returns dict with
        original_xyxy_boxes [B, nq, 4] (pixels, score-sorted) and
        scores [B, nq, 1].

        Multi-image calls run same-bucket images as one batched forward
        (up to `batch_size`) and keep every launch async — results are
        pulled only after the last dispatch, so host preprocessing of
        image i+1 overlaps device compute of image i (the reference loops
        images one at a time on a blocking .cpu() pull,
        inference_wrapper.py:136-184)."""
        if not isinstance(image, (list, tuple)):
            image = [image]
        n = len(image)

        # host pass: decode + transform + bucket-pad, grouping by bucket
        metas, groups = [], {}  # padded shape -> [(index, padded, (nh, nw))]
        for i, img in enumerate(image):
            if isinstance(img, str):
                img = Image.open(img).convert("RGB")
            orig_w, orig_h = img.size
            arr, (nh, nw) = self.transform_image(img)
            padded = self._pad_to_bucket(arr)
            metas.append((orig_w, orig_h))
            groups.setdefault(padded.shape, []).append((i, padded, (nh, nw)))

        # device pass: one async dispatch per same-bucket chunk; the
        # postprocess (sigmoid + xyxy scaling + sort) is fused in, so the
        # collect pass pulls two small sorted arrays per chunk
        pending = []  # (indices, device out)
        for shape, items in groups.items():
            for c0 in range(0, len(items), max(batch_size, 1)):
                chunk = items[c0:c0 + max(batch_size, 1)]
                idxs = [it[0] for it in chunk]
                stack = np.stack([it[1] for it in chunk])
                hw = np.array([it[2] for it in chunk], np.int32)
                wh = np.array([metas[i] for i in idxs], np.float32)
                out = _jit_forward(self.params, self.cfg, self.swin_cfg,
                                   jnp.asarray(stack), jnp.asarray(hw),
                                   prompt_type, jnp.asarray(wh))
                pending.append((idxs, out))

        # collect pass: block per chunk only now
        all_boxes = [None] * n
        all_scores = [None] * n
        for idxs, out in pending:
            xy = np.asarray(out["xyxy_sorted"], np.float32)
            sc = np.asarray(out["scores_sorted"], np.float32)
            for row, i in enumerate(idxs):
                all_boxes[i] = xy[row]
                all_scores[i] = sc[row]
        return {"original_xyxy_boxes": np.stack(all_boxes),
                "scores": np.stack(all_scores)}

    # ------------------------------------------------------------- post

    def filter(self, result: dict, min_score: float, nms_value: float = 0.8):
        """Score threshold + NMS + int cast, score-sorted
        (reference inference_wrapper.py:186-237)."""
        filtered = {"original_xyxy_boxes": [], "scores": []}
        for boxes, scores in zip(np.asarray(result["original_xyxy_boxes"]),
                                 np.asarray(result["scores"])):
            keep = scores[:, 0] >= min_score
            boxes = boxes[keep]
            scores = scores[keep][:, 0]
            if len(boxes) == 0:
                # Deliberate fix of a reference bug: inference_wrapper.py
                # :209-210 `return`s here mid-loop, silently dropping every
                # REMAINING image's results when one image has no boxes
                # above threshold. We emit empty lists for this image and
                # keep going, so output row i always corresponds to input
                # image i.
                filtered["original_xyxy_boxes"].append([])
                filtered["scores"].append([])
                continue
            if nms_value > 0:
                keep_idx = nms_numpy(boxes, scores, nms_value)
            else:
                keep_idx = np.arange(len(boxes))
            boxes = boxes[keep_idx].astype(np.int32)
            scores = scores[keep_idx]
            order = np.argsort(-scores, kind="stable")
            filtered["original_xyxy_boxes"].append(boxes[order].tolist())
            filtered["scores"].append([round(float(s), 2)
                                       for s in scores[order]])
        return filtered
