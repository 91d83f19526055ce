"""Host-side image preprocessing (pure numpy/PIL — no torch).

Mirrors the behavioural contract of the reference pipeline:
- load_image / base64 / URL handling  (reference mm_utils.py:183-213)
- deterministic shortest-edge resize capped at a max long side, with
  proportional bbox rescale             (reference mm_utils.py:371-462)
- Qwen2-VL smart-resize + patchify      (HF Qwen2VLImageProcessor semantics)
- DaViT aux squash-resize + ImageNet normalisation
  (reference davit/configs.py:139-152, image_processing_clip.py)
- bbox clamp + rescale into the aux processor's pixel space
  (reference mm_utils.py:281-312)
"""

from __future__ import annotations

import base64
import io
import math
from io import BytesIO

import numpy as np
from PIL import Image

# OpenAI-CLIP statistics used by the Qwen2-VL image processor.
QWEN_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
QWEN_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
# ImageNet statistics used by the DaViT aux processor.
AUX_IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
AUX_IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(image_file) -> Image.Image:
    """Load from PIL image, URL, data-URI base64 or local path; RGB, >=28px."""
    if isinstance(image_file, Image.Image):
        image = image_file.convert("RGB")
    elif image_file.startswith(("http://", "https://")):
        import requests

        # Timeout so a dead URL can't hang a serving prepare worker.
        response = requests.get(image_file, timeout=30)
        image = Image.open(BytesIO(response.content)).convert("RGB")
    elif image_file.startswith("data:image/"):
        payload = image_file.split("base64,", 1)[-1]
        image = Image.open(BytesIO(base64.b64decode(payload))).convert("RGB")
    else:
        image = Image.open(image_file).convert("RGB")

    if image.width < 28 or image.height < 28:
        image = image.resize((max(28, image.width), max(28, image.height)))
    return image


def image_to_base64(img_pil: Image.Image) -> str:
    with io.BytesIO() as buffer:
        img_pil.save(buffer, format="JPEG")
        return base64.b64encode(buffer.getvalue()).decode("utf-8")


def resize_shortest_edge_images_and_bboxes(
    images: list[Image.Image],
    bbox_lists,
    candidate_sizes: list[int] | None = None,
    max_size: int = 2048,
):
    """Deterministic inference-time resize: keep scale 1.0 unless the long
    side exceeds `max_size`, then shrink proportionally; floor at 28px.
    Bboxes (xyxy pixel coords) are rescaled with the image.

    Accepts either one bbox list (single image) or a list of per-image lists,
    mirroring the reference's shape normalisation (mm_utils.py:396-399).
    """
    if bbox_lists is None:
        bbox_lists = [[] for _ in images]
    single = (bool(bbox_lists) and len(bbox_lists[0]) > 0
              and np.asarray(bbox_lists[0]).ndim == 1)
    if single:
        bbox_lists = [bbox_lists]
    if len(bbox_lists) == 1 and len(bbox_lists[0]) == 0 and len(images) > 1:
        bbox_lists = [[] for _ in images]
    if len(images) != len(bbox_lists):
        raise ValueError("images and bbox lists must have the same length")

    resized_images, out_bboxes = [], []
    for img, bboxes in zip(images, bbox_lists):
        ow, oh = img.size
        scale = 1.0
        if candidate_sizes:
            scale = candidate_sizes[0] / min(ow, oh)
        nh, nw = int(oh * scale), int(ow * scale)
        if max(nh, nw) > max_size:
            s2 = max_size / max(nh, nw)
            nh, nw = int(nh * s2), int(nw * s2)
        nw, nh = max(28, nw), max(28, nh)
        if (nw, nh) != (ow, oh):
            img = img.resize((nw, nh), Image.Resampling.BICUBIC)
        resized_images.append(img)
        sx, sy = nw / ow, nh / oh
        out_bboxes.append(
            [[x1 * sx, y1 * sy, x2 * sx, y2 * sy] for x1, y1, x2, y2 in bboxes])

    if single:
        return resized_images, out_bboxes[0]
    return resized_images, out_bboxes


def adjust_bbox(bbox_list, original_h, original_w, resize_h, resize_w):
    """Clamp boxes to the image then rescale into (resize_h, resize_w) space
    (reference mm_utils.py:281-312)."""
    out = []
    for x1, y1, x2, y2 in bbox_list:
        x1 = min(max(x1, 0), original_w)
        x2 = min(max(x2, 0), original_w)
        y1 = min(max(y1, 0), original_h)
        y2 = min(max(y2, 0), original_h)
        out.append([
            x1 * resize_w / original_w, y1 * resize_h / original_h,
            x2 * resize_w / original_w, y2 * resize_h / original_h,
        ])
    return out


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 2048 * 2048):
    """Qwen2-VL resize rule: dims divisible by `factor`, pixel count within
    [min_pixels, max_pixels], aspect ratio approximately preserved."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def _normalize(arr_hwc: np.ndarray, mean, std) -> np.ndarray:
    return (arr_hwc.astype(np.float32) / 255.0 - mean) / std


def qwen_image_preprocess(
    image: Image.Image,
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 56 * 56,
    max_pixels: int = 2048 * 2048,
    round_factor: int | None = None,
):
    """Smart-resize + patchify to Qwen2-VL `pixel_values`.

    Returns:
        pixel_values: [grid_h*grid_w, C*temporal*patch*patch] float32, rows
            ordered (h_block, w_block, merge_h, merge_w) — one row per patch.
        grid_thw: (1, grid_h, grid_w)
    """
    factor = patch_size * merge_size
    if round_factor:
        # geometry ladder for mixed-size serving: snapping dims to a
        # coarser multiple collapses nearby image sizes onto a small set
        # of grids so fused batches can form across them (slightly more
        # aspect distortion than the reference's 28px rounding)
        assert round_factor % factor == 0, (round_factor, factor)
        factor = round_factor
    h_bar, w_bar = smart_resize(
        image.height, image.width, factor=factor,
        min_pixels=min_pixels, max_pixels=max_pixels)
    img = image.resize((w_bar, h_bar), Image.Resampling.BICUBIC)
    raw = np.asarray(img, np.uint8)

    # fused native normalize+patchify (single pass); numpy fallback below
    from vlm_fo1_tpu.native import qwen_patchify_native

    native = qwen_patchify_native(raw, patch_size, merge_size,
                                  temporal_patch_size, QWEN_IMAGE_MEAN,
                                  QWEN_IMAGE_STD)
    if native is not None:
        return native, (1, h_bar // patch_size, w_bar // patch_size)

    arr = _normalize(raw, QWEN_IMAGE_MEAN, QWEN_IMAGE_STD)
    chw = arr.transpose(2, 0, 1)  # [C, H, W]

    # a still image is repeated to fill the temporal patch
    frames = np.broadcast_to(chw, (temporal_patch_size, *chw.shape))
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    c = chw.shape[0]
    patches = frames.reshape(
        1, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    pixel_values = np.ascontiguousarray(patches).reshape(
        grid_h * grid_w, c * temporal_patch_size * patch_size * patch_size)
    return pixel_values, (1, grid_h, grid_w)


def qwen_video_preprocess(
    frames: list[Image.Image],
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 56 * 56,
    max_pixels: int = 1024 * 1024,
):
    """Qwen2-VL video patchify: all frames share one smart-resize geometry;
    consecutive `temporal_patch_size` frames form one temporal patch.

    Returns (pixel_values [gt*gh*gw, C*T*ph*pw] float32, (gt, gh, gw)).
    """
    if len(frames) % temporal_patch_size:
        frames = frames + [frames[-1]] * (
            temporal_patch_size - len(frames) % temporal_patch_size)
    h_bar, w_bar = smart_resize(
        frames[0].height, frames[0].width, factor=patch_size * merge_size,
        min_pixels=min_pixels, max_pixels=max_pixels)
    arr = np.stack([
        _normalize(np.asarray(f.resize((w_bar, h_bar),
                                       Image.Resampling.BICUBIC), np.uint8),
                   QWEN_IMAGE_MEAN, QWEN_IMAGE_STD).transpose(2, 0, 1)
        for f in frames
    ])  # [T_total, C, H, W]
    grid_t = len(frames) // temporal_patch_size
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    c = arr.shape[1]
    patches = arr.reshape(
        grid_t, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    pixel_values = np.ascontiguousarray(patches).reshape(
        grid_t * grid_h * grid_w,
        c * temporal_patch_size * patch_size * patch_size)
    return pixel_values, (grid_t, grid_h, grid_w)


def aux_image_preprocess(image: Image.Image, image_size: int = 768) -> np.ndarray:
    """DaViT aux branch: squash-resize to a fixed square, ImageNet
    normalisation. Returns [C, H, W] float32."""
    img = image.resize((image_size, image_size), Image.Resampling.BICUBIC)
    raw = np.asarray(img, np.uint8)

    from vlm_fo1_tpu.native import normalize_chw_native

    native = normalize_chw_native(raw, AUX_IMAGE_MEAN, AUX_IMAGE_STD)
    if native is not None:
        return native

    arr = _normalize(raw, AUX_IMAGE_MEAN, AUX_IMAGE_STD)
    return arr.transpose(2, 0, 1)


# ------------------------------------------------------------------ uint8
# Device-side normalization path: ship raw uint8 over the (slow) host->TPU
# link — half the bytes of bf16, a quarter of fp32 — and fold the
# /255-mean-std affine into the first on-device op, where XLA fuses it into
# the patch-embed matmul. Numerics are identical to the host path (the
# normalize still happens in fp32 before any bf16 cast).

def qwen_patch_norm_vectors(patch_size: int = 14, temporal_patch_size: int = 2):
    """Per-position mean/std over the flattened patch row layout
    [c, t, ph, pw] (channel-major), for normalizing uint8 pixel_values on
    device."""
    reps = temporal_patch_size * patch_size * patch_size
    return (np.repeat(QWEN_IMAGE_MEAN, reps),
            np.repeat(QWEN_IMAGE_STD, reps))


def qwen_image_patchify_u8(
    image: Image.Image,
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 56 * 56,
    max_pixels: int = 2048 * 2048,
    round_factor: int | None = None,
):
    """qwen_image_preprocess without the normalize: returns uint8
    pixel_values [grid_h*grid_w, C*T*p*p] in the same row layout, plus
    grid_thw. Normalize on device with qwen_patch_norm_vectors."""
    factor = patch_size * merge_size
    if round_factor:
        # geometry ladder for mixed-size serving: snapping dims to a
        # coarser multiple collapses nearby image sizes onto a small set
        # of grids so fused batches can form across them (slightly more
        # aspect distortion than the reference's 28px rounding)
        assert round_factor % factor == 0, (round_factor, factor)
        factor = round_factor
    h_bar, w_bar = smart_resize(
        image.height, image.width, factor=factor,
        min_pixels=min_pixels, max_pixels=max_pixels)
    img = image.resize((w_bar, h_bar), Image.Resampling.BICUBIC)
    raw = np.asarray(img, np.uint8)

    from vlm_fo1_tpu.native import qwen_patchify_raw_native

    native = qwen_patchify_raw_native(raw, patch_size, merge_size,
                                      temporal_patch_size)
    if native is not None:
        return native, (1, h_bar // patch_size, w_bar // patch_size)

    chw = raw.transpose(2, 0, 1)
    frames = np.broadcast_to(chw, (temporal_patch_size, *chw.shape))
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    c = chw.shape[0]
    patches = frames.reshape(
        1, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    ).transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    pixel_values = np.ascontiguousarray(patches).reshape(
        grid_h * grid_w, c * temporal_patch_size * patch_size * patch_size)
    return pixel_values, (1, grid_h, grid_w)


def qwen_image_raw_u8(
    image: Image.Image,
    patch_size: int = 14,
    merge_size: int = 2,
    min_pixels: int = 56 * 56,
    max_pixels: int = 2048 * 2048,
    round_factor: int | None = None,
):
    """Smart-resize ONLY: returns (raw uint8 [h_bar, w_bar, C], grid_thw).

    The minimal-bytes host->device representation: the patchify relayout,
    temporal duplication, window padding AND the /255-mean-std affine all
    run on device (models/fo1.py _device_preproc_batched). ~5x fewer bytes
    than uint8 pixel_values + a separate 768^2 aux image on the tunneled
    link (patch rows duplicate each pixel temporal_patch_size times)."""
    factor = patch_size * merge_size
    if round_factor:
        # geometry ladder for mixed-size serving: snapping dims to a
        # coarser multiple collapses nearby image sizes onto a small set
        # of grids so fused batches can form across them (slightly more
        # aspect distortion than the reference's 28px rounding)
        assert round_factor % factor == 0, (round_factor, factor)
        factor = round_factor
    h_bar, w_bar = smart_resize(
        image.height, image.width, factor=factor,
        min_pixels=min_pixels, max_pixels=max_pixels)
    img = image.resize((w_bar, h_bar), Image.Resampling.BICUBIC)
    raw = np.asarray(img, np.uint8)
    return raw, (1, h_bar // patch_size, w_bar // patch_size)


def patchify_raw_np(raw: np.ndarray, patch_size: int = 14,
                    merge_size: int = 2, temporal_patch_size: int = 2):
    """uint8 [H, W, C] -> uint8 pixel_values [gh*gw, C*T*p*p] (the host
    fallback for a raw-mode prep that must go through the non-fused path).
    Identical layout to qwen_image_patchify_u8."""
    h_bar, w_bar, c = raw.shape
    chw = raw.transpose(2, 0, 1)
    frames = np.broadcast_to(chw, (temporal_patch_size, *chw.shape))
    grid_h, grid_w = h_bar // patch_size, w_bar // patch_size
    patches = frames.reshape(
        1, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    ).transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return np.ascontiguousarray(patches).reshape(
        grid_h * grid_w, c * temporal_patch_size * patch_size * patch_size)


def aux_image_u8(image: Image.Image, image_size: int = 768) -> np.ndarray:
    """aux_image_preprocess without the normalize: uint8 [H, W, C]
    channel-last (normalize on device with AUX_IMAGE_MEAN/STD)."""
    img = image.resize((image_size, image_size), Image.Resampling.BICUBIC)
    return np.asarray(img, np.uint8)
