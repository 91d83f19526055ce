"""Full pipeline: UPN proposals -> FO1 grounded reasoning
(reference scripts/inference_with_upn.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from vlm_fo1_tpu.api import load_pretrained_model, prepare_inputs
from vlm_fo1_tpu.postprocess import (
    draw_bboxes_and_save,
    extract_predictions_to_bboxes,
)
from vlm_fo1_tpu.task_templates import OD_template
from vlm_fo1_tpu.upn import UPNWrapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--random-init", choices=["tiny", "3b"], default=None,
                    help="run with random weights (no checkpoint needed)")
    ap.add_argument("--upn-ckpt", default=None)
    ap.add_argument("--image", default="/root/reference/demo/demo_image.jpg")
    ap.add_argument("--target", default="orange")
    ap.add_argument("--min-score", type=float, default=0.3)
    ap.add_argument("--max-boxes", type=int, default=100)
    ap.add_argument("--output", default="vlm_fo1_upn_result.jpg")
    args = ap.parse_args()

    upn = UPNWrapper(args.upn_ckpt)
    raw = upn.inference(args.image, prompt_type="fine_grained_prompt")
    det = upn.filter(raw, min_score=args.min_score, nms_value=0.8)
    bbox_list = [[float(v) for v in b]
                 for b in (det["original_xyxy_boxes"][0]
                           if det["original_xyxy_boxes"] else [])]
    bbox_list = bbox_list[:args.max_boxes]
    print(f"UPN proposals: {len(bbox_list)}")

    messages = [{
        "role": "user",
        "content": [
            {"type": "image_url", "image_url": {"url": args.image}},
            {"type": "text", "text": OD_template.format(args.target)},
        ],
        "bbox_list": bbox_list,
    }]
    if args.random_init:
        from vlm_fo1_tpu.config import FO1Config
        from vlm_fo1_tpu.models.fo1 import FO1Model
        from vlm_fo1_tpu.runtime.fallback_tokenizer import FallbackTokenizer

        cfg = (FO1Config.tiny() if args.random_init == "tiny"
               else FO1Config())
        fo1 = FO1Model.random_init(cfg, seed=0,
                                   tokenizer=FallbackTokenizer())
        outputs = fo1.generate(messages, max_new_tokens=64,
                               max_pixels=256 * 256).text.strip()
    else:
        if not args.model_path:
            ap.error("--model-path or --random-init required")
        tokenizer, model, image_processors = load_pretrained_model(
            args.model_path)
        kwargs = prepare_inputs(args.model_path, model, image_processors,
                                tokenizer, messages, max_tokens=4096,
                                top_p=0.05, temperature=0.0)
        output_ids = model.generate(**kwargs)
        outputs = tokenizer.decode(
            output_ids[0, kwargs["inputs"].shape[1]:]).strip()
    print("model output:", outputs)

    bboxes = extract_predictions_to_bboxes(outputs, bbox_list)
    img = Image.open(args.image).convert("RGB")
    draw_bboxes_and_save(image=img, fo1_bboxes=bboxes,
                         detection_bboxes=bbox_list, output_path=args.output)
    print("saved:", args.output)


if __name__ == "__main__":
    main()
