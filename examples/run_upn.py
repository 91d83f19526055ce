"""UPN-only proposal visualization (reference scripts/run_upn.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from vlm_fo1_tpu.postprocess import draw_bboxes_and_save
from vlm_fo1_tpu.upn import UPNWrapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="UPN .pth checkpoint")
    ap.add_argument("--image", default="/root/reference/demo/demo_image.jpg")
    ap.add_argument("--prompt", default="fine_grained_prompt",
                    choices=["fine_grained_prompt", "coarse_grained_prompt"])
    ap.add_argument("--min-score", type=float, default=0.3)
    ap.add_argument("--output", default="upn_detection_result.jpg")
    args = ap.parse_args()

    upn = UPNWrapper(args.ckpt)
    raw = upn.inference(args.image, prompt_type=args.prompt)
    det = upn.filter(raw, min_score=args.min_score, nms_value=0.8)
    boxes = det["original_xyxy_boxes"][0] if det["original_xyxy_boxes"] else []
    print(f"{len(boxes)} proposals above {args.min_score}")
    img = Image.open(args.image).convert("RGB")
    draw_bboxes_and_save(image=img, detection_bboxes=boxes,
                         output_path=args.output)
    print("saved:", args.output)


if __name__ == "__main__":
    main()
