from vlm_fo1_tpu.preprocess.image import (  # noqa: F401
    load_image,
    image_to_base64,
    smart_resize,
    resize_shortest_edge_images_and_bboxes,
    adjust_bbox,
    qwen_image_preprocess,
    qwen_video_preprocess,
    aux_image_preprocess,
)
from vlm_fo1_tpu.preprocess.windowing import ViTPlan, build_vit_plan  # noqa: F401
from vlm_fo1_tpu.preprocess.mrope import get_rope_index  # noqa: F401
