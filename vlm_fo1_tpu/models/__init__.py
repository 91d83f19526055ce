from vlm_fo1_tpu.models.builder import (  # noqa: F401
    build_vision_tower,
    build_vision_tower_aux,
)
