"""vlm_fo1_tpu — a TPU-native (JAX/XLA/Pallas) grounded-perception inference stack.

Re-implements the full capability surface of VLM-FO1 (reference:
/root/reference, om-ai-lab/VLM-FO1) with a TPU-first architecture:

- Qwen2.5-VL vision transformer with fixed-shape windowed attention
  (reference: vlm_fo1/model/multimodal_encoder/qwen2_5_vl/modeling_qwen2_5_vl.py)
- DaViT auxiliary perception encoder
  (reference: vlm_fo1/model/multimodal_encoder/davit/modeling_davit.py)
- HFRE hybrid fine-grained region encoder with Pallas ROIAlign
  (reference: vlm_fo1/model/multimodal_visual_prompt_encoder/hybrid_finegrained_region_encoder.py)
- Qwen2.5 LLM with M-RoPE, GQA and a static KV cache decode loop
- UPN universal proposal network with a deformable-attention kernel
  (reference: detect_tools/upn/)

The compute path is pure JAX (jit/pjit/Pallas); host-side preprocessing is
numpy/PIL; parallelism is expressed with jax.sharding over a device Mesh.
"""

__version__ = "0.1.0"

from vlm_fo1_tpu import constants, task_templates  # noqa: F401
