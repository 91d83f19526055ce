"""Reference-compatible top-level API.

Mirrors the entry surface a VLM-FO1 user knows (reference
vlm_fo1/model/builder.py:8 `load_pretrained_model`, vlm_fo1/mm_utils.py:530
`prepare_inputs`) on top of the TPU-native stack, so scripts written against
the reference port by changing only imports:

    from vlm_fo1_tpu.api import load_pretrained_model, prepare_inputs
    tokenizer, model, image_processors = load_pretrained_model(path)
    kwargs = prepare_inputs(path, model, image_processors, tokenizer, messages)
    output_ids = model.generate(**kwargs)

model.generate here accepts the prepared kwargs and returns a numpy array of
[1, prompt+generated] ids like HF generate.
"""

from __future__ import annotations

import numpy as np

from vlm_fo1_tpu.models.fo1 import FO1Model


class _ProcessorShim:
    """Minimal processor objects exposed for API parity; the real work is in
    vlm_fo1_tpu.preprocess (functional)."""

    def __init__(self, kind: str, model: FO1Model):
        self.kind = kind
        self.model = model

    def preprocess(self, image, **kw):
        from vlm_fo1_tpu import preprocess as pp

        if self.kind == "primary":
            pv, grid = pp.qwen_image_preprocess(
                image, patch_size=self.model.cfg.vision.patch_size,
                merge_size=self.model.cfg.vision.spatial_merge_size,
                min_pixels=self.model.cfg.min_pixels,
                max_pixels=self.model.cfg.max_pixels)
            return {"pixel_values": pv, "image_grid_thw": np.asarray([grid])}
        arr = pp.aux_image_preprocess(image, self.model.cfg.aux_image_size)
        return {"pixel_values": arr[None]}


class GenerateFacade:
    """Wraps FO1Model with an HF-generate-shaped call."""

    def __init__(self, model: FO1Model):
        self._model = model
        self.config = model.cfg

    def __getattr__(self, name):
        return getattr(self._model, name)

    def generate(self, messages=None, max_new_tokens=512, temperature=0.0,
                 top_p=1.0, do_sample=False, input_tokens=None, **kw):
        if not do_sample:
            temperature = 0.0
        result = self._model.generate(
            messages, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p)
        prompt = np.asarray(input_tokens if input_tokens is not None else [],
                            np.int64)
        out = np.concatenate([prompt, result.token_ids,
                              [self._model.cfg.eos_token_id]])
        return out[None]


def load_pretrained_model(model_path: str, load_8bit: bool = False,
                          load_4bit: bool = False, device: str | None = None,
                          w8a8: bool = False):
    """Returns (tokenizer, model, (primary_processor, aux_processor)).

    load_8bit / load_4bit apply weight-only int8 / packed-int4 quantization
    to the LLM trunk (vlm_fo1_tpu.quant — TPU-native counterparts of the
    reference's bitsandbytes paths, model/builder.py:25-36). w8a8=True
    (with load_8bit) additionally quantizes activations per token at
    runtime — int8 x int8 dots on the MXU's double-rate int8 path, the
    closer analog of bitsandbytes LLM.int8's dynamic GEMMs.
    """
    if w8a8 and (load_4bit or not load_8bit):
        raise ValueError(
            "w8a8=True requires load_8bit=True (activation quant rides the "
            "int8 weight path); got load_8bit=%s load_4bit=%s"
            % (load_8bit, load_4bit))
    model = FO1Model.from_pretrained(model_path)
    if load_4bit:
        from vlm_fo1_tpu.quant import quantize_params_int4

        model.params = quantize_params_int4(model.params)
    elif load_8bit:
        from vlm_fo1_tpu.quant import mark_w8a8, quantize_params

        model.params = quantize_params(model.params)
        if w8a8:
            model.params = mark_w8a8(model.params)
    facade = GenerateFacade(model)
    processors = (_ProcessorShim("primary", model), _ProcessorShim("aux", model))
    return model.tokenizer, facade, processors


def prepare_inputs(model_name, model, image_processors, tokenizer, messages,
                   device=None, max_tokens=512, top_p=1.0, temperature=0.0,
                   do_sample=False):
    """Reference-shaped kwargs builder (mm_utils.py:530). The heavy device
    preparation happens inside model.generate; this returns the plumbing the
    calling convention expects, including the prompt ids under 'inputs'."""
    from vlm_fo1_tpu.preprocess.tokens import build_chat_tokens

    real = model._model if isinstance(model, GenerateFacade) else model
    if real.tokenizer is None:
        real.tokenizer = tokenizer
    _, tokens, _, _ = build_chat_tokens(tokenizer, messages)
    prompt_ids = np.asarray([tokens])

    return {
        "messages": messages,
        "input_tokens": tokens,
        "inputs": prompt_ids,
        "max_new_tokens": max_tokens,
        "temperature": temperature,
        "top_p": top_p,
        "do_sample": do_sample and temperature > 0.0,
    }
