"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (set before jax is imported)."""

import os

# force-override: the shell presets JAX_PLATFORMS=axon (TPU); tests must run
# on CPU with virtual devices unless explicitly opted out
if os.environ.get("VLM_FO1_TEST_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The harness force-registers the axon TPU platform in-process, ignoring
# JAX_PLATFORMS; override it here so tests run on the 8 virtual CPU devices.
if os.environ.get("VLM_FO1_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
# full-precision fp32 matmuls for parity tests
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache_rss():
    """Release jit/compile caches after each test module: the full suite
    (210+ tests incl. torch-oracle modules and Swin-L/DaViT XLA compiles)
    otherwise accumulates enough XLA:CPU executables on the 1-CPU box to
    segfault the compiler around test ~170 (observed r4, deterministic)."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class StubTokenizer:
    """Character-level tokenizer for splice/protocol tests. Ids are ords
    (positive, < 0x110000) so they never collide with sentinel ids. Like the
    real Qwen tokenizer, ChatML special tokens map to single ids."""

    bos_token_id = None
    pad_token_id = 0
    SPECIALS = {"<|im_start|>": 151644, "<|im_end|>": 151645,
                "<|vision_start|>": 151652, "<|vision_end|>": 151653,
                "<|image_pad|>": 151655}

    def encode(self, text):
        import re

        pattern = "(" + "|".join(re.escape(s) for s in self.SPECIALS) + ")"
        ids = []
        for part in re.split(pattern, text):
            if part in self.SPECIALS:
                ids.append(self.SPECIALS[part])
            else:
                ids.extend(ord(c) for c in part)
        return ids

    def __call__(self, text):
        class _Out:
            def __init__(self, ids):
                self.input_ids = ids

        return _Out(self.encode(text))

    def decode(self, ids, **kw):
        return "".join(chr(i) for i in ids if 0 < i < 0x110000)


@pytest.fixture
def stub_tokenizer():
    return StubTokenizer()
