#!/usr/bin/env python
"""One-shot dump: reference Swin-T and ViTAEv2-S backbones on CPU.

Runs the actual reference backbones (third_party/adet/modeling/swin/
swin_transformer.py:491-693, vitae_v2/vitae_v2.py:98-255) with random weights
on a random image and commits state_dicts (decoupled-checkpoint key layout) +
input + stage3/4/5 feature maps. The JAX backbones must reproduce the outputs
after the production weight conversion.

Usage: python tests/golden/make_golden_backbones.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.getcwd())

from ref_loader import load_reference_backbones  # noqa: E402

SWIN_MOD, VITAE_MOD = load_reference_backbones()

import torch  # noqa: E402

H, W = 64, 96


def dump_swin(out):
    torch.manual_seed(0)
    model = SWIN_MOD.SwinTransformer(
        in_chans=3,
        embed_dim=96,
        depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24),
        window_size=7,
        drop_path_rate=0.2,  # inert in eval
        ape=False,
        patch_norm=True,
        frozen_stages=-1,
        out_features=["stage3", "stage4", "stage5"],
    )
    model.eval()
    rng = np.random.RandomState(1)
    x = torch.from_numpy(rng.randn(1, 3, H, W).astype(np.float32))
    with torch.no_grad():
        outs = model(x)
    out["swin.in"] = x.numpy()
    for k, v in outs.items():
        out[f"swin.out.{k}"] = v.numpy()
    for k, v in model.state_dict().items():
        out[f"swin.sd.backbone.0.backbone.{k}"] = v.numpy()


def dump_vitae(out):
    torch.manual_seed(0)
    model = VITAE_MOD.ViTAEv2(
        in_chans=3,
        RC_tokens_type=["window", "window", "transformer", "transformer"],
        NC_tokens_type=["window", "window", "transformer", "transformer"],
        embed_dims=[64, 64, 128, 256],
        token_dims=[64, 128, 256, 512],
        downsample_ratios=[4, 2, 2, 2],
        NC_depth=[2, 2, 8, 2],
        NC_heads=[1, 2, 4, 8],
        RC_heads=[1, 1, 2, 4],
        mlp_ratio=4.0,
        NC_group=[1, 32, 64, 128],
        RC_group=[1, 16, 32, 64],
        use_checkpoint=False,
        drop_rate=0.0,
        attn_drop_rate=0.0,
        window_size=7,
        drop_path_rate=0.0,
    )
    model.eval()
    rng = np.random.RandomState(2)
    x = torch.from_numpy(rng.randn(1, 3, H, W).astype(np.float32))
    with torch.no_grad():
        outs = model(x)
    out["vitae.in"] = x.numpy()
    for k, v in outs.items():
        out[f"vitae.out.{k}"] = v.numpy()
    for k, v in model.state_dict().items():
        out[f"vitae.sd.backbone.0.backbone.{k}"] = v.numpy()


def main(path=None):
    """Unlike the other goldens this npz is NOT committed (full-size Swin-T +
    ViTAEv2-S weigh ~170 MB); the test regenerates it (seeded, deterministic)
    when /root/reference is present."""
    out = {}
    dump_swin(out)
    dump_vitae(out)
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                            "backbones_tiny.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB, {len(out)} arrays)")
    return path


if __name__ == "__main__":
    main()
