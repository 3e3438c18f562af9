"""Golden backbone parity: JAX Swin-T / ViTAEv2-S vs the ACTUAL reference.

The reference backbones (swin_transformer.py:491-693, vitae_v2.py:98-255) run
verbatim on CPU (timm/d2-Backbone facades) with seeded random weights; our
flax backbones must reproduce the stage3/4/5 feature maps after the
production weight conversion. The dump is regenerated per run (full-size
backbones are too large to commit as goldens) and requires /root/reference.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tools"))
sys.path.insert(0, os.path.join(HERE, "golden"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/third_party/adet/modeling/swin"),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    import make_golden_backbones

    path = str(tmp_path_factory.mktemp("bb") / "backbones.npz")
    make_golden_backbones.main(path)
    return np.load(path)


def _convert(golden, prefix, backbone_name):
    from convert_torch_weights import convert

    from gomatching_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = backbone_name
    sd = {k[len(prefix) :]: golden[k] for k in golden.files if k.startswith(prefix)}
    tree, missing, unused = convert(sd, cfg)
    bb_missing = [k for k in missing if k.startswith("backbone.")]
    assert not bb_missing, bb_missing[:5]
    # recomputed/inert buffers are legitimately unloaded: attention masks,
    # relative-position index tables, BN bookkeeping counters
    for k in unused:
        assert ("attn_mask" in k or "relative_position_index" in k or "rcpe" in k
                or "pos_embed" in k or "num_batches_tracked" in k), k
    return {"params": tree["params"]["backbone"]}


def test_swin_matches_reference(golden):
    from gomatching_tpu.models.swin import SwinTransformer

    params = _convert(golden, "swin.sd.", "build_swin_backbone")
    x = jnp.asarray(golden["swin.in"].transpose(0, 2, 3, 1))
    outs = SwinTransformer().apply(params, x)
    for stage, res in (("stage3", "res3"), ("stage4", "res4"), ("stage5", "res5")):
        want = golden[f"swin.out.{stage}"]
        got = np.asarray(outs[res]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4, err_msg=stage)


def test_vitae_matches_reference(golden):
    from gomatching_tpu.models.vitae import ViTAEv2

    params = _convert(golden, "vitae.sd.", "build_vitaev2_backbone")
    x = jnp.asarray(golden["vitae.in"].transpose(0, 2, 3, 1))
    outs = ViTAEv2().apply(params, x)
    for stage, res in (("stage3", "res3"), ("stage4", "res4"), ("stage5", "res5")):
        want = golden[f"vitae.out.{stage}"]
        got = np.asarray(outs[res]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4, err_msg=stage)
