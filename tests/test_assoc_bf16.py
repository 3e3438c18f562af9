"""TPU.ASSOC_PRECISION=bfloat16: matcher-only bf16 association.

The association pass is compute-bound (d=1024 matmuls dominate the measured
short/long_match wall), so the production configuration runs the matcher
transformers + affinity heads in bf16. Contract:

  - only the matcher subtrees are cast (reid/rescore feed the spot program
    and stay f32, gomatching.py:220);
  - affinity logits come back f32 with bf16-eps drift vs the f32 matcher;
  - the default ('' = follow MODEL.PRECISION) keeps f32 for every CPU/golden
    configuration, so reference parity tests are untouched.
"""

import numpy as np
import pytest

from tests.test_inference_e2e import TINY_OPTS


def _build(opts):
    from gomatching_tpu.config import setup_eval_cfg
    from gomatching_tpu.engine.predictor import VideoPredictor

    cfg = setup_eval_cfg("configs/GoMatching_ICDAR15.yaml", list(TINY_OPTS) + opts)
    return VideoPredictor(cfg)


@pytest.fixture(scope="module")
def pair():
    f32 = _build(["TPU.ASSOC_INDEXED", "False"])
    bf16 = _build(["TPU.ASSOC_INDEXED", "False",
                   "TPU.ASSOC_PRECISION", "bfloat16"])
    return f32, bf16


def test_only_matcher_subtrees_cast(pair):
    import jax
    import jax.numpy as jnp

    f32, bf16 = pair
    assert bf16.assoc_bf16 and not f32.assoc_bf16
    t = bf16._assoc_params["params"]["roi_heads"]
    for k in ("long_term_matcher", "short_term_matcher",
              "asso_predictor", "local_asso_predictor"):
        if k in t:
            assert all(
                leaf.dtype == jnp.bfloat16 for leaf in jax.tree.leaves(t[k])
            ), k
    # reid/rescore stay f32
    for k in ("asso_head", "rescoring_head"):
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(t[k])
        ), k
    # the spot params are untouched (shared leaves)
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(bf16.params["params"]["roi_heads"])
    )


def test_affinity_logits_bf16_drift_bound(pair):
    f32, bf16 = pair
    rng = np.random.RandomState(0)
    F = f32.cfg.MODEL.ASSO_HEAD.FC_DIM
    toks = rng.randn(2, 16, F).astype(np.float32)
    valid = np.zeros((2, 16), bool)
    valid[:, :11] = True
    for short in (True, False):
        a = np.asarray(f32.tracker.associate_fn(toks, valid, short))
        b = np.asarray(bf16.tracker.associate_fn(toks, valid, short))
        assert b.dtype == np.float32
        tol = 0.05 * (1.0 + np.abs(a).max())
        assert np.abs(a - b).max() <= tol, (short, np.abs(a - b).max(), tol)


def test_e2e_runs_with_bf16_assoc(pair):
    """The full pipeline (incl. the tracker's batched precompute paths) runs
    under bf16 association and yields plausibly-consistent tracks."""
    _, bf16 = pair
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)] * 6
    tracked = bf16.process_video(frames)
    assert len(tracked) == 6
    for det in tracked:
        assert len(np.unique(det.track_ids)) == len(det.track_ids)


def test_indexed_mode_bf16(pair):
    """ASSOC_INDEXED (production default) + bf16: pool rows gather then cast."""
    bf16 = _build(["TPU.ASSOC_PRECISION", "bfloat16"])
    assert bf16.assoc_bf16 and bf16.assoc_indexed
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)] * 4
    tracked = bf16.process_video(frames)
    assert len(tracked) == 4
