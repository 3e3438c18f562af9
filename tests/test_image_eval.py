"""Image spotting evaluator: e2e word matching + lexicon correction."""

import numpy as np


def _sq(x, y, s=10):
    return np.asarray([x, y, x + s, y, x + s, y + s, x, y + s], np.float64)


def test_e2e_requires_transcription_match():
    from gomatching_tpu.evaluation.image_eval import evaluate_image_spotting

    per_image = [
        # right box right word; right box wrong word
        ([_sq(0, 0), _sq(30, 0)], ["hello", "world"],
         [_sq(0, 0), _sq(30, 0)], ["hello", "wrold"]),
    ]
    m = evaluate_image_spotting(per_image)
    assert m["det_hmean"] == 1.0
    assert abs(m["e2e_recall"] - 0.5) < 1e-9


def test_lexicon_correction_rescues_near_miss():
    from gomatching_tpu.evaluation.image_eval import evaluate_image_spotting, lexicon_correct

    # reference acceptance: plain UPPERCASED edit distance < 1.5
    # (find_match_word + match_dist check, text_evaluation_all.py:249-264,331)
    assert lexicon_correct("worl", ["world", "hello"]) == "world"  # d=1
    assert lexicon_correct("wrold", ["world", "hello"]) == "wrold"  # d=2: kept
    assert lexicon_correct("zzzzz", ["world", "hello"]) == "zzzzz"  # too far

    per_image = [
        ([_sq(0, 0)], ["world"], [_sq(0, 0)], ["worl"]),
    ]
    assert evaluate_image_spotting(per_image)["e2e_hmean"] == 0.0
    assert evaluate_image_spotting(per_image, lexicon=["world"])["e2e_hmean"] == 1.0


def test_ignore_regions_excluded():
    from gomatching_tpu.evaluation.image_eval import evaluate_image_spotting

    per_image = [
        ([_sq(0, 0), _sq(30, 0)], ["hello", "###"],
         [_sq(0, 0), _sq(30, 0)], ["hello", "junk"]),
    ]
    m = evaluate_image_spotting(per_image)
    assert m["e2e_hmean"] == 1.0  # the '###' region and its pred don't count
