"""Image text-spotting evaluation (pretraining side).

Parity: adet's TextEvaluator family (third_party/adet/evaluation/
text_evaluation_all.py): per-image detection HMean and end-to-end word
spotting (a detection counts only when its transcription matches the GT word,
case-insensitive), with optional lexicon correction — an OCR word is replaced
by the nearest lexicon entry by UPPERCASED plain edit distance, accepted when
the distance is < 1.5 (find_match_word, text_evaluation_all.py:249-264,331-333
— this fork uses editdistance.eval directly, not the older RRC
weighted-editdistance variant).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .mot_metrics import evaluate_detection, levenshtein, poly_iou_matrix
from ..ops.hungarian import solve


def lexicon_correct(word: str, lexicon: Sequence[str], max_dist: float = 1.5) -> str:
    """Replace ``word`` by its nearest lexicon entry (uppercased plain edit
    distance) when the minimum distance is < ``max_dist`` — the reference's
    find_match_word + its `match_dist < 1.5` acceptance
    (text_evaluation_all.py:249-264, :331-333)."""
    if not lexicon:
        return word
    best, best_d = word, len(word) + 100
    wu = word.upper()
    for cand in lexicon:
        d = levenshtein(wu, cand.upper())
        if d < best_d:
            best, best_d = cand, d
    if best_d < max_dist:
        return best
    return word


def evaluate_image_spotting(
    per_image,  # iterable of (gt_polys, gt_texts, pred_polys, pred_texts)
    iou_threshold: float = 0.5,
    lexicon: Optional[Sequence[str]] = None,
) -> Dict[str, float]:
    """End-to-end word spotting: IoU>=thr AND transcription match.

    GT '###' instances are don't-care (excluded; predictions matching them by
    IoU are excluded too). Returns detection and e2e precision/recall/hmean.
    """
    det_frames = []
    matched = num_gt = num_det = 0
    for gt_polys, gt_texts, pred_polys, pred_texts in per_image:
        det_frames.append((gt_polys, gt_texts, pred_polys))
        care = [i for i, t in enumerate(gt_texts) if t != "###"]
        ignore = [i for i, t in enumerate(gt_texts) if t == "###"]
        keep = list(range(len(pred_polys)))
        if ignore and keep:
            iou_ign = poly_iou_matrix([gt_polys[i] for i in ignore], pred_polys)
            keep = [j for j in keep if iou_ign[:, j].max(initial=0.0) < iou_threshold]
        num_gt += len(care)
        num_det += len(keep)
        if not care or not keep:
            continue
        texts = [
            lexicon_correct(pred_texts[j], lexicon) if lexicon else pred_texts[j]
            for j in keep
        ]
        iou = poly_iou_matrix([gt_polys[i] for i in care], [pred_polys[j] for j in keep])
        ok = np.zeros_like(iou, bool)
        for a, i in enumerate(care):
            for b, j in enumerate(keep):
                ok[a, b] = (
                    iou[a, b] >= iou_threshold
                    and gt_texts[i].lower() == texts[b].lower()
                )
        cost = np.where(ok, 1.0 - iou, 1e6)
        ri, ci = solve(cost)
        matched += int(sum(ok[r, c] for r, c in zip(ri, ci)))

    det = evaluate_detection(det_frames, iou_threshold)
    p = matched / num_det if num_det else (1.0 if num_gt == 0 else 0.0)
    r = matched / num_gt if num_gt else 1.0
    h = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "det_precision": det["precision"],
        "det_recall": det["recall"],
        "det_hmean": det["hmean"],
        "e2e_precision": p,
        "e2e_recall": r,
        "e2e_hmean": h,
    }
