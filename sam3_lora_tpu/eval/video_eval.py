"""Video tracking evaluation: HOTA, CLEAR-MOT and YTVIS-style track mAP.

TPU-build replacement for the reference's vendored evaluation toolkits
(``sam3/eval/``: HOTA via trackeval, TETA, ``ytvis_eval.py`` 411 LoC,
``saco_veval_*``): the headline tracking metrics are re-derived from their
published definitions rather than ported, and operate on simple in-memory
track dicts (no file-format plumbing):

  gt_tracks / pred_tracks: {track_id: {frame_idx: mask (H,W) bool
                                       or box [x1,y1,x2,y2]}}
  pred_scores: {track_id: float}  (track confidence, for mAP sweeps)

* HOTA (Luiten et al., IJCV 2021): HOTA_alpha = sqrt(DetA * AssA) averaged
  over 19 alpha thresholds 0.05..0.95; global per-alpha Hungarian matching
  with Jaccard association scores.
* CLEAR-MOT (MOTA/MOTP, Bernardin & Stiefelhagen 2008): per-frame greedy
  matching with persistence, counting misses / false positives / id
  switches.
* Track mAP (YTVIS protocol): spatio-temporal track IoU (sum of per-frame
  intersections / sum of unions over the union of frames), 101-point
  interpolated AP over IoU 0.5:0.95.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["evaluate_hota", "evaluate_clear_mot", "evaluate_track_map", "track_iou"]


def _iou(a, b) -> float:
    """IoU of two detections: (H,W) bool masks or xyxy boxes."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 2:  # masks
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        return float(inter) / float(union) if union else 0.0
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return float(inter / ua) if ua > 0 else 0.0


def _frames(tracks: Dict) -> List:
    fs = set()
    for t in tracks.values():
        fs.update(t.keys())
    return sorted(fs)


def _lsap_max(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Max-sum linear assignment (scipy)."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(-cost)


def track_iou(ta: Dict, tb: Dict) -> float:
    """Spatio-temporal track IoU (YTVIS): sum_t |A_t ∩ B_t| / sum_t |A_t ∪ B_t|
    over the union of both tracks' frames (absent frame = empty)."""
    frames = set(ta.keys()) | set(tb.keys())
    inter_sum = 0.0
    union_sum = 0.0
    for f in frames:
        a, b = ta.get(f), tb.get(f)
        d = a if a is not None else b
        if np.asarray(d).ndim == 2:  # masks
            am = np.asarray(a, bool) if a is not None else np.zeros_like(np.asarray(d), bool)
            bm = np.asarray(b, bool) if b is not None else np.zeros_like(am)
            inter_sum += np.logical_and(am, bm).sum()
            union_sum += np.logical_or(am, bm).sum()
        elif a is not None and b is not None:  # boxes
            i = _iou(a, b)
            aa = (a[2] - a[0]) * (a[3] - a[1])
            bb = (b[2] - b[0]) * (b[3] - b[1])
            inter = i / (1 + i) * (aa + bb) if i > 0 else 0.0  # from IoU identity
            inter_sum += inter
            union_sum += aa + bb - inter
        elif a is not None or b is not None:
            d = a if a is not None else b
            union_sum += (d[2] - d[0]) * (d[3] - d[1])
    return inter_sum / union_sum if union_sum > 0 else 0.0


# ---------------------------------------------------------------------------
# HOTA
# ---------------------------------------------------------------------------


def evaluate_hota(
    gt_tracks: Dict,
    pred_tracks: Dict,
    alphas: Optional[Sequence[float]] = None,
) -> Dict[str, float]:
    """HOTA = mean_alpha sqrt(DetA_a * AssA_a).

    Per alpha: per-frame Hungarian matching on detection IoU (only pairs
    with IoU >= alpha are matchable), boosted by global association scores
    as the tiebreaker (the published two-stage formulation: match jointly on
    A(c) then IoU). AssA_a = mean over TPs of TPA/(TPA+FNA+FPA).
    """
    alphas = list(alphas) if alphas is not None else list(np.arange(0.05, 0.96, 0.05))
    gt_ids = sorted(gt_tracks.keys())
    pr_ids = sorted(pred_tracks.keys())
    frames = _frames({**{f"g{k}": v for k, v in gt_tracks.items()},
                      **{f"p{k}": v for k, v in pred_tracks.items()}})
    # precompute per-frame IoU matrices + presence counts
    per_frame = []  # (frame, gt_present_idx, pr_present_idx, iou_matrix)
    gt_count = np.zeros(len(gt_ids))
    pr_count = np.zeros(len(pr_ids))
    for f in frames:
        gi = [i for i, g in enumerate(gt_ids) if f in gt_tracks[g]]
        pi = [j for j, p in enumerate(pr_ids) if f in pred_tracks[p]]
        gt_count[gi] += 1
        pr_count[pi] += 1
        iou = np.zeros((len(gi), len(pi)))
        for a, i in enumerate(gi):
            for b, j in enumerate(pi):
                iou[a, b] = _iou(gt_tracks[gt_ids[i]][f], pred_tracks[pr_ids[j]][f])
        per_frame.append((f, gi, pi, iou))

    out_hota, out_deta, out_assa, out_loca = [], [], [], []
    for alpha in alphas:
        # pass 1: potential-match counts per (gt, pred) track pair
        pair_tp = np.zeros((len(gt_ids), len(pr_ids)))
        for _, gi, pi, iou in per_frame:
            for a, i in enumerate(gi):
                for b, j in enumerate(pi):
                    if iou[a, b] >= alpha - 1e-12:
                        pair_tp[i, j] += 1
        # association score A(i,j) = TPA / (gt_len + pr_len - TPA)
        denom = gt_count[:, None] + pr_count[None, :] - pair_tp
        assoc = np.divide(pair_tp, denom, out=np.zeros_like(pair_tp),
                          where=denom > 0)
        # pass 2: per-frame matching maximizing assoc (then IoU)
        tp = fp = fn = 0
        loc_sum = 0.0
        match_counts = np.zeros_like(pair_tp)
        for _, gi, pi, iou in per_frame:
            if gi and pi:
                score = np.zeros_like(iou)
                for a, i in enumerate(gi):
                    for b, j in enumerate(pi):
                        if iou[a, b] >= alpha - 1e-12:
                            score[a, b] = 1000.0 * assoc[i, j] + iou[a, b] + 1.0
                rows, cols = _lsap_max(score)
                matched_a = set()
                matched_b = set()
                for a, b in zip(rows, cols):
                    if score[a, b] > 0:
                        tp += 1
                        loc_sum += iou[a, b]
                        match_counts[gi[a], pi[b]] += 1
                        matched_a.add(a)
                        matched_b.add(b)
                fn += len(gi) - len(matched_a)
                fp += len(pi) - len(matched_b)
            else:
                fn += len(gi)
                fp += len(pi)
        deta = tp / (tp + fn + fp) if (tp + fn + fp) else 0.0
        # AssA = weighted mean of A over matches
        if tp:
            assa = float((match_counts * assoc).sum() / tp)
            loca = loc_sum / tp
        else:
            assa = 0.0
            loca = 0.0
        out_deta.append(deta)
        out_assa.append(assa)
        out_loca.append(loca)
        out_hota.append(np.sqrt(deta * assa))

    return {
        "HOTA": float(np.mean(out_hota)),
        "DetA": float(np.mean(out_deta)),
        "AssA": float(np.mean(out_assa)),
        "LocA": float(np.mean([l for l in out_loca if l > 0]) if any(out_loca) else 0.0),
    }


# ---------------------------------------------------------------------------
# CLEAR-MOT
# ---------------------------------------------------------------------------


def evaluate_clear_mot(
    gt_tracks: Dict,
    pred_tracks: Dict,
    iou_threshold: float = 0.5,
) -> Dict[str, float]:
    """MOTA = 1 - (FN + FP + IDSW) / num_gt; MOTP = mean matched IoU.

    Persistent matching: a gt keeps its previous prediction while IoU stays
    >= threshold; remaining pairs matched hungarian per frame; an id change
    on a gt counts as an id switch.
    """
    frames = _frames({**{f"g{k}": v for k, v in gt_tracks.items()},
                      **{f"p{k}": v for k, v in pred_tracks.items()}})
    last_match: Dict = {}
    fn = fp = idsw = 0
    n_gt = 0
    iou_sum = 0.0
    n_match = 0
    for f in frames:
        g_here = [g for g in gt_tracks if f in gt_tracks[g]]
        p_here = [p for p in pred_tracks if f in pred_tracks[p]]
        n_gt += len(g_here)
        matches = {}
        used_p = set()
        # persistence pass
        for g in list(g_here):
            p = last_match.get(g)
            if p is not None and p in p_here:
                i = _iou(gt_tracks[g][f], pred_tracks[p][f])
                if i >= iou_threshold:
                    matches[g] = (p, i)
                    used_p.add(p)
        # hungarian on the rest
        g_rem = [g for g in g_here if g not in matches]
        p_rem = [p for p in p_here if p not in used_p]
        if g_rem and p_rem:
            iou = np.array(
                [[_iou(gt_tracks[g][f], pred_tracks[p][f]) for p in p_rem]
                 for g in g_rem]
            )
            rows, cols = _lsap_max(iou)
            for a, b in zip(rows, cols):
                if iou[a, b] >= iou_threshold:
                    g, p = g_rem[a], p_rem[b]
                    matches[g] = (p, iou[a, b])
                    used_p.add(p)
        for g, (p, i) in matches.items():
            prev = last_match.get(g)
            if prev is not None and prev != p:
                idsw += 1
            last_match[g] = p
            iou_sum += i
            n_match += 1
        fn += len(g_here) - len(matches)
        fp += len(p_here) - len(used_p)
    mota = 1.0 - (fn + fp + idsw) / n_gt if n_gt else 0.0
    motp = iou_sum / n_match if n_match else 0.0
    return {"MOTA": float(mota), "MOTP": float(motp), "IDSW": float(idsw),
            "FN": float(fn), "FP": float(fp)}


# ---------------------------------------------------------------------------
# Track mAP (YTVIS protocol)
# ---------------------------------------------------------------------------


def evaluate_track_map(
    gt_tracks: Dict,
    pred_tracks: Dict,
    pred_scores: Dict,
    iou_thrs: Optional[Sequence[float]] = None,
) -> Dict[str, float]:
    """Class-agnostic track-level AP over spatio-temporal IoU thresholds
    (ytvis_eval.py protocol on one video; callers average across videos)."""
    iou_thrs = np.asarray(iou_thrs if iou_thrs is not None else np.linspace(0.5, 0.95, 10))
    recall_thrs = np.linspace(0, 1, 101)
    gt_ids = sorted(gt_tracks.keys())
    pr_ids = sorted(pred_tracks.keys(), key=lambda p: -pred_scores.get(p, 0.0))
    if not gt_ids:
        return {"track_mAP": 0.0, "track_mAP_50": 0.0, "track_mAP_75": 0.0}
    iou = np.array(
        [[track_iou(pred_tracks[p], gt_tracks[g]) for g in gt_ids] for p in pr_ids]
    ) if pr_ids else np.zeros((0, len(gt_ids)))

    aps = []
    for t_i, thr in enumerate(iou_thrs):
        gt_taken = np.zeros(len(gt_ids), bool)
        tp = np.zeros(len(pr_ids))
        for d in range(len(pr_ids)):  # greedy best-IoU match, score order
            best, best_g = thr, -1
            for g in range(len(gt_ids)):
                if not gt_taken[g] and iou[d, g] >= best:
                    best, best_g = iou[d, g], g
            if best_g >= 0:
                gt_taken[best_g] = True
                tp[d] = 1
        cum_tp = np.cumsum(tp)
        recall = cum_tp / len(gt_ids)
        precision = cum_tp / (np.arange(len(pr_ids)) + 1)
        # monotone precision envelope
        for i in range(len(precision) - 1, 0, -1):
            precision[i - 1] = max(precision[i - 1], precision[i])
        ap = 0.0
        for r in recall_thrs:
            idx = np.searchsorted(recall, r, side="left")
            if idx < len(precision):
                ap += precision[idx]
        aps.append(ap / len(recall_thrs))
    aps = np.asarray(aps)
    return {
        "track_mAP": float(aps.mean()),
        "track_mAP_50": float(aps[np.argmin(np.abs(iou_thrs - 0.5))]),
        "track_mAP_75": float(aps[np.argmin(np.abs(iou_thrs - 0.75))]),
    }
