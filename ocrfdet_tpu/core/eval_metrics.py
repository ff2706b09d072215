"""Native nuScenes-style detection metrics (mAP / TP errors / NDS).

The reference delegates to the nuScenes devkit
(datasets/nuscenes_dataset.py:432-491); the devkit is not a dependency
of this framework, so the metric algorithm is implemented natively
following the published specification (center-distance matching at
{0.5, 1, 2, 4} m, 101-point interpolated precision with (0.1, 0.1)
operating-point normalisation, TP errors at the 2 m threshold):

  AP_d = mean(max(prec[r] - 0.1, 0) for r in (0.1, 1]) / 0.9
  mAP  = mean over classes and thresholds
  NDS  = (5*mAP + sum over TP metrics of (1 - min(1, err))) / 10

Attribute error (mAAE) cannot be computed from bevdetv2 info files (no
attribute GT); `attr_err` defaults to the devkit convention of 1.0 for
classes without attributes and is reported separately so NDS here is a
lower bound unless attribute GT is supplied.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


def yaw_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = (a - b) % period
    if d > period / 2:
        d = period - d
    return abs(d)


def aligned_iou_3d(dims_a, dims_b) -> float:
    """3D IoU of translation/yaw-aligned boxes (scale error metric)."""
    inter = np.prod(np.minimum(dims_a, dims_b))
    union = np.prod(dims_a) + np.prod(dims_b) - inter
    return float(inter / max(union, 1e-9))


class DetectionEvaluator:
    """Accumulates per-sample predictions + GT; computes mAP/NDS."""

    def __init__(self, class_names: Sequence[str]):
        self.class_names = list(class_names)
        # per class: list of (score, sample_id, box[9])
        self.preds: Dict[int, list] = defaultdict(list)
        # per (class, sample): list of gt box[9]
        self.gts: Dict[int, Dict[int, list]] = defaultdict(
            lambda: defaultdict(list))
        self.n_samples = 0

    def add_sample(self, pred_boxes: np.ndarray, scores: np.ndarray,
                   labels: np.ndarray, gt_boxes: np.ndarray,
                   gt_labels: np.ndarray):
        sid = self.n_samples
        self.n_samples += 1
        for b, s, l in zip(pred_boxes, scores, labels):
            self.preds[int(l)].append((float(s), sid, np.asarray(b)))
        for b, l in zip(gt_boxes, gt_labels):
            self.gts[int(l)][sid].append(np.asarray(b))

    def _eval_class_threshold(self, cls: int, dist_t: float):
        """Greedy center-distance matching; returns (prec101, tp_errs)."""
        preds = sorted(self.preds[cls], key=lambda x: -x[0])
        npos = sum(len(v) for v in self.gts[cls].values())
        if npos == 0:
            return None, None
        taken: Dict[int, set] = defaultdict(set)
        tp, fp = [], []
        errs = dict(trans=[], scale=[], orient=[], vel=[])
        period = np.pi if self.class_names[cls] == "barrier" else 2 * np.pi
        for score, sid, box in preds:
            gts = self.gts[cls].get(sid, [])
            best_d, best_j = np.inf, -1
            for j, g in enumerate(gts):
                if j in taken[sid]:
                    continue
                d = float(np.hypot(box[0] - g[0], box[1] - g[1]))
                if d < best_d:
                    best_d, best_j = d, j
            if best_j >= 0 and best_d < dist_t:
                taken[sid].add(best_j)
                tp.append(1.0)
                fp.append(0.0)
                g = gts[best_j]
                errs["trans"].append(best_d)
                errs["scale"].append(1.0 - aligned_iou_3d(box[3:6], g[3:6]))
                errs["orient"].append(yaw_diff(box[6], g[6], period))
                errs["vel"].append(float(np.hypot(box[7] - g[7],
                                                  box[8] - g[8])))
            else:
                tp.append(0.0)
                fp.append(1.0)
        if not tp:
            return np.zeros(101), None
        tp_c = np.cumsum(tp)
        fp_c = np.cumsum(fp)
        recall = tp_c / npos
        precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
        # 101-point interpolated precision over recall [0, 1]
        r101 = np.linspace(0, 1, 101)
        prec101 = np.interp(r101, recall, precision, right=0)
        mean_errs = ({k: float(np.mean(v)) for k, v in errs.items()}
                     if errs["trans"] else None)
        return prec101, mean_errs

    @staticmethod
    def _calc_ap(prec101: np.ndarray) -> float:
        p = prec101[round(100 * MIN_RECALL) + 1:].copy()
        p -= MIN_PRECISION
        p[p < 0] = 0
        return float(np.mean(p)) / (1.0 - MIN_PRECISION)

    def evaluate(self) -> Dict[str, float]:
        aps = {}
        tp_errs = defaultdict(dict)
        for c, name in enumerate(self.class_names):
            cls_aps = []
            for d in DIST_THRESHOLDS:
                prec101, errs = self._eval_class_threshold(c, d)
                if prec101 is None:
                    continue
                cls_aps.append(self._calc_ap(prec101))
                if d == TP_THRESHOLD and errs is not None:
                    tp_errs[name] = errs
            if cls_aps:
                aps[name] = float(np.mean(cls_aps))
        mAP = float(np.mean(list(aps.values()))) if aps else 0.0

        def mean_err(key):
            vals = [e[key] for e in tp_errs.values() if key in e]
            return float(np.mean(vals)) if vals else 1.0

        mATE = mean_err("trans")
        mASE = mean_err("scale")
        mAOE = mean_err("orient")
        mAVE = mean_err("vel")
        mAAE = 1.0   # attributes unavailable (see module docstring)
        tp_scores = [max(1.0 - e, 0.0) for e in
                     (mATE, mASE, mAOE, mAVE, mAAE)]
        nds = (5.0 * mAP + sum(tp_scores)) / 10.0
        return dict(mAP=mAP, NDS=nds, mATE=mATE, mASE=mASE, mAOE=mAOE,
                    mAVE=mAVE, mAAE=mAAE, per_class_ap=aps)
