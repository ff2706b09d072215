import numpy as np

from ocrfdet_tpu.core.eval_metrics import DetectionEvaluator
from ocrfdet_tpu.config import CLASS_NAMES


def _box(x, y, yaw=0.0, dims=(4, 2, 1.5), vel=(0, 0), z=0.0):
    return np.array([x, y, z, *dims, yaw, *vel], dtype=np.float64)


def test_perfect_detections():
    ev = DetectionEvaluator(CLASS_NAMES)
    for s in range(3):
        gts = np.stack([_box(10 + s, 0), _box(-5, 8 + s)])
        ev.add_sample(gts.copy(), np.array([0.9, 0.8]),
                      np.array([0, 0]), gts, np.array([0, 0]))
    m = ev.evaluate()
    assert m["mAP"] > 0.95
    assert m["mATE"] < 1e-6
    assert m["mASE"] < 1e-6
    assert m["mAOE"] < 1e-6
    assert m["mAVE"] < 1e-6
    # attrs derived from (class, velocity) on both sides -> mAAE 0,
    # so perfect detections give NDS 1
    np.testing.assert_allclose(m["NDS"], 1.0, atol=0.03)


def test_no_detections():
    ev = DetectionEvaluator(CLASS_NAMES)
    gts = np.stack([_box(10, 0)])
    ev.add_sample(np.zeros((0, 9)), np.zeros(0), np.zeros(0, np.int64),
                  gts, np.array([0]))
    m = ev.evaluate()
    assert m["mAP"] == 0.0


def test_displaced_detection_threshold_sensitivity():
    """A 1.5m-offset detection counts at d in {2,4} but not {0.5,1}."""
    ev = DetectionEvaluator(CLASS_NAMES)
    gt = np.stack([_box(10, 0)])
    det = np.stack([_box(11.5, 0)])
    ev.add_sample(det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    m = ev.evaluate()
    # AP averaged over 4 thresholds: ~1 for 2 of them
    assert 0.3 < m["per_class_ap"]["car"] < 0.7


def test_false_positives_reduce_ap():
    ev_clean = DetectionEvaluator(CLASS_NAMES)
    ev_noisy = DetectionEvaluator(CLASS_NAMES)
    gt = np.stack([_box(10, 0)])
    det = np.stack([_box(10, 0)])
    fp = np.stack([_box(10, 0), _box(30, 30), _box(-30, 30)])
    ev_clean.add_sample(det, np.array([0.9]), np.array([0]),
                        gt, np.array([0]))
    ev_noisy.add_sample(fp, np.array([0.9, 0.95, 0.85]),
                        np.array([0, 0, 0]), gt, np.array([0]))
    assert (ev_noisy.evaluate()["mAP"] < ev_clean.evaluate()["mAP"])


def test_orientation_error_period():
    ev = DetectionEvaluator(CLASS_NAMES)
    gt = np.stack([_box(10, 0, yaw=0.0)])
    det = np.stack([_box(10, 0, yaw=np.pi - 0.1)])
    ev.add_sample(det, np.array([0.9]), np.array([0]), gt, np.array([0]))
    m = ev.evaluate()
    np.testing.assert_allclose(m["mAOE"], np.pi - 0.1, atol=1e-6)
    # barrier class uses period pi: same offset is only 0.1
    ev2 = DetectionEvaluator(CLASS_NAMES)
    ev2.add_sample(det, np.array([0.9]), np.array([5]), gt, np.array([5]))
    np.testing.assert_allclose(ev2.evaluate()["mAOE"], 0.1, atol=1e-6)


def test_nusc_format_roundtrip(tmp_path):
    from ocrfdet_tpu.core.nusc_format import (boxes_to_nusc_sample,
                                              write_results_json)
    import json
    boxes = np.stack([_box(10, 5, yaw=0.3, vel=(3, 0))])
    pose = dict(ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[100.0, 200.0, 0.0])
    res = boxes_to_nusc_sample(boxes, np.array([0.7]), np.array([0]),
                               CLASS_NAMES, pose)
    assert res[0]["detection_name"] == "car"
    np.testing.assert_allclose(res[0]["translation"][:2], [110.0, 205.0])
    assert res[0]["attribute_name"] == "vehicle.moving"
    p = tmp_path / "res.json"
    write_results_json({"tok0": res}, str(p))
    loaded = json.loads(p.read_text())
    assert loaded["meta"]["use_camera"]
    assert "tok0" in loaded["results"]


def test_devkit_golden_ap_and_tp():
    """Pins the evaluator to hand-computed devkit-spec values.

    Scenario (one sample, class car): GTs at (0,0) and (10,0); preds
    TP d=0.1 @0.9, FP @0.8, TP d=0.5 @0.7.  At dist_th=2:
      rec=[.5,.5,1], prec=[1,.5,2/3] ->
      AP = ((39*0.9 + 0.4 + 50*0.4 + (1/3)*12.75)/90)/0.9 = 0.737654
      trans: cummean [0.1, 0.3] interpolated on the confidence grid,
      averaged over recall 0.11..1.00 = 16.65/90 = 0.185
      (a plain mean over TPs would give 0.3 — the devkit aggregation
      is what this pins).
    At dist_th=0.5 only the first pred matches:
      AP = ((39*0.9 + max(1/3-0.1,0))/90)/0.9 = 0.436214
    """
    from ocrfdet_tpu.core.eval_metrics import calc_ap, calc_tp
    ev = DetectionEvaluator(CLASS_NAMES)
    gt = np.stack([_box(0, 0), _box(10, 0)])
    det = np.stack([_box(0.1, 0), _box(5, 0), _box(10, 0.5)])
    ev.add_sample(det, np.array([0.9, 0.8, 0.7]), np.array([0, 0, 0]),
                  gt, np.array([0, 0]))
    md2 = ev.accumulate(0, 2.0)
    np.testing.assert_allclose(calc_ap(md2), 0.7376543, atol=1e-6)
    np.testing.assert_allclose(calc_tp(md2, "trans_err"), 0.185,
                               atol=1e-9)
    md05 = ev.accumulate(0, 0.5)
    np.testing.assert_allclose(calc_ap(md05), 0.4362140, atol=1e-6)
    m = ev.evaluate()
    np.testing.assert_allclose(m["mAP"], 0.6622942, atol=1e-6)
    np.testing.assert_allclose(m["mATE"], 0.185, atol=1e-9)
    np.testing.assert_allclose(m["NDS"], 0.8126471, atol=1e-6)


def test_tp_error_is_one_below_min_recall():
    """devkit calc_tp: max achieved recall < 0.1 -> error pinned 1.0."""
    ev = DetectionEvaluator(CLASS_NAMES)
    # 20 GTs, only one detected (recall 0.05 < min_recall 0.1)
    gts = np.stack([_box(2 * i - 20, 0) for i in range(20)])
    det = np.stack([_box(0.3, 0)])
    ev.add_sample(det, np.array([0.9]), np.array([0]), gts,
                  np.zeros(20, np.int64))
    m = ev.evaluate()
    assert m["mATE"] == 1.0
    assert m["mASE"] == 1.0


def test_token_dedup_across_processes_and_merges():
    """Padded ragged-tail duplicates (data/dataset.py Loader.epoch) are
    scored exactly once through add_sample, a cross-process merge and a
    second-level merge; n_samples counts SCORED samples only and later
    merge offsets never collide with already-assigned sample ids
    (advisor r3 finding)."""
    def sample(tok, x):
        gt = np.stack([_box(x, 0)])
        return dict(pred_boxes=gt.copy(), scores=np.array([0.9]),
                    labels=np.array([0]), gt_boxes=gt,
                    gt_labels=np.array([0]), token=tok)

    # process 0 scores t0, t1; process 1 scores t2 and the padded
    # duplicates t1 (cross-process dup) and t2 (in-process dup)
    ev0 = DetectionEvaluator(CLASS_NAMES)
    ev0.add_sample(**sample("t0", 5))
    ev0.add_sample(**sample("t1", 10))
    ev1 = DetectionEvaluator(CLASS_NAMES)
    ev1.add_sample(**sample("t2", 15))
    ev1.add_sample(**sample("t2", 15))       # in-process duplicate
    ev1.add_sample(**sample("t1", 10))       # duplicate of ev0's t1
    assert ev1.n_samples == 2                # t2 + the foreign t1

    ev0.merge(ev1)                           # t1 dropped here
    assert ev0.n_samples == 3
    assert len(ev0._seen_tokens) == 3
    n_preds = sum(len(v) for v in ev0.preds.values())
    n_gts = sum(len(lst) for per in ev0.gts.values()
                for lst in per.values())
    assert n_preds == n_gts == 3

    # second-level merge (tree gather): a third shard re-sends t0 and
    # adds t3; ids must not collide with those assigned above
    ev2 = DetectionEvaluator(CLASS_NAMES)
    ev2.add_sample(**sample("t0", 5))
    ev2.add_sample(**sample("t3", 20))
    ev0.merge(ev2)
    assert ev0.n_samples == 4
    sids = {sid for lst in ev0.preds.values() for (_, sid, _, _) in lst}
    assert len(sids) == 4                    # all distinct
    m = ev0.evaluate()
    assert m["mAP"] > 0.95                   # every token scored once


def test_class_range_filter():
    """Devkit class_range: car beyond 50m is dropped from GT and preds."""
    ev = DetectionEvaluator(CLASS_NAMES)
    gt = np.stack([_box(10, 0), _box(49, 30)])   # second at 57m: dropped
    det = np.stack([_box(10, 0)])
    ev.add_sample(det, np.array([0.9]), np.array([0]), gt,
                  np.array([0, 0]))
    m = ev.evaluate()
    assert m["mAP"] > 0.95   # recall 1/1, not 1/2


def test_excluded_tp_metrics():
    """traffic_cone has no orient/vel/attr error; barrier no vel/attr."""
    ev = DetectionEvaluator(CLASS_NAMES)
    cone = _box(5, 0, yaw=1.0, vel=(3, 0))
    det = cone.copy()
    det[6] = 2.5   # large yaw error that must NOT count
    det[7] = -3.0
    ev.add_sample(np.stack([det]), np.array([0.9]), np.array([9]),
                  np.stack([cone]), np.array([9]))
    m = ev.evaluate()
    assert m["mAOE"] == 1.0   # nan-mean over zero defined classes -> 1
    assert m["mAVE"] == 1.0
    assert m["mATE"] < 1e-6
