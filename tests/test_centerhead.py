import jax
import jax.numpy as jnp
import numpy as np

from ocrfdet_tpu.config import tiny_config, ocrfdet_config
from ocrfdet_tpu.core import targets as TG
from ocrfdet_tpu.core.coder import decode_task
from ocrfdet_tpu.losses.center import center_head_loss
from ocrfdet_tpu.models.centerhead import CenterHead
from ocrfdet_tpu.ops import nms as NMS


def test_gaussian_radius_positive():
    r = TG.gaussian_radius((5.0, 3.0), 0.1)
    assert r > 0


def test_draw_gaussian_peak():
    hm = np.zeros((16, 16), dtype=np.float32)
    TG.draw_gaussian(hm, (8, 8), 2)
    assert hm[8, 8] == 1.0
    assert hm[8, 9] < 1.0 and hm[8, 9] > 0.0


def test_targets_roundtrip_with_decode():
    """Draw a box into targets, then check heatmap peak position maps
    back to the box centre through the decode conventions."""
    cfg = ocrfdet_config()
    boxes = np.array([[10.0, -20.0, 0.5, 4.0, 2.0, 1.5, 0.3, 1.0, -1.0]])
    labels = np.array([0])  # car -> task 0
    t = TG.centerpoint_targets(boxes, labels, cfg.head, cfg.grid)
    hm = t["heatmaps"][0]
    assert hm.shape == (128, 128, 1)
    yx = np.unravel_index(np.argmax(hm[:, :, 0]), hm.shape[:2])
    # centre voxel: (x - x0) / (0.1 * 8)
    assert yx[1] == int((10.0 + 51.2) / 0.8)
    assert yx[0] == int((-20.0 + 51.2) / 0.8)
    assert t["masks"][0][0] == 1.0
    # anno_box: [dx_frac, dy_frac, z, log dims, sin, cos, vx, vy]
    np.testing.assert_allclose(t["anno_boxes"][0][0, 3:6], np.log([4, 2, 1.5]),
                               rtol=1e-6)


def test_centerhead_shapes_and_loss():
    cfg = tiny_config()
    head = CenterHead(cfg.head)
    x = jnp.ones((2, 16, 16, cfg.head.in_channels))
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    assert len(preds) == 6
    assert preds[0]["heatmap"].shape == (2, 16, 16, 1)
    assert preds[1]["heatmap"].shape == (2, 16, 16, 2)
    assert preds[0]["reg"].shape == (2, 16, 16, 2)

    # targets sized for the tiny 16x16 map: use grid/voxel consistent
    fh = fw = 16
    tgts = dict(
        heatmaps=[jnp.zeros((2, fh, fw, len(t.class_names)))
                  for t in cfg.head.tasks],
        anno_boxes=[jnp.zeros((2, cfg.head.max_objs, 10))] * 6,
        inds=[jnp.zeros((2, cfg.head.max_objs), dtype=jnp.int32)] * 6,
        masks=[jnp.zeros((2, cfg.head.max_objs))] * 6,
    )
    losses = center_head_loss(preds, tgts, cfg.head.code_weights)
    assert "task0.loss_heatmap" in losses and "task5.loss_vel" in losses
    for v in losses.values():
        assert np.isfinite(float(v))


def test_decode_recovers_center():
    cfg = ocrfdet_config()
    B, H, W, K = 1, 128, 128, 1
    pred = {
        "heatmap": jnp.full((B, H, W, K), -10.0),
        "reg": jnp.zeros((B, H, W, 2)),
        "height": jnp.zeros((B, H, W, 1)),
        "dim": jnp.zeros((B, H, W, 3)),
        "rot": jnp.zeros((B, H, W, 2)),
        "vel": jnp.zeros((B, H, W, 2)),
    }
    pred["heatmap"] = pred["heatmap"].at[0, 40, 60, 0].set(8.0)
    out = decode_task(pred, 10, cfg.head.out_size_factor,
                      cfg.head.voxel_size, (cfg.grid.x[0], cfg.grid.y[0]),
                      cfg.head.post_center_range, 0.1)
    assert bool(out.valid[0, 0])
    np.testing.assert_allclose(out.boxes[0, 0, 0], 60 * 0.8 - 51.2, atol=1e-4)
    np.testing.assert_allclose(out.boxes[0, 0, 1], 40 * 0.8 - 51.2, atol=1e-4)


def test_rotated_iou_axis_aligned():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0],   # half overlap
                  [0.0, 0.0, 2.0, 2.0, np.pi / 2],  # same square rotated
                  [5.0, 5.0, 2.0, 2.0, 0.0]])  # disjoint
    iou = NMS.rotated_iou_matrix(a, b)
    np.testing.assert_allclose(iou[0, 0], 2.0 / 6.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-9)


def test_rotated_iou_45deg():
    # unit square vs itself rotated 45deg: inter is a regular octagon
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    iou = NMS.rotated_iou_matrix(a, b)
    inter = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(iou[0, 0], inter / (2 - inter), atol=1e-6)


def test_native_matches_numpy():
    from ocrfdet_tpu.ops import _nms_native
    if not _nms_native.available():
        return
    rng = np.random.default_rng(3)
    boxes = np.stack([
        rng.uniform(-5, 5, 40), rng.uniform(-5, 5, 40),
        rng.uniform(0.5, 4, 40), rng.uniform(0.5, 4, 40),
        rng.uniform(-np.pi, np.pi, 40)], -1)
    native = _nms_native.rotated_iou_matrix(boxes, boxes)
    # numpy path (force)
    ca = NMS._box_corners(boxes)
    ref = np.zeros((40, 40))
    area = boxes[:, 2] * boxes[:, 3]
    for i in range(40):
        for j in range(40):
            inter = NMS._poly_area(NMS._poly_clip(ca[i], ca[j]))
            ref[i, j] = inter / max(area[i] + area[j] - inter, 1e-12)
    np.testing.assert_allclose(native, ref, atol=1e-8)


def test_nms_rotated_suppression():
    boxes = np.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],   # heavy overlap with 0
        [10.0, 0.0, 2.0, 2.0, 0.0],
    ])
    scores = np.array([0.9, 0.8, 0.7])
    keep = NMS.nms_rotated(boxes, scores, 0.5)
    assert list(keep) == [0, 2]


def test_circle_nms():
    pts = np.array([[0.0, 0.0, 0.9], [0.5, 0.0, 0.8], [5.0, 0.0, 0.7]])
    keep = NMS.circle_nms(pts, 1.0)
    assert list(keep) == [0, 2]


def test_multi_task_nms_merges():
    cfg = ocrfdet_config()
    task_results = []
    for t in range(6):
        K = 4
        task_results.append(dict(
            boxes=np.tile(np.array([1.0, 2.0, 0.5, 4, 2, 1.5, 0.2, 0, 0]),
                          (K, 1)),
            scores=np.array([0.9, 0.2, 0.05, 0.01]),
            labels=np.zeros(K, dtype=np.int64),
            valid=np.array([True, True, False, False]),
        ))
    out = NMS.multi_task_nms(task_results, cfg.head)
    # each task suppresses its duplicate -> 6 boxes, global labels
    assert out["boxes"].shape == (6, 9)
    assert sorted(out["labels"].tolist()) == [0, 1, 3, 5, 6, 8]
    # z converted to bottom centre
    np.testing.assert_allclose(out["boxes"][0, 2], 0.5 - 0.75)
