"""Integration test: fake nuScenes on disk -> real pipeline -> model."""
import numpy as np
import pytest

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes
from ocrfdet_tpu.data import infos as INF
from ocrfdet_tpu.data.pipeline import fill_polygon


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fakenusc")
    cfg = tiny_config()
    pkl = build_fake_nuscenes(str(root), cfg, n_samples=4)
    return cfg, pkl


def test_load_and_adjacent(fake_root):
    cfg, pkl = fake_root
    infos = INF.load_infos(pkl)
    assert len(infos) == 4
    adj = INF.adjacent_infos(infos, 2, num_adj=1, stereo=True)
    assert len(adj) == 2
    assert adj[0]["token"] == "tok1" and adj[1]["token"] == "tok0"
    # boundary clamp at index 0
    adj0 = INF.adjacent_infos(infos, 0, num_adj=1, stereo=True)
    assert adj0[0]["token"] == "tok0"


def test_prepare_sample_shapes(fake_root):
    cfg, pkl = fake_root
    ds = NuScenesDataset(cfg, pkl, is_train=True, cbgs=False)
    s = ds.sample(1)
    F, N = cfg.total_frames, cfg.data.num_cams
    H, W = cfg.data.input_size
    assert s["imgs"].shape == (F, N, H, W, 3)
    assert s["imgs_wo_norm"].shape == (N, H, W, 3)
    assert s["rots"].shape == (F, N, 3, 3)
    assert s["k2s_sensor"].shape == (F, N, 4, 4)
    assert s["gt_depth"].shape == (N, H, W)
    assert s["gt_bev_mask"].shape == (cfg.vt.bev_h, cfg.vt.bev_w)
    assert s["render_box_mask"].shape == (H, W)
    assert len(s["heatmaps"]) == 6
    # normalized images roughly zero-mean
    assert abs(float(s["imgs"].mean())) < 2.0
    # point labels produced depth hits
    assert (s["gt_depth"] > 0).sum() > 0


def test_key_sensor2keyego_consistency(fake_root):
    """sensor2keyego of the key frame's CAM_FRONT must equal its
    sensor2ego (same ego pose)."""
    cfg, pkl = fake_root
    infos = INF.load_infos(pkl)
    cd = infos[0]["cams"]["CAM_FRONT"]
    s2ke = INF.sensor2keyego(cd, cd)
    s2e, _ = INF.cam_transforms(cd)
    np.testing.assert_allclose(s2ke, s2e, atol=1e-9)


def test_k2s_translation_matches_ego_motion(fake_root):
    """Fake scene: ego advances 2m per frame; key->prev-sensor
    transform must move points accordingly."""
    cfg, pkl = fake_root
    ds = NuScenesDataset(cfg, pkl, is_train=False, cbgs=False)
    s = ds.sample(1)  # index 1 -> prev is index 0 (2m behind)
    k2s = s["k2s_sensor"][0, 0]
    # a point at the key sensor origin maps to prev-sensor frame with
    # nonzero offset (ego moved)
    p = k2s @ np.array([0.0, 0.0, 0.0, 1.0])
    assert np.linalg.norm(p[:3]) > 1.0


def test_loader_batches(fake_root):
    cfg, pkl = fake_root
    ds = NuScenesDataset(cfg, pkl, is_train=True, cbgs=True)
    loader = Loader(ds, batch_size=2, num_workers=2, prefetch=2)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["imgs"].shape[0] == 2
    assert len(b["heatmaps"]) == 6
    assert b["heatmaps"][0].shape[0] == 2


def test_fill_polygon_square():
    canvas = np.zeros((16, 16), np.float32)
    fill_polygon(canvas, np.array([[2.0, 2.0], [10.0, 2.0],
                                   [10.0, 10.0], [2.0, 10.0]]))
    assert canvas[5, 5] == 1.0
    assert canvas[1, 1] == 0.0
    assert canvas[12, 12] == 0.0
    # ~64 cells filled for an 8x8 square
    assert 40 < canvas.sum() < 90


def test_pipeline_feeds_model(fake_root):
    import jax
    import jax.numpy as jnp
    from ocrfdet_tpu.models.detector import OcRFDet
    cfg, pkl = fake_root
    ds = NuScenesDataset(cfg, pkl, is_train=True, cbgs=False)
    loader = Loader(ds, batch_size=2, num_workers=1)
    batch = next(loader.epoch(0))
    dev = {k: jnp.asarray(v) if isinstance(v, np.ndarray)
           else ([jnp.asarray(x) for x in v] if isinstance(v, list)
                 and k in ("heatmaps", "anno_boxes", "inds", "masks")
                 else v)
           for k, v in batch.items()
           if k not in ("gt_boxes", "gt_labels", "sample_token")}
    dev["with_prev"] = jnp.asarray(1.0)
    dev["use_box_mask"] = jnp.asarray(0.0)
    model = OcRFDet(cfg)
    variables = model.init(jax.random.PRNGKey(0), dev, train=True)
    (preds, aux), _ = model.apply(variables, dev, train=True,
                                  mutable=["batch_stats"])
    assert np.isfinite(float(jnp.sum(preds[0]["heatmap"])))
    assert "render_img" in aux


def test_geoenh_pipeline_keys(fake_root):
    """vggt_teacher config makes the REAL pipeline emit the
    rig-neighbour kd_pair (reference ocrfdet_vggt.py:166-173); the
    teacher reads the augmented train tensor so no separate image
    tensor is shipped (advisor r3: imgs_wo_aug was dead weight)."""
    import dataclasses
    from ocrfdet_tpu.config import VGGTTeacherConfig
    cfg, pkl = fake_root
    gcfg = dataclasses.replace(cfg, vggt_teacher=VGGTTeacherConfig(
        image_size=(28, 56), patch_size=14, embed_dim=8, depth=1,
        num_heads=2))
    ds = NuScenesDataset(gcfg, pkl, is_train=True, cbgs=False)
    s = ds.sample(0)
    N = gcfg.data.num_cams
    assert "imgs_wo_aug" not in s
    i1, i2 = (int(x) for x in s["kd_pair"])
    assert 0 <= i1 < N and 0 <= i2 < N and i1 != i2
    # the back-camera swap: i2 never lands on the wrap-around indices
    # the reference special-cases (3, 5 with N == 6)
    for k in range(8):
        sk = ds.sample(k % 4)
        p1, p2 = (int(x) for x in sk["kd_pair"])
        if p1 in (2, 4):
            assert p2 == 8 - (p1 + 1) % 6


def test_loader_process_sharding(fake_root):
    """Two single-process loaders with ranks 0/1 partition every global
    batch without overlap (DistributedSampler analog)."""
    cfg, pkl = fake_root
    ds = NuScenesDataset(cfg, pkl, is_train=True, cbgs=False)
    full = Loader(ds, batch_size=4, shuffle=True, num_workers=2)
    l0 = Loader(ds, batch_size=4, shuffle=True, num_workers=2,
                process_index=0, process_count=2)
    l1 = Loader(ds, batch_size=4, shuffle=True, num_workers=2,
                process_index=1, process_count=2)
    bf = next(full.epoch(3))
    b0 = next(l0.epoch(3))
    b1 = next(l1.epoch(3))
    assert b0["imgs"].shape[0] == 2 and b1["imgs"].shape[0] == 2
    glob = np.concatenate([b0["imgs"], b1["imgs"]])
    np.testing.assert_allclose(glob, bf["imgs"])
