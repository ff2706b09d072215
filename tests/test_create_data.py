"""create_data GT derivation + point-label projection vs hand geometry.

The tool (tools_tpu/create_data.py, analog of the reference's
tools/create_data_bevdet.py:42-150 and generate_point_label.py:42-111)
defers its devkit imports, so these tests inject miniature
pyquaternion/nuscenes stand-ins (yaw-only quaternions, devkit Box
semantics, [N,5] lidar .bin files) and golden-check the derived
ego-frame boxes/velocities/labels and the projected sparse depths
against independently hand-computed geometry.
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ------------------------------------------------------------------
# miniature devkit (yaw-only rotations are all the fixture uses)
# ------------------------------------------------------------------

class Quaternion:
    def __init__(self, wxyz=None, axis=None, angle=None):
        if wxyz is not None:
            self.q = np.asarray(wxyz, np.float64)
        else:
            axis = np.asarray(axis, np.float64)
            axis = axis / np.linalg.norm(axis)
            self.q = np.concatenate(
                [[np.cos(angle / 2)], np.sin(angle / 2) * axis])

    @property
    def inverse(self):
        w, x, y, z = self.q
        return Quaternion([w, -x, -y, -z])

    @property
    def rotation_matrix(self):
        w, x, y, z = self.q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]])

    def __mul__(self, other):
        w1, x1, y1, z1 = self.q
        w2, x2, y2, z2 = other.q
        return Quaternion([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    @property
    def yaw_pitch_roll(self):
        w, x, y, z = self.q
        yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
        return (yaw, 0.0, 0.0)


class Box:
    def __init__(self, center, size, orientation, velocity=(0, 0, 0)):
        self.center = np.asarray(center, np.float64)
        self.wlh = np.asarray(size, np.float64)
        self.orientation = orientation
        self.velocity = np.asarray(velocity, np.float64)

    def translate(self, v):
        self.center = self.center + v

    def rotate(self, q):
        R = q.rotation_matrix
        self.center = R @ self.center
        self.orientation = q * self.orientation
        self.velocity = R @ self.velocity


class LidarPointCloud:
    def __init__(self, points):
        self.points = points

    @classmethod
    def from_file(cls, path):
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
        return cls(pts[:, :4].T.astype(np.float64))

    def rotate(self, R):
        self.points[:3] = R @ self.points[:3]

    def translate(self, v):
        self.points[:3] = self.points[:3] + np.asarray(v)[:, None]


class FakeNusc:
    def __init__(self, root, tables, paths):
        self.dataroot = root
        self._tables = tables
        self._paths = paths
        self._vel = {}

    def get(self, table, token):
        return self._tables[table][token]

    def get_sample_data_path(self, token):
        return self._paths[token]

    def box_velocity(self, ann_token):
        return self._vel[ann_token]


def _install_fake_devkit(monkeypatch):
    pq = types.ModuleType("pyquaternion")
    pq.Quaternion = Quaternion
    nsc = types.ModuleType("nuscenes")
    dc = types.ModuleType("nuscenes.utils.data_classes")
    dc.Box = Box
    dc.LidarPointCloud = LidarPointCloud
    utils = types.ModuleType("nuscenes.utils")
    utils.data_classes = dc
    nsc.utils = utils
    monkeypatch.setitem(sys.modules, "pyquaternion", pq)
    monkeypatch.setitem(sys.modules, "nuscenes", nsc)
    monkeypatch.setitem(sys.modules, "nuscenes.utils", utils)
    monkeypatch.setitem(sys.modules, "nuscenes.utils.data_classes", dc)


def _yaw_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _fixture(tmp_path):
    """Two-camera, one-lidar fake scene with one annotation."""
    from tools_tpu.create_data import CAMS

    ego_t = np.array([10.0, 5.0, 0.0])
    ego_yaw = 0.3
    K = [[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]]

    tables = {"sample_data": {}, "calibrated_sensor": {}, "ego_pose": {},
              "sample_annotation": {}, "lidarseg": {}}
    paths = {}
    data = {}
    for cam in CAMS:
        tables["sample_data"][f"sd_{cam}"] = dict(
            calibrated_sensor_token=f"cs_{cam}",
            ego_pose_token="pose0", timestamp=1000)
        # camera at the ego origin looking +x (sensor z forward):
        # R maps camera (x right, y down, z fwd) -> ego (x fwd, y left)
        tables["calibrated_sensor"][f"cs_{cam}"] = dict(
            camera_intrinsic=K,
            rotation=[0.5, -0.5, 0.5, -0.5],
            translation=[1.0, 0.0, 1.5])
        tables["ego_pose"]["pose0"] = dict(
            rotation=_yaw_quat(ego_yaw), translation=ego_t.tolist())
        paths[f"sd_{cam}"] = os.path.join(
            str(tmp_path), "samples", cam, "img.jpg")
        data[cam] = f"sd_{cam}"

    # one car annotation 12 m ahead of the ego (global frame)
    R_e = Quaternion(_yaw_quat(ego_yaw)).rotation_matrix
    g_center = ego_t + R_e @ np.array([12.0, 1.0, 0.8])
    ann_yaw = ego_yaw + 0.5
    tables["sample_annotation"]["ann0"] = dict(
        category_name="vehicle.car", num_lidar_pts=5, num_radar_pts=0,
        translation=g_center.tolist(), size=[1.9, 4.5, 1.6],
        rotation=_yaw_quat(ann_yaw))
    # a barrier with zero points -> must be dropped
    tables["sample_annotation"]["ann1"] = dict(
        category_name="movable_object.barrier", num_lidar_pts=0,
        num_radar_pts=0, translation=[0, 0, 0], size=[1, 1, 1],
        rotation=_yaw_quat(0.0))
    v_global = R_e @ np.array([3.0, -1.0, 0.0])

    sample = dict(token="tok0", timestamp=1000, scene_token="scene0",
                  data=dict(data, LIDAR_TOP="sd_lidar"),
                  anns=["ann0", "ann1"])

    # lidar: identity calibration at the ego origin
    tables["sample_data"]["sd_lidar"] = dict(
        calibrated_sensor_token="cs_lidar", ego_pose_token="pose0",
        token="sd_lidar", timestamp=1000)
    tables["calibrated_sensor"]["cs_lidar"] = dict(
        rotation=[1, 0, 0, 0], translation=[0, 0, 0])
    tables["lidarseg"]["sd_lidar"] = dict(filename="lidarseg/seg.bin")
    # two points in the LIDAR frame (== ego frame): one 8 m ahead
    # (visible), one 8 m behind (behind every front camera)
    pts = np.zeros((2, 5), np.float32)
    pts[0, :3] = [8.0, 0.5, 1.0]
    pts[1, :3] = [-8.0, 0.0, 1.0]
    lid_path = os.path.join(str(tmp_path), "samples", "LIDAR_TOP",
                            "pc.bin")
    os.makedirs(os.path.dirname(lid_path), exist_ok=True)
    pts.reshape(-1).tofile(lid_path)
    paths["sd_lidar"] = lid_path
    seg = np.array([17, 24], np.uint8)          # car, drivable (bg)
    seg_path = os.path.join(str(tmp_path), "lidarseg", "seg.bin")
    os.makedirs(os.path.dirname(seg_path), exist_ok=True)
    seg.tofile(seg_path)

    nusc = FakeNusc(str(tmp_path), tables, paths)
    nusc._vel = {"ann0": v_global, "ann1": np.zeros(3)}
    expected = dict(ego_t=ego_t, ego_yaw=ego_yaw, g_center=g_center,
                    ann_yaw=ann_yaw, v_global=v_global, K=np.asarray(K))
    return nusc, sample, expected


def test_sample_info_gt_derivation(tmp_path, monkeypatch):
    _install_fake_devkit(monkeypatch)
    from tools_tpu.create_data import sample_info

    nusc, sample, exp = _fixture(tmp_path)
    info = sample_info(nusc, sample)
    boxes, labels = info["ann_infos"]
    boxes = np.asarray(boxes)
    # the zero-point barrier is dropped (num_lidar+num_radar <= 0)
    assert boxes.shape == (1, 9) and labels == [0]   # car
    R_inv = Quaternion(_yaw_quat(exp["ego_yaw"])).inverse.rotation_matrix
    want_center = R_inv @ (exp["g_center"] - exp["ego_t"])
    np.testing.assert_allclose(boxes[0, :3], want_center, atol=1e-5)
    # size (w, l, h) -> (dx=l, dy=w, dz=h)
    np.testing.assert_allclose(boxes[0, 3:6], [4.5, 1.9, 1.6],
                               atol=1e-6)
    # yaw is relative to the ego heading
    assert abs(boxes[0, 6] - 0.5) < 1e-5
    want_v = (R_inv @ exp["v_global"])[:2]
    np.testing.assert_allclose(boxes[0, 7:9], want_v, atol=1e-5)
    # camera block round-trips calibration verbatim
    assert info["cams"]["CAM_FRONT"]["cam_intrinsic"] == exp["K"].tolist()
    assert info["token"] == "tok0"


def test_point_label_projection(tmp_path, monkeypatch):
    _install_fake_devkit(monkeypatch)
    from tools_tpu.create_data import generate_point_labels

    nusc, sample, exp = _fixture(tmp_path)
    generate_point_labels(nusc, sample, str(tmp_path))
    out = np.load(os.path.join(str(tmp_path), "samples_point_label",
                               "CAM_FRONT", "img.npy"))
    # only the forward point survives (the rear one fails depth > 1 ...
    # it is behind the camera)
    assert out.shape == (4, 1)
    # hand geometry: lidar/ego point [8, .5, 1] -> camera frame
    # (cam at ego [1, 0, 1.5], x_cam = -y_ego, y_cam = -z_ego,
    #  z_cam = x_ego): p_cam = (-0.5, 0.5, 7.0)
    x, y, d, c = out[:, 0]
    assert abs(d - 7.0) < 1e-6
    u = 800.0 * (-0.5) / 7.0 + 800.0
    v = 800.0 * 0.5 / 7.0 + 450.0
    assert abs(x - u) < 1e-4 and abs(y - v) < 1e-4
    assert c == 17.0                                  # fg lidarseg id


def test_infos_pickle_feeds_pipeline(tmp_path, monkeypatch):
    """The tool's info dict is consumable by the real dataset layer
    (schema compatibility: data/infos.py expects these keys)."""
    _install_fake_devkit(monkeypatch)
    from tools_tpu.create_data import sample_info
    from ocrfdet_tpu.data import infos as INF

    nusc, sample, _ = _fixture(tmp_path)
    info = sample_info(nusc, sample)
    pkl = os.path.join(str(tmp_path), "infos.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info], "metadata": {"version": "mock"}}, f)
    loaded = INF.load_infos(pkl)
    assert len(loaded) == 1
    b, l = INF.ann_arrays(loaded[0])
    assert b.shape == (1, 9) and list(l) == [0]
