import numpy as np
import jax.numpy as jnp

from ocrfdet_tpu.geometry import quaternion as q
from ocrfdet_tpu.geometry import transforms as T
from ocrfdet_tpu.geometry import frustum as F


def test_quat_identity_and_yaw():
    np.testing.assert_allclose(q.quat_to_matrix([1, 0, 0, 0]), np.eye(3))
    yaw = 0.3
    m = q.quat_to_matrix([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
    np.testing.assert_allclose(m, q.yaw_matrix(yaw), atol=1e-12)


def test_inv_se3():
    rng = np.random.default_rng(0)
    m = q.se3_from_quat(rng.normal(size=4), rng.normal(size=3))
    np.testing.assert_allclose(q.inv_se3(m) @ m, np.eye(4), atol=1e-12)


def test_sid_depth_bins():
    bins = F.sid_depth_bins((1.0, 60.0, 0.5))
    assert bins.shape == (118,)
    assert np.isclose(bins[0], 1.0)
    assert np.isclose(bins[-1], 59.0)
    # log-spaced: ratios constant
    r = bins[1:] / bins[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-10)


def test_frustum_shape_and_range():
    fr = F.make_frustum((1.0, 60.0, 0.5), (256, 704), 16)
    assert fr.shape == (118, 16, 44, 3)
    assert fr[..., 0].max() == 703 and fr[..., 1].max() == 255


def test_frustum_to_ego_identity_cam():
    """With identity extrinsics/aug and K=I, ego point = (u*d, v*d, d)."""
    fr = F.make_frustum((1.0, 5.0, 1.0), (4, 8), 2)
    B, N = 1, 1
    eye3 = jnp.eye(3)[None, None]
    zero3 = jnp.zeros((1, 1, 3))
    pts = F.frustum_to_ego(jnp.asarray(fr), eye3, zero3, eye3, eye3, zero3,
                           jnp.eye(3)[None])
    expect = np.concatenate(
        [fr[..., 0:1] * fr[..., 2:3], fr[..., 1:2] * fr[..., 2:3],
         fr[..., 2:3]], -1)
    np.testing.assert_allclose(np.asarray(pts)[0, 0], expect, rtol=1e-5)


def test_frustum_to_ego_roundtrip():
    """Project the unprojected points back through K/extrinsics."""
    rng = np.random.default_rng(1)
    fr = F.make_frustum((1.0, 9.0, 2.0), (8, 16), 4)
    K = np.array([[100.0, 0, 8], [0, 100.0, 4], [0, 0, 1]])
    rot = q.quat_to_matrix(rng.normal(size=4))
    tran = rng.normal(size=3)
    post_rot2, post_tran2 = T.fold_img_aug(0.5, (1, 2, 9, 6), True, 3.0)
    post_rot, post_tran = T.expand_post_3x3(post_rot2, post_tran2)
    bda = T.bda_matrix(10.0, 1.02, True, False)

    pts = F.frustum_to_ego(
        jnp.asarray(fr), jnp.asarray(rot)[None, None],
        jnp.asarray(tran)[None, None], jnp.asarray(K)[None, None],
        jnp.asarray(post_rot)[None, None], jnp.asarray(post_tran)[None, None],
        jnp.asarray(bda)[None])
    pts = np.asarray(pts)[0, 0].reshape(-1, 3)

    # manual forward projection: ego -> cam -> image -> aug
    cam = (np.linalg.inv(rot) @ (np.linalg.inv(bda) @ pts.T - tran[:, None]))
    uvd = K @ cam
    uv = uvd[:2] / uvd[2]
    aug = post_rot[:2, :2] @ uv + post_tran[:2, None]
    expect = fr.reshape(-1, 3)
    np.testing.assert_allclose(aug.T, expect[:, :2], atol=1e-3)
    np.testing.assert_allclose(uvd[2], expect[:, 2], atol=1e-4)


def test_voxel_indices_trunc_toward_zero():
    # the reference .long() cast keeps (-1, 0) fractional coords in cell 0
    coor = jnp.array([[-0.5, 0.5, 0.5], [-1.5, 0.5, 0.5], [7.9, 0.2, 0.1]])
    idx, valid = F.voxel_indices(
        coor, (-4.0, -4.0, 0.0), (1.0, 1.0, 1.0), (8, 8, 1))
    assert bool(valid[0]) and bool(valid[1])
    assert int(idx[0, 0]) == 3
    assert int(idx[1, 0]) == 2
    assert not bool(valid[2])  # x == 11.9 out of range


def test_ht_reference_points():
    ref = F.ht_reference_points(4, 4, num_height=13)
    assert ref.shape == (13, 16, 3)
    assert ref.min() >= 0.0 and ref.max() <= 1.0
    # first 5 z values span [3/8, 7/8]
    np.testing.assert_allclose(ref[0, 0, 2], 3.0 / 8.0)
    np.testing.assert_allclose(ref[4, 0, 2], 7.0 / 8.0)


def test_project_points_pinhole():
    """A point 10m in front of a forward camera lands near the centre."""
    K = jnp.array([[[[200.0, 0, 88.0], [0, 200.0, 32.0], [0, 0, 1]]]])
    # camera axes: x right, y down, z forward; ego: x fwd -> cam z
    rot = jnp.array([[[[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]]]])  # cam2ego
    tran = jnp.zeros((1, 1, 3))
    eye3 = jnp.eye(3)[None, None]
    zero3 = jnp.zeros((1, 1, 3))
    l2i, aug = F.ego_to_image(rot, tran, K, eye3, zero3, jnp.eye(3)[None])
    # normalised ref point that maps to ego (10, 0, 0): pc_range centred
    pc_range = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    ref = jnp.array([[[0.6, 0.5, 5.0 / 8.0]]])  # x=10, y=0, z=0
    uvd, valid = F.project_points(ref, pc_range, (1.0, 60.0), l2i, aug,
                                  (64, 176))
    u, v, d = np.asarray(uvd).reshape(3)
    assert bool(np.asarray(valid).reshape(()))
    np.testing.assert_allclose(u * 176, 88.0, atol=1e-3)
    np.testing.assert_allclose(v * 64, 32.0, atol=1e-3)
    np.testing.assert_allclose(d, (10.0 - 1.0) / 59.0, atol=1e-5)


def test_camera_mlp_input_shape():
    B, N = 2, 6
    rng = np.random.default_rng(2)
    out = T.camera_mlp_input(
        jnp.asarray(rng.normal(size=(B, N, 3, 3))),
        jnp.asarray(rng.normal(size=(B, N, 3))),
        jnp.asarray(rng.normal(size=(B, N, 3, 3))),
        jnp.asarray(rng.normal(size=(B, N, 3, 3))),
        jnp.asarray(rng.normal(size=(B, N, 3))),
        jnp.asarray(rng.normal(size=(B, 3, 3))))
    assert out.shape == (B, N, 27)
