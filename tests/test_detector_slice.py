"""End-to-end forward test of the BEVDepth-style slice (no OcRF) on the
tiny CPU config: backbone -> FPN -> DepthNet(+stereo cv) -> splat ->
temporal concat -> BEV encoder -> CenterHead -> losses -> decode."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.core.coder import decode_all_tasks
from ocrfdet_tpu.data.synthetic import make_batch
from ocrfdet_tpu.losses.center import center_head_loss
from ocrfdet_tpu.losses.depth import (build_depth_semantic_labels,
                                      depth_semantic_loss)
from ocrfdet_tpu.models.detector import OcRFDet
import pytest

pytestmark = pytest.mark.slow


def _to_jnp(batch):
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}


def test_slice_forward_loss_decode():
    cfg = tiny_config(with_ocrf=False)
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=1, seed=0))

    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n_params > 1e6

    (preds, aux), _ = model.apply(
        variables, batch, train=True, mutable=["batch_stats"])
    bev_hw = cfg.vt.bev_h
    assert preds[0]["heatmap"].shape == (1, bev_hw, bev_hw, 1)
    D = cfg.grid.num_depth_bins
    N = cfg.data.num_cams
    h = cfg.data.input_size[0] // cfg.vt.downsample
    w = cfg.data.input_size[1] // cfg.vt.downsample
    assert aux["depth"].shape == (1, N, h, w, D)
    assert aux["semantic"].shape == (1, N, h, w, 2)

    # losses
    tgts = {k: [jnp.asarray(t) for t in batch[k]]
            for k in ("heatmaps", "anno_boxes", "inds", "masks")}
    losses = center_head_loss(preds, tgts, cfg.head.code_weights)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    BN = 1 * N
    gt_depth = batch["gt_depth"].reshape(BN, *batch["gt_depth"].shape[2:])
    gt_sem = batch["gt_semantic"].reshape(BN, *batch["gt_semantic"].shape[2:])
    d_onehot, s_onehot, valid = build_depth_semantic_labels(
        gt_depth, gt_sem, cfg.grid.depth, D, cfg.vt.downsample)
    assert d_onehot.shape == (BN, h, w, D)
    dl, sl = depth_semantic_loss(
        aux["depth"].reshape(BN, h, w, D),
        aux["semantic"].reshape(BN, h, w, 2),
        d_onehot, s_onehot, valid,
        cfg.vt.loss_depth_weight, cfg.vt.loss_semantic_weight)
    assert np.isfinite(float(dl)) and np.isfinite(float(sl))
    assert float(dl) > 0

    # decode runs and produces sane shapes
    decoded = decode_all_tasks(preds, cfg.head, cfg.grid)
    assert decoded[0].boxes.shape == (1, cfg.head.max_num, 9)


def test_slice_gradients_flow():
    cfg = tiny_config(with_ocrf=False)
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=1, seed=1))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        (preds, aux), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        tgts = {k: [jnp.asarray(t) for t in batch[k]]
                for k in ("heatmaps", "anno_boxes", "inds", "masks")}
        losses = center_head_loss(preds, tgts, cfg.head.code_weights)
        return sum(jax.tree.leaves(losses))

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # backbone receives gradient through the splat
    bb = grads["img_backbone"]
    bb_norm = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                  for g in jax.tree.leaves(bb))
    assert float(bb_norm) > 0
