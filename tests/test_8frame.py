"""8-frame temporal variant (num_adj=7): the 9-frame graph builds,
trains, and lays temporal BEV slots out exactly as the reference.

The reference's test-set results rest on the multi_adj_frame_id_cfg=
(1,8,1) config (README.md:46-47); its frame plumbing is
`BEVStereo4D.extract_img_feat` (detectors/bevdet.py:664-723): fid loops
num_frame-1 .. 0, the stereo extra-ref frame is consumed for the cost
volume only, every other frame appends its BEV feature, so the channel
concat is oldest..key; with with_prev=False the adjacent blocks are
zeros and the key frame keeps the LAST C-channel block
(bevdet.py:699-714).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.synthetic import make_batch
from ocrfdet_tpu.models.detector import OcRFDet

pytestmark = pytest.mark.slow


def _to_jnp(batch):
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}


def _bev_cat(model, variables, batch):
    _, inter = model.apply(variables, batch, train=False,
                           mutable=["intermediates"])
    return np.asarray(inter["intermediates"]["bev_cat"][0], np.float32)


def test_8f_temporal_slot_layout():
    """9-frame (7 adj + key + stereo ref) forward; pin slot order."""
    cfg = tiny_config(num_adj=7, with_ocrf=False)
    assert cfg.num_frames == 8 and cfg.total_frames == 9
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=1, seed=0))
    assert batch["imgs"].shape[1] == 9

    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    fwd = jax.jit(lambda b: model.apply(
        variables, b, train=False, mutable=["intermediates"]))

    def bev_cat(b):
        return np.asarray(
            fwd(b)[1]["intermediates"]["bev_cat"][0], np.float32)

    C = cfg.vt.out_channels
    base = bev_cat(batch)
    assert base.shape[-1] == C * cfg.num_frames

    # with_prev=0: reference zeroes every adjacent block, key keeps the
    # LAST block (bevdet.py:699-714 builds [zeros(7C), key]).
    b0 = dict(batch)
    b0["with_prev"] = jnp.asarray(0.0, jnp.float32)
    cat0 = bev_cat(b0)
    assert np.all(cat0[..., : C * (cfg.num_frames - 1)] == 0.0)
    assert np.abs(cat0[..., -C:]).max() > 0.0

    # perturb frame f=3's images: blocks of OLDER frames (f=7..4 ->
    # slots 0..3) are untouched; frame 3's own slot (index
    # num_frames-1-f = 4) must move. (Frame 2 may also move: frame 3's
    # stem is its stereo cost-volume partner.)
    f = 3
    bp = dict(batch)
    imgs = np.asarray(batch["imgs"]).copy()
    imgs[:, f] += 3.0
    bp["imgs"] = jnp.asarray(imgs)
    catp = bev_cat(bp)
    slot = cfg.num_frames - 1 - f
    for s in range(slot):
        np.testing.assert_allclose(
            catp[..., s * C:(s + 1) * C], base[..., s * C:(s + 1) * C],
            rtol=0, atol=1e-6, err_msg=f"older slot {s} moved")
    delta = np.abs(catp[..., slot * C:(slot + 1) * C]
                   - base[..., slot * C:(slot + 1) * C]).max()
    assert delta > 1e-4, "perturbed frame's own slot did not move"


def test_8f_full_graph_train_step():
    """The full 8f OcRF graph (stereo + render branch) takes one
    gradient step with finite loss/grads at tiny scale."""
    cfg = tiny_config(num_adj=7, with_ocrf=True)
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=1, seed=1))
    # train=True so the render-branch params exist
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)

    from ocrfdet_tpu.train.trainstep import compute_losses, total_loss

    def loss_fn(params):
        (preds, aux), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return total_loss(compute_losses(cfg, preds, aux, batch))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"])
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
