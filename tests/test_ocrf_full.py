"""Full OcRF pipeline test on the tiny config: dual-branch BEV, NeRF +
Gaussian rendering, HOA, all losses, and gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.synthetic import make_batch
from ocrfdet_tpu.models.detector import OcRFDet
from ocrfdet_tpu.train.trainstep import compute_losses, total_loss
import pytest

pytestmark = pytest.mark.slow

EXPECTED_LOSS_KEYS = {
    "loss_depth", "loss_ce_semantic", "loss_gs_color", "loss_gs_ssim",
    "loss_render_depth", "mask_ce_loss", "mask_dice_loss",
    "mask_ce_opacity_loss", "mask_dice_opacity_loss",
}


def _to_jnp(batch):
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}


def _setup():
    cfg = tiny_config(with_ocrf=True)
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=2, seed=0))
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    return cfg, model, batch, variables


def test_ocrf_forward_and_losses():
    cfg, model, batch, variables = _setup()
    # render heads exist because init ran with train=True
    assert "S_MLP" in variables["params"]["img_view_transformer"]
    (preds, aux), _ = model.apply(
        variables, batch, train=True, mutable=["batch_stats"])
    H, W = cfg.data.input_size
    assert aux["render_img"].shape == (2, H, W, 3)
    assert aux["render_depth"].shape == (2, H, W)
    assert aux["bev_mask_logit"].shape == (2, cfg.vt.bev_h, cfg.vt.bev_w, 1)
    assert aux["opacity_bev_logit"].shape == (2, cfg.vt.bev_h,
                                              cfg.vt.bev_w, 1)

    losses = compute_losses(cfg, preds, aux, batch)
    assert EXPECTED_LOSS_KEYS.issubset(losses.keys())
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert np.isfinite(float(total_loss(losses)))


def test_ocrf_eval_path_skips_render():
    cfg, model, batch, variables = _setup()
    preds, aux = model.apply(variables, batch, train=False)
    assert "render_img" not in aux
    assert "opacity_bev_logit" in aux           # HOA still gates eval
    assert preds[0]["heatmap"].shape[0] == 2


def test_ocrf_gradients_reach_render_heads():
    cfg, model, batch, variables = _setup()

    def loss_fn(params):
        (preds, aux), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return total_loss(compute_losses(cfg, preds, aux, batch))

    grads = jax.grad(loss_fn)(variables["params"])

    def gsum(tree):
        return float(sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                         for g in jax.tree.leaves(tree)))

    vt = grads["img_view_transformer"]
    assert gsum(vt["S_MLP"]) > 0          # scale MLP via splat grads
    assert gsum(vt["C_MLP"]) > 0
    assert gsum(vt["A_MLP"]) > 0          # opacity via splat + HOA
    assert gsum(vt["sigma"]) > 0          # nerf sigma
    assert gsum(vt["defor_cross_attention"]) > 0
    assert gsum(vt["OpacityVoxelToBEV"]) > 0
    assert gsum(grads["img_backbone"]) > 0
    assert np.isfinite(gsum(grads))
