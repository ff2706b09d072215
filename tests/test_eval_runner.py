"""End-to-end eval: fake dataset -> model -> decode -> NMS -> metrics."""
import jax
import numpy as np
import pytest

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes
from ocrfdet_tpu.models.detector import OcRFDet
from ocrfdet_tpu.train.evaluate import run_eval

pytestmark = pytest.mark.slow


def test_run_eval_end_to_end(tmp_path):
    cfg = tiny_config(with_ocrf=True)
    pkl = build_fake_nuscenes(str(tmp_path), cfg, n_samples=2)
    ds = NuScenesDataset(cfg, pkl, is_train=False, cbgs=False)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                    num_workers=1)
    model = OcRFDet(cfg)
    from ocrfdet_tpu.train.evaluate import _device_batch
    batch = next(loader.epoch(0))
    variables = model.init(jax.random.PRNGKey(0), _device_batch(batch),
                           train=True)
    out_json = str(tmp_path / "results.json")
    metrics = run_eval(cfg, model, variables["params"],
                       variables["batch_stats"], loader,
                       out_json=out_json, max_batches=1)
    assert set(metrics) >= {"mAP", "NDS", "mATE"}
    assert 0.0 <= metrics["mAP"] <= 1.0
    import json, os
    assert os.path.exists(out_json)
    res = json.loads(open(out_json).read())
    assert len(res["results"]) == 2


def test_run_eval_sharded_mesh(tmp_path):
    """run_eval over a 2-device mesh (parallel/step.py build_eval_step)
    produces the same metrics as the single-device path."""
    from ocrfdet_tpu.parallel.mesh import make_mesh
    cfg = tiny_config(with_ocrf=True)
    pkl = build_fake_nuscenes(str(tmp_path), cfg, n_samples=2)
    ds = NuScenesDataset(cfg, pkl, is_train=False, cbgs=False)
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                    num_workers=1)
    model = OcRFDet(cfg)
    from ocrfdet_tpu.train.evaluate import _device_batch
    batch = next(loader.epoch(0))
    variables = model.init(jax.random.PRNGKey(0), _device_batch(batch),
                           train=True)
    mesh = make_mesh(data=2, space=1, devices=jax.devices()[:2])
    m_sharded = run_eval(cfg, model, variables["params"],
                         variables["batch_stats"], loader,
                         max_batches=1, mesh=mesh)
    m_single = run_eval(cfg, model, variables["params"],
                        variables["batch_stats"], loader,
                        max_batches=1)
    np.testing.assert_allclose(m_sharded["mAP"], m_single["mAP"],
                               atol=1e-6)
    np.testing.assert_allclose(m_sharded["NDS"], m_single["NDS"],
                               atol=1e-6)
