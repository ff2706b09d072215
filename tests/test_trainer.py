"""Trainer loop: one step on fake data, checkpoint save + resume."""
import numpy as np

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes
from ocrfdet_tpu.train.trainer import Trainer
import pytest

pytestmark = pytest.mark.slow


def test_trainer_step_and_resume(tmp_path):
    cfg = tiny_config(with_ocrf=False, batch_size=2)
    pkl = build_fake_nuscenes(str(tmp_path / "data"), cfg, n_samples=4)
    ds = NuScenesDataset(cfg, pkl, is_train=True, cbgs=False)
    loader = Loader(ds, batch_size=2, num_workers=1)

    work = str(tmp_path / "work")
    trainer = Trainer(cfg, work, steps_per_epoch=len(loader))
    trainer.init_state()
    assert trainer.state is not None

    # epoch 0: temporal fusion off (SequentialControlHook equivalent)
    wp, ubm = trainer.epoch_flags(0)
    assert wp == 0.0 and ubm == 0.0
    wp2, ubm2 = trainer.epoch_flags(3)
    assert wp2 == 1.0 and ubm2 == 1.0

    n = trainer.run_epoch(loader, epoch=0, max_steps=1, log_every=1)
    assert n == 1
    assert int(trainer.state.step) == 1
    trainer.save(0)

    t2 = Trainer(cfg, work, steps_per_epoch=len(loader))
    t2.init_state()
    start = t2.resume()
    assert start == 1
    assert int(t2.state.step) == 1
    p_old = np.asarray(
        __import__("jax").tree.leaves(trainer.state.params)[0])
    p_new = np.asarray(
        __import__("jax").tree.leaves(t2.state.params)[0])
    np.testing.assert_allclose(p_old, p_new)
    # metrics log written
    import os
    assert os.path.exists(os.path.join(work, "metrics.jsonl"))
