"""Data-parallel train step on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from ocrfdet_tpu.config import tiny_config
from ocrfdet_tpu.data.synthetic import make_batch
from ocrfdet_tpu.models.detector import OcRFDet
from ocrfdet_tpu.parallel.mesh import make_mesh, batch_sharding
from ocrfdet_tpu.parallel.step import build_train_step
from ocrfdet_tpu.train.optim import (TrainState, create_train_state,
                                     make_optimizer, is_render_param,
                                     ema_decay)
import pytest

pytestmark = pytest.mark.slow


def _to_jnp(batch):
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}


def test_render_param_matching():
    import jax.tree_util as jtu
    fake = {"img_view_transformer": {"S_MLP": {"mlp": {"fc1": 0}},
                                     "lss": {"depth_net": {"x": 0}}}}
    flags = jtu.tree_map_with_path(lambda p, _: is_render_param(p), fake)
    assert flags["img_view_transformer"]["S_MLP"]["mlp"]["fc1"]
    assert not flags["img_view_transformer"]["lss"]["depth_net"]["x"]


def test_ema_decay_ramp():
    from ocrfdet_tpu.config import OptimConfig
    cfg = OptimConfig()
    d0 = float(ema_decay(cfg, jnp.asarray(0)))
    assert 0.99 < d0 < 0.999  # pre-warmed counter -> near-full decay
    d_inf = float(ema_decay(cfg, jnp.asarray(10 ** 7)))
    np.testing.assert_allclose(d_inf, cfg.ema_decay, rtol=1e-6)


def test_dp_train_step_runs_and_updates():
    assert jax.device_count() == 8
    cfg = tiny_config(with_ocrf=False)
    mesh = make_mesh(data=8, space=1)
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=8, seed=0))

    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    tx = make_optimizer(cfg.optim, variables["params"], steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(cfg, model, tx, mesh)

    # the step donates its input state: snapshot before stepping
    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    state2, metrics = step_fn(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    # params changed
    p1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(p0, np.asarray(p1))
    # second step reuses the compiled program
    state3, metrics3 = step_fn(state2, batch)
    assert int(state3.step) == 2


def test_dp_step_deterministic_and_2axis_mesh():
    """Same batch + state -> identical metrics; 2-axis (4x2) mesh
    compiles (space axis currently replicates spatial work)."""
    cfg = tiny_config(with_ocrf=False)
    model = OcRFDet(cfg)
    batch = _to_jnp(make_batch(cfg, batch_size=8, seed=1))
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    tx = make_optimizer(cfg.optim, variables["params"], steps_per_epoch=100)

    mesh = make_mesh(data=4, space=2)
    state = create_train_state(variables, tx)
    step_fn = build_train_step(cfg, model, tx, mesh)
    # the step donates its input: run from two identical copies
    _, m1 = step_fn(jax.tree.map(jnp.copy, state), batch)
    _, m2 = step_fn(state, batch)
    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=0)
    assert np.isfinite(float(m1["loss_total"]))


def test_camera_sharding_matches_replicated():
    """shard_cameras over a 2-way space axis == unsharded result."""
    import dataclasses
    from ocrfdet_tpu.config import ParallelConfig
    base = tiny_config(with_ocrf=False)
    batch = _to_jnp(make_batch(base, batch_size=4, seed=2))

    def run(shard):
        cfg = dataclasses.replace(
            base, parallel=ParallelConfig(space_axis=2,
                                          shard_cameras=shard))
        model = OcRFDet(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        tx = make_optimizer(cfg.optim, variables["params"],
                            steps_per_epoch=100)
        mesh = make_mesh(data=4, space=2)
        state = create_train_state(variables, tx)
        step = build_train_step(cfg, model, tx, mesh)
        new_state, metrics = step(state, batch)
        return new_state, metrics

    s_rep, m_rep = run(False)
    s_shd, m_shd = run(True)
    # BN normalises per-shard camera subsets when sharded (DDP-like
    # semantics); with 1 camera per shard the statistics differ
    # noticeably, so this only guards against gross errors (a
    # double-counted gradient or missing gather shifts the loss and
    # params by O(1), far beyond BN jitter).
    np.testing.assert_allclose(float(m_shd["loss_total"]),
                               float(m_rep["loss_total"]), rtol=0.1)
    worst = max(
        float(np.max(np.abs(np.asarray(a, np.float64)
                            - np.asarray(b, np.float64))))
        for a, b in zip(jax.tree.leaves(s_rep.params),
                        jax.tree.leaves(s_shd.params)))
    assert worst < 2e-2, worst
