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


def test_deep_camera_sharding_ocrf_eval_matches():
    """Phase-2 spatial sharding (shard_vt): the OcRF eval forward with
    the VT interior sharded over a 2-way space axis equals the
    unsharded forward (eval mode: BN running stats, no dropout — the
    only differences are cross-camera reduction orders)."""
    import dataclasses
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ocrfdet_tpu.config import ParallelConfig

    base = tiny_config(with_ocrf=True)
    batch = _to_jnp(make_batch(base, batch_size=2, seed=3))
    model_rep = OcRFDet(base)
    variables = model_rep.init(jax.random.PRNGKey(0), batch, train=True)
    preds_rep, aux_rep = model_rep.apply(variables, batch, train=False)

    cfg_sh = dataclasses.replace(
        base, parallel=ParallelConfig(space_axis=2, shard_cameras=True,
                                      shard_vt=True))
    model_sh = OcRFDet(cfg_sh)
    mesh = make_mesh(data=1, space=2, devices=jax.devices()[:2])

    def local(params, bstats, b):
        return model_sh.apply({"params": params, "batch_stats": bstats},
                              b, train=False)

    preds_sh, aux_sh = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False))(variables["params"], variables["batch_stats"],
                          batch)
    for t_rep, t_sh in zip(preds_rep, preds_sh):
        for k in t_rep:
            np.testing.assert_allclose(
                np.asarray(t_rep[k], np.float32),
                np.asarray(t_sh[k], np.float32), rtol=2e-3, atol=2e-4,
                err_msg=k)
    np.testing.assert_allclose(np.asarray(aux_rep["depth"]),
                               np.asarray(aux_sh["depth"]),
                               rtol=2e-3, atol=2e-4)
    assert aux_sh["depth"].shape == aux_rep["depth"].shape


def test_deep_camera_sharding_cuts_per_device_flops():
    """shard_vt must REDUCE the per-device program: the compiled train
    step's cost-analysis flops with the VT interior sharded are
    measurably below the gather-then-replicate variant on the same
    data=2 x space=2 mesh."""
    import dataclasses
    from ocrfdet_tpu.config import ParallelConfig
    from ocrfdet_tpu.utils.runtime import shard_batch, shard_state

    base = tiny_config(with_ocrf=True)
    batch = _to_jnp(make_batch(base, batch_size=2, seed=4))
    mesh = make_mesh(data=2, space=2, devices=jax.devices()[:4])

    def flops(shard_vt):
        cfg = dataclasses.replace(
            base, parallel=ParallelConfig(space_axis=2,
                                          shard_cameras=True,
                                          shard_vt=shard_vt))
        model = OcRFDet(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        tx = make_optimizer(cfg.optim, variables["params"],
                            steps_per_epoch=100)
        state = shard_state(mesh, create_train_state(variables, tx))
        b = shard_batch(mesh, batch)
        step = build_train_step(cfg, model, tx, mesh)
        cost = step.lower(state, b).compile().cost_analysis()
        return float(cost["flops"])

    f_deep = flops(True)
    f_gather = flops(False)
    # at TINY scale the backbone (sharded in both variants) dominates,
    # so the interior-sharding delta is a few percent; at flagship
    # scale the VT interior (stereo CV + DepthNet + NeRF resize) is
    # the majority of post-encoder FLOPs. Guard that the delta exists
    # and has the right sign; magnitude is validated by the flagship
    # cost analysis in the round bench notes.
    assert f_deep < 0.98 * f_gather, (f_deep, f_gather)
