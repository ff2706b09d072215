"""Evaluate OcRFDet-TPU (EMA weights) on a val info file.

  python tools_tpu/eval.py --infos data/bevdetv2-nuscenes_infos_val.pkl \
      --ckpt work/ocrfdet/ckpt_epoch_19 [--out results.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--infos", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=0)
    args = ap.parse_args()

    import jax
    import orbax.checkpoint as ocp

    from ocrfdet_tpu.config import ocrfdet_config, tiny_config
    from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
    from ocrfdet_tpu.models.detector import OcRFDet
    from ocrfdet_tpu.train.evaluate import run_eval

    cfg = tiny_config() if args.tiny else ocrfdet_config()
    model = OcRFDet(cfg)
    dataset = NuScenesDataset(cfg, args.infos, is_train=False, cbgs=False)
    loader = Loader(dataset, args.batch_size, shuffle=False,
                    drop_last=False,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(args.ckpt))
    # frozen (teacher) leaves live as placeholders in the stored EMA
    # (train/optim.py ema_init_tree); substitute the raw values back
    from ocrfdet_tpu.train.optim import resolve_ema
    params = resolve_ema(state["params"], state["ema_params"])
    batch_stats = resolve_ema(state["batch_stats"],
                              state["ema_batch_stats"])

    token_to_pose = {
        info["token"]: dict(
            ego2global_rotation=info["cams"]["CAM_FRONT"]
            ["ego2global_rotation"],
            ego2global_translation=info["cams"]["CAM_FRONT"]
            ["ego2global_translation"])
        for info in dataset.infos}

    # shard eval over the data axis; single-device runs degrade to a
    # 1-way mesh. In a multi-process run every process must own
    # addressable devices in the mesh (make_array_from_process_local_
    # data places each process's local batch rows), so the device
    # subset takes an equal per-process prefix rather than
    # jax.devices()[:n] (which is process 0's devices first).
    import jax
    from ocrfdet_tpu.parallel.mesh import make_mesh
    if jax.process_count() > 1:
        per_proc = min(loader.local_batch_size, jax.local_device_count())
        by_proc: dict = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, []).append(d)
        devs = [d for p in sorted(by_proc) for d in by_proc[p][:per_proc]]
    else:
        devs = jax.devices()[:min(jax.device_count(),
                                  loader.local_batch_size)]
    mesh = make_mesh(data=len(devs), space=1, devices=devs)
    metrics = run_eval(cfg, model, params, batch_stats, loader,
                       out_json=args.out,
                       max_batches=args.max_batches or None,
                       token_to_pose=token_to_pose, mesh=mesh)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
