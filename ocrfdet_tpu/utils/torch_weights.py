"""torchvision ResNet -> flax parameter conversion.

The reference initialises its image backbone from torchvision
pretrained weights (configs/ocrfdet/ocrfdet.py:49 'torchvision://
resnet50'). This converter maps a torchvision state_dict (from a local
.pth file — no network access) onto ocrfdet_tpu.models.resnet.ResNet's
variable tree. Only called explicitly; torch is imported lazily.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _conv(sd, key):
    return jnp.asarray(np.transpose(sd[key], (2, 3, 1, 0)))


def _bn(sd, prefix):
    return dict(
        scale=jnp.asarray(sd[f"{prefix}.weight"]),
        bias=jnp.asarray(sd[f"{prefix}.bias"]),
        mean=jnp.asarray(sd[f"{prefix}.running_mean"]),
        var=jnp.asarray(sd[f"{prefix}.running_var"]),
    )


def convert_resnet(state_dict: Dict[str, np.ndarray], depth: int = 50):
    """Returns (params, batch_stats) trees for models.resnet.ResNet."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    layers = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
              50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    bottleneck = depth >= 50
    params: dict = {}
    stats: dict = {}

    def put_convbn(name, conv_w, bn):
        params[name] = {"Conv_0": {"kernel": conv_w},
                        "BatchNorm_0": {"scale": bn["scale"],
                                        "bias": bn["bias"]}}
        stats[name] = {"BatchNorm_0": {"mean": bn["mean"],
                                       "var": bn["var"]}}

    put_convbn("stem", _conv(sd, "conv1.weight"), _bn(sd, "bn1"))
    for i, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            t = f"layer{i + 1}.{j}"
            f = f"layer{i + 1}_{j}"
            blk_p: dict = {}
            blk_s: dict = {}

            def sub(name, conv_key, bn_key):
                blk_p[name] = {
                    "Conv_0": {"kernel": _conv(sd, conv_key)},
                    "BatchNorm_0": {
                        "scale": jnp.asarray(sd[f"{bn_key}.weight"]),
                        "bias": jnp.asarray(sd[f"{bn_key}.bias"])}}
                blk_s[name] = {"BatchNorm_0": {
                    "mean": jnp.asarray(sd[f"{bn_key}.running_mean"]),
                    "var": jnp.asarray(sd[f"{bn_key}.running_var"])}}

            n_convs = 3 if bottleneck else 2
            for c in range(n_convs):
                sub(f"ConvBN_{c}", f"{t}.conv{c + 1}.weight",
                    f"{t}.bn{c + 1}")
            if f"{t}.downsample.0.weight" in sd:
                sub("downsample", f"{t}.downsample.0.weight",
                    f"{t}.downsample.1")
            params[f] = blk_p
            stats[f] = blk_s
    return params, stats


def load_torchvision_resnet(path: str, depth: int = 50):
    """Load a local torchvision .pth checkpoint and convert."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()
          if isinstance(v, torch.Tensor)}
    return convert_resnet(sd, depth)


def apply_backbone_weights(variables, params_bb, stats_bb,
                           key: str = "img_backbone"):
    """Graft converted backbone weights into a full model variable
    tree, verifying shapes."""
    variables = jax.tree.map(lambda x: x, variables)  # shallow copy

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}/{k}")
            else:
                if dst[k].shape != v.shape:
                    raise ValueError(
                        f"{path}/{k}: {dst[k].shape} vs {v.shape}")
                dst[k] = v.astype(dst[k].dtype)

    merge(variables["params"][key], params_bb)
    merge(variables["batch_stats"][key], stats_bb)
    return variables
