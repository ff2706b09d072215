"""torchvision->flax weight conversion, verified numerically against
torch.nn.functional (torchvision itself is not installed; we fabricate
a torchvision-layout state_dict and compare ops directly)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _fake_resnet18_sd(rng):
    """Minimal torchvision-resnet18-layout state_dict (random)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(
            np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.1, c).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    cin = 64
    for i, c in enumerate(chans):
        for j in range(2):
            t = f"layer{i + 1}.{j}"
            conv(f"{t}.conv1.weight", c, cin if j == 0 else c, 3)
            bn(f"{t}.bn1", c)
            conv(f"{t}.conv2.weight", c, c, 3)
            bn(f"{t}.bn2", c)
            if j == 0 and (i > 0):
                conv(f"{t}.downsample.0.weight", c, cin, 1)
                bn(f"{t}.downsample.1", c)
            if j == 0:
                cin = c
    return sd


def _torch_forward(sd, x):
    """Reference forward with torch.nn.functional on the state_dict."""
    import torch.nn.functional as F

    def conv(x, w, stride, pad):
        return F.conv2d(x, torch.from_numpy(w), stride=stride,
                        padding=pad)

    def bn(x, p):
        return F.batch_norm(
            x, torch.from_numpy(p[2]), torch.from_numpy(p[3]),
            torch.from_numpy(p[0]), torch.from_numpy(p[1]), eps=1e-5)

    def bnp(name):
        return (sd[f"{name}.weight"], sd[f"{name}.bias"],
                sd[f"{name}.running_mean"], sd[f"{name}.running_var"])

    t = conv(x, sd["conv1.weight"], 2, 3)
    t = F.relu(bn(t, bnp("bn1")))
    t = F.max_pool2d(t, 3, 2, 1)
    outs = []
    for i in range(4):
        for j in range(2):
            name = f"layer{i + 1}.{j}"
            stride = 2 if (i > 0 and j == 0) else 1
            y = F.relu(bn(conv(t, sd[f"{name}.conv1.weight"], stride, 1),
                          bnp(f"{name}.bn1")))
            y = bn(conv(y, sd[f"{name}.conv2.weight"], 1, 1),
                   bnp(f"{name}.bn2"))
            if f"{name}.downsample.0.weight" in sd:
                res = bn(conv(t, sd[f"{name}.downsample.0.weight"],
                              stride, 0), bnp(f"{name}.downsample.1"))
            else:
                res = t
            t = F.relu(res + y)
        outs.append(t.numpy())
    return outs


def test_resnet18_conversion_matches_torch_ops():
    import jax
    import jax.numpy as jnp
    from ocrfdet_tpu.models.resnet import ResNet
    from ocrfdet_tpu.utils.torch_weights import convert_resnet

    rng = np.random.default_rng(0)
    sd = _fake_resnet18_sd(rng)
    params, stats = convert_resnet(sd, depth=18)

    model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert (jax.tree.map(lambda a: a.shape, params)
            == jax.tree.map(lambda a: a.shape, variables["params"]))

    outs = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    with torch.no_grad():
        refs = _torch_forward(sd, torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))
    for j, (o, ref) in enumerate(zip(outs, refs)):
        o_nchw = np.transpose(np.asarray(o), (0, 3, 1, 2))
        # fp32 reassociation across deep conv stacks: loose tolerance
        np.testing.assert_allclose(o_nchw, ref, rtol=3e-3, atol=1e-3,
                                   err_msg=f"stage {j}")
