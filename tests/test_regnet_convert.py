"""RegNet checkpoint conversion parity (reference
`tools/regnet2mmdet.py` naming; torch replica executed directly)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfdet_tpu.nn.regnet import NoStemRegNet  # noqa: E402
from nerfdet_tpu.utils.weight_convert import convert_regnet  # noqa: E402


class TorchXBlock(tnn.Module):
    def __init__(self, c_in, c_out, group_w, stride):
        super().__init__()
        g = min(group_w, c_out)
        self.conv1 = tnn.Conv2d(c_in, c_out, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c_out, eps=1e-3)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, stride, 1,
                                groups=c_out // g, bias=False)
        self.bn2 = tnn.BatchNorm2d(c_out, eps=1e-3)
        self.conv3 = tnn.Conv2d(c_out, c_out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(c_out, eps=1e-3)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(c_in, c_out, 1, stride, bias=False),
                tnn.BatchNorm2d(c_out, eps=1e-3))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + idt)


def test_single_stage_parity():
    torch.manual_seed(0)
    # one stage of 2 blocks: 64 -> 32 stride 2, then 32 -> 32
    blocks = tnn.ModuleList([TorchXBlock(64, 32, 16, 2),
                             TorchXBlock(32, 32, 16, 1)])
    for m in blocks.modules():
        if isinstance(m, tnn.BatchNorm2d):
            tnn.init.normal_(m.weight, 1.0, 0.1)
            tnn.init.normal_(m.bias, 0.0, 0.1)
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    blocks.eval()

    state = {}
    for b, blk in enumerate(blocks):
        for k, v in blk.state_dict().items():
            state[f"layer1.{b}.{k}"] = v
    # rename downsample.{0,1} (torch Sequential) to the mmdet layout
    state = {k.replace("downsample.0", "downsample.0")
             .replace("downsample.1", "downsample.1"): v
             for k, v in state.items()}

    net = NoStemRegNet(arch=dict(w0=32, wa=1e-9, wm=2.0, group_w=16,
                                 depth=2),
                       strides=(2,), out_indices=(0,))
    x = np.random.RandomState(0).randn(1, 8, 8, 64).astype(np.float32)
    vars0 = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    conv = convert_regnet(state, depths=(2,))

    # graft converted params over the init tree
    import flax

    p = flax.core.unfreeze(vars0["params"])
    s = flax.core.unfreeze(vars0.get("batch_stats", {}))
    for name, sub in conv["params"].items():
        p[name] = jax.tree_util.tree_map(jnp.asarray, sub)
    for name, sub in conv["batch_stats"].items():
        s[name] = jax.tree_util.tree_map(jnp.asarray, sub)

    out = net.apply(dict(params=p, batch_stats=s), jnp.asarray(x))[0]
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        for blk in blocks:
            t = blk(t)
    ref = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                               atol=1e-4)
