"""Full-checkpoint conversion: torch-layout state_dicts -> NerfDet trees.

Builds small torch modules with the reference's exact attribute naming
(`necks/imvoxelnet.py:9-67`, `imvoxel_head_v2.py:45-49`,
`nerf_mlp.py:11-161`), converts their state_dicts, and checks numeric
forward parity against the flax modules.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfdet_tpu.utils.weight_convert import (  # noqa: E402
    convert_head, convert_neck3d, convert_nerf_mlp)


class TorchBasicBlock(tnn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.stride = stride
        self.conv1 = tnn.Conv3d(c_in, c_out, 3, stride, 1, bias=False)
        self.norm1 = tnn.BatchNorm3d(c_out)
        self.conv2 = tnn.Conv3d(c_out, c_out, 3, 1, 1, bias=False)
        self.norm2 = tnn.BatchNorm3d(c_out)
        if stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(c_in, c_out, 1, stride, bias=False),
                tnn.BatchNorm3d(c_out))

    def forward(self, x):
        idt = self.downsample(x) if self.stride != 1 else x
        out = torch.relu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        return torch.relu(out + idt)


def torch_basic_block(c_in, c_out, stride=1):
    return TorchBasicBlock(c_in, c_out, stride)


def randomize_bn(module):
    for mod in module.modules():
        if isinstance(mod, tnn.BatchNorm3d):
            mod.running_mean.normal_()
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.normal_()
            mod.bias.data.normal_()


def test_neck3d_conversion_forward_parity():
    from nerfdet_tpu.nn.neck3d import FastIndoorImVoxelNeck

    torch.manual_seed(0)
    c, out_c = 8, 4
    neck = tnn.Module()
    neck.down_layer_0 = tnn.Sequential(torch_basic_block(c, c))
    neck.down_layer_1 = tnn.Sequential(torch_basic_block(c, 2 * c, 2))
    neck.up_block_1 = tnn.Sequential(
        tnn.ConvTranspose3d(2 * c, c, 2, 2, bias=False),
        tnn.BatchNorm3d(c), tnn.ReLU(),
        tnn.Conv3d(c, c, 3, 1, 1, bias=False),
        tnn.BatchNorm3d(c), tnn.ReLU())
    neck.out_block_0 = tnn.Sequential(
        tnn.Conv3d(c, out_c, 3, 1, 1, bias=False),
        tnn.BatchNorm3d(out_c), tnn.ReLU())
    neck.out_block_1 = tnn.Sequential(
        tnn.Conv3d(2 * c, out_c, 3, 1, 1, bias=False),
        tnn.BatchNorm3d(out_c), tnn.ReLU())
    randomize_bn(neck)
    neck.eval()

    x_t = torch.randn(1, c, 8, 8, 4)
    with torch.no_grad():
        d0 = neck.down_layer_0(x_t)
        d1 = neck.down_layer_1(d0)
        u1 = neck.up_block_1(d1)
        out0_t = neck.out_block_0(d0 + u1)
        out1_t = neck.out_block_1(d1)

    state = {k: v for k, v in neck.state_dict().items()}
    params, stats = convert_neck3d(state, n_blocks=(1, 1), prefix="")

    m = FastIndoorImVoxelNeck(in_channels=c, out_channels=out_c,
                              n_blocks=(1, 1))
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())
    outs = m.apply({"params": params, "batch_stats": stats}, x_j,
                   train=False)
    for o_j, o_t in ((outs[0], out0_t), (outs[1], out1_t)):
        ref = o_t.permute(0, 2, 3, 4, 1).numpy()
        assert np.allclose(np.asarray(o_j), ref, atol=1e-4), (
            np.abs(np.asarray(o_j) - ref).max())


def test_head_conversion_forward_parity():
    from nerfdet_tpu.nn.heads import ScanNetImVoxelHeadV2

    torch.manual_seed(1)
    c, n_cls, n_reg = 8, 5, 6
    head = tnn.Module()
    head.centerness_conv = tnn.Conv3d(c, 1, 3, padding=1, bias=False)
    head.reg_conv = tnn.Conv3d(c, n_reg, 3, padding=1, bias=False)
    head.cls_conv = tnn.Conv3d(c, n_cls, 3, padding=1)

    class Scale(tnn.Module):
        def __init__(self, s):
            super().__init__()
            self.scale = tnn.Parameter(torch.tensor(float(s)))

    head.scales = tnn.ModuleList([Scale(1.1), Scale(0.9)])

    x_t = torch.randn(1, c, 4, 4, 2)
    with torch.no_grad():
        cen_t = head.centerness_conv(x_t)
        reg_t = torch.exp(head.scales[0].scale * head.reg_conv(x_t))
        cls_t = head.cls_conv(x_t)

    params = convert_head(head.state_dict(), n_scales=2, prefix="")
    m = ScanNetImVoxelHeadV2(n_classes=n_cls, n_channels=c,
                             n_reg_outs=n_reg, n_scales=2)
    x_j = jnp.asarray(x_t.permute(0, 2, 3, 4, 1).numpy())
    outs = m.apply({"params": params}, [x_j, x_j])
    cen_j, reg_j, cls_j = outs[0]
    assert np.allclose(np.asarray(cen_j),
                       cen_t.permute(0, 2, 3, 4, 1).numpy(), atol=1e-5)
    assert np.allclose(np.asarray(reg_j),
                       reg_t.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4)
    assert np.allclose(np.asarray(cls_j),
                       cls_t.permute(0, 2, 3, 4, 1).numpy(), atol=1e-5)


def test_nerf_mlp_conversion_forward_parity():
    from nerfdet_tpu.nn.nerf_mlp import (VanillaNeRFRadianceField,
                                         encoded_dim, sinusoidal_encode)

    torch.manual_seed(2)
    feat_dim = 10
    pos_dim = encoded_dim(3, 0, 10)
    cond_dim = encoded_dim(3, 0, 4)
    net_w, depth = 32, 2

    mlp = tnn.Module()
    base = tnn.Module()
    base.hidden_layers = tnn.ModuleList(
        [tnn.Linear(pos_dim + feat_dim, net_w), tnn.Linear(net_w, net_w)])
    sigma = tnn.Module()
    sigma.output_layer = tnn.Linear(net_w, 1)
    bottle = tnn.Module()
    bottle.output_layer = tnn.Linear(net_w, net_w)
    rgb = tnn.Module()
    rgb.hidden_layers = tnn.ModuleList([tnn.Linear(net_w + cond_dim, 16)])
    rgb.output_layer = tnn.Linear(16, 3)
    inner = tnn.Module()
    inner.base, inner.sigma_layer = base, sigma
    inner.bottleneck_layer, inner.rgb_layer = bottle, rgb
    mlp.mlp = inner

    params = convert_nerf_mlp(mlp.state_dict(), prefix="",
                              net_depth=depth, net_depth_condition=1)

    model = VanillaNeRFRadianceField(
        net_depth=depth, net_width=net_w, skip_layer=4,
        feature_dim=feat_dim, net_depth_condition=1,
        net_width_condition=16)
    rng = np.random.RandomState(3)
    pts = rng.randn(7, 3).astype(np.float32)
    cond = rng.randn(7, 3).astype(np.float32)
    feats = rng.randn(7, feat_dim).astype(np.float32)
    rgb_j, sigma_j = model.apply({"params": params}, jnp.asarray(pts),
                                 condition=jnp.asarray(cond),
                                 features=jnp.asarray(feats))

    # torch forward replicated inline
    def enc(x, mi, ma):
        return torch.from_numpy(
            np.asarray(sinusoidal_encode(x, mi, ma), np.float32))

    with torch.no_grad():
        x = torch.cat([enc(pts, 0, 10), torch.from_numpy(feats)], -1)
        h = x
        for lin in base.hidden_layers:
            h = torch.relu(lin(h))
        raw_sigma = sigma.output_layer(h)
        b = bottle.output_layer(h)
        h2 = torch.cat([b, enc(cond, 0, 4)], -1)
        h2 = torch.relu(rgb.hidden_layers[0](h2))
        raw_rgb = rgb.output_layer(h2)
        rgb_t = torch.sigmoid(raw_rgb).numpy()
        sigma_t = torch.relu(raw_sigma).numpy()
    assert np.allclose(np.asarray(rgb_j), rgb_t, atol=1e-5)
    assert np.allclose(np.asarray(sigma_j), sigma_t, atol=1e-5)
