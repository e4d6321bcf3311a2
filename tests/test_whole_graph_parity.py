"""WHOLE-GRAPH parity against a torch execution of the reference
pipeline: ONE reference-shaped state_dict, ONE preprocessed scene,
both frameworks running the complete NeRF-Det graph

    backbone -> FPN -> projection -> backprojection -> mean/cov fusion
    -> mapping/rgb global volume -> nerf_density -> 3D neck -> head
    (+ the image-mode renderer on a fixed ray batch)

and every output compared end-to-end. The torch side replicates the
REFERENCE code's behavior operation by operation
(`mmdet3d/models/detectors/nerfdet.py:133-269,362-420`,
`model_utils/projection.py:91-151`, `model_utils/render_ray.py:
145-369`) — including its quirks: pixel rounding in backproject,
feature cropping to img_shape//stride before grid_sample, pixel
normalization by (img_shape - 1) while sampling the PADDED rgb tensor,
the +1e-8 count divisions and the 1e6 cov fill.

This is the executable stand-in for released-checkpoint mAP parity in
an environment without mmcv/mmdet: any resize/pad/rounding divergence
anywhere in the composed graph fails the 1e-3 assertions here.
"""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_checkpoint_convert import (TorchBasicBlock,  # noqa: E402
                                           randomize_bn)
from tests.test_whole_model_parity import (TorchFPN,  # noqa: E402
                                           TorchResNet50, _randomize_bn)

# geometry (matches tiny_model in test_train_step)
ORI = (128, 160)
IMG = (31, 40)
PAD = (32, 40)
N_VOX = (12, 12, 4)
VOX = (0.8, 0.8, 0.8)
NEAR_FAR = (0.2, 8.0)
N_SAMPLES = 16
N_RAND = 32
FPN_OUT = 64          # nerf_feature_dim = 16, mapping half = 8
NECK3D_OUT = 16
N_CLS, N_REG, N_SCALES = 5, 6, 2
MLP_W, MLP_D, MLP_SKIP, COND_W = 256, 4, 3, 128
FEAT_DIM = FPN_OUT // 4 + 6   # 22
POS_DIM, COND_DIM = 63, 27    # encoded_dim(3,0,10), encoded_dim(3,0,4)


# ---------------------------------------------------------------------
# torch modules with the reference's exact state_dict naming
# ---------------------------------------------------------------------


class TorchNeck3D(tnn.Module):
    """FastIndoorImVoxelNeck, n_blocks=(1, 1) (`necks/imvoxelnet.py`)."""

    def __init__(self, c_in, c_out):
        super().__init__()
        self.down_layer_0 = tnn.Sequential(TorchBasicBlock(c_in, c_in))
        self.down_layer_1 = tnn.Sequential(
            TorchBasicBlock(c_in, 2 * c_in, stride=2))
        self.up_block_1 = tnn.Sequential(
            tnn.ConvTranspose3d(2 * c_in, c_in, 2, 2, bias=False),
            tnn.BatchNorm3d(c_in), tnn.ReLU(),
            tnn.Conv3d(c_in, c_in, 3, 1, 1, bias=False),
            tnn.BatchNorm3d(c_in), tnn.ReLU())
        self.out_block_0 = tnn.Sequential(
            tnn.Conv3d(c_in, c_out, 3, 1, 1, bias=False),
            tnn.BatchNorm3d(c_out), tnn.ReLU())
        self.out_block_1 = tnn.Sequential(
            tnn.Conv3d(2 * c_in, c_out, 3, 1, 1, bias=False),
            tnn.BatchNorm3d(c_out), tnn.ReLU())

    def forward(self, x):
        d0 = self.down_layer_0(x)
        d1 = self.down_layer_1(d0)
        u1 = self.up_block_1(d1)
        return [self.out_block_0(d0 + u1), self.out_block_1(d1)]


class TorchHead(tnn.Module):
    """ScanNetImVoxelHeadV2 convs (`imvoxel_head_v2.py:45-49`)."""

    class _Scale(tnn.Module):
        def __init__(self, s):
            super().__init__()
            self.scale = tnn.Parameter(torch.tensor(float(s)))

    def __init__(self, c):
        super().__init__()
        self.centerness_conv = tnn.Conv3d(c, 1, 3, padding=1, bias=False)
        self.reg_conv = tnn.Conv3d(c, N_REG, 3, padding=1, bias=False)
        self.cls_conv = tnn.Conv3d(c, N_CLS, 3, padding=1)
        self.scales = tnn.ModuleList(
            [self._Scale(1.0 + 0.1 * i) for i in range(N_SCALES)])

    def forward(self, xs):
        outs = []
        for i, x in enumerate(xs):
            outs.append((self.centerness_conv(x),
                         torch.exp(self.scales[i].scale
                                   * self.reg_conv(x)),
                         self.cls_conv(x)))
        return outs


class TorchNerfMLP(tnn.Module):
    """VanillaNeRFRadianceField, net_depth=4/skip=3 (`nerf_mlp.py`)."""

    def __init__(self):
        super().__init__()
        in_dim = POS_DIM + FEAT_DIM
        base = tnn.Module()
        dims = [in_dim, MLP_W, MLP_W, MLP_W]
        base.hidden_layers = tnn.ModuleList(
            [tnn.Linear(d, MLP_W) for d in dims])
        trunk_out = MLP_W + in_dim  # skip concat after layer 3
        sigma = tnn.Module()
        sigma.output_layer = tnn.Linear(trunk_out, 1)
        bottle = tnn.Module()
        bottle.output_layer = tnn.Linear(trunk_out, MLP_W)
        rgb = tnn.Module()
        rgb.hidden_layers = tnn.ModuleList(
            [tnn.Linear(MLP_W + COND_DIM, COND_W)])
        rgb.output_layer = tnn.Linear(COND_W, 3)
        inner = tnn.Module()
        inner.base, inner.sigma_layer = base, sigma
        inner.bottleneck_layer, inner.rgb_layer = bottle, rgb
        self.mlp = inner

    @staticmethod
    def _encode(x, max_deg):
        scales = torch.tensor([2.0 ** i for i in range(max_deg)],
                              dtype=x.dtype)
        xb = (x[..., None, :] * scales[:, None]).reshape(
            x.shape[:-1] + (max_deg * x.shape[-1],))
        return torch.cat([x, torch.sin(xb), torch.cos(xb)], dim=-1)

    def _trunk(self, pts, features):
        x = torch.cat([self._encode(pts, 10), features], dim=-1)
        inputs = x
        for i, lin in enumerate(self.mlp.base.hidden_layers):
            x = torch.relu(lin(x))
            if i % MLP_SKIP == 0 and i > 0:
                x = torch.cat([x, inputs], dim=-1)
        return x

    def query_density(self, pts, features):
        h = self._trunk(pts, features)
        return torch.relu(self.mlp.sigma_layer.output_layer(h))

    def forward(self, pts, viewdirs, features):
        h = self._trunk(pts, features)
        sigma = torch.relu(self.mlp.sigma_layer.output_layer(h))
        b = self.mlp.bottleneck_layer.output_layer(h)
        cond = self._encode(viewdirs, 4)
        if cond.dim() < b.dim():
            cond = cond.unsqueeze(1).expand(b.shape[:-1] + (COND_DIM,))
        h2 = torch.cat([b, cond], dim=-1)
        h2 = torch.relu(self.mlp.rgb_layer.hidden_layers[0](h2))
        rgb = torch.sigmoid(self.mlp.rgb_layer.output_layer(h2))
        return rgb, sigma


# ---------------------------------------------------------------------
# torch replica of the reference pipeline functions
# ---------------------------------------------------------------------


def t_projection(intrinsic, extrinsics, stride):
    """`nerfdet.py:363-378`."""
    intr = torch.tensor(np.asarray(intrinsic)[:3, :3])
    ratio = ORI[0] / (IMG[0] / stride)
    intr = intr.clone()
    intr[:2] /= ratio
    return torch.stack([intr @ torch.tensor(np.asarray(e))[:3]
                        for e in extrinsics])


def t_points(origin):
    """`nerfdet.py:380-390`."""
    n = torch.tensor(N_VOX, dtype=torch.float32)
    vs = torch.tensor(VOX)
    pts = torch.stack(torch.meshgrid(
        [torch.arange(N_VOX[0]), torch.arange(N_VOX[1]),
         torch.arange(N_VOX[2])], indexing="ij")).float()
    new_origin = torch.tensor(np.asarray(origin)) - n / 2.0 * vs
    return pts * vs.view(3, 1, 1, 1) + new_origin.view(3, 1, 1, 1)


def t_backproject(features, points, projection):
    """`nerfdet.py:393-420` (no depth)."""
    n_im, n_ch, height, width = features.shape
    nx, ny, nz = points.shape[-3:]
    pts = points.view(1, 3, -1).expand(n_im, 3, -1)
    pts = torch.cat((pts, torch.ones_like(pts[:, :1])), dim=1)
    p2 = torch.bmm(projection, pts)
    x = (p2[:, 0] / p2[:, 2]).round().long()
    y = (p2[:, 1] / p2[:, 2]).round().long()
    z = p2[:, 2]
    valid = (x >= 0) & (y >= 0) & (x < width) & (y < height) & (z > 0)
    vol = torch.zeros((n_im, n_ch, pts.shape[-1]))
    for i in range(n_im):
        vol[i, :, valid[i]] = features[i, :, y[i, valid[i]],
                                       x[i, valid[i]]]
    return (vol.view(n_im, n_ch, nx, ny, nz),
            valid.view(n_im, 1, nx, ny, nz))


def t_masked_mean_cov(vol, valid_cnt):
    """`nerfdet.py:171-183` fusion with the 1e6 fill."""
    mean = vol.sum(dim=0) / (valid_cnt + 1e-8)
    mean[:, valid_cnt[0] == 0] = 0.0
    cov = torch.sum((vol - mean.unsqueeze(0)) ** 2, dim=0) / (
        valid_cnt + 1e-8)
    cov[:, valid_cnt[0] == 0] = 1e6
    return mean, torch.exp(-cov)


def t_render(ray_o, ray_d, images_pad, featmaps, intrinsic, extrinsics,
             mlp):
    """Image-mode renderer: `render_ray.py:250-369` + `projection.py`
    grid_sample path, det sampling."""
    r = ray_o.shape[0]
    step = (NEAR_FAR[1] - NEAR_FAR[0]) / (N_SAMPLES - 1)
    z_vals = NEAR_FAR[0] + step * torch.arange(
        N_SAMPLES, dtype=torch.float32)
    z_vals = z_vals.unsqueeze(0).expand(r, N_SAMPLES)
    pts = (z_vals.unsqueeze(2) * ray_d.unsqueeze(1)
           + ray_o.unsqueeze(1))  # (R, S, 3)

    # projector: intr4 (scaled by ori/img), extr, pixels by (img-1)
    intr4 = torch.tensor(np.asarray(intrinsic)[:4, :4]).clone()
    intr4[:2] /= ORI[0] / IMG[0]
    v = extrinsics.shape[0]
    xyz = pts.reshape(-1, 3)
    xyz_h = torch.cat([xyz, torch.ones_like(xyz[:, :1])], dim=-1)
    proj = torch.stack([intr4 @ torch.tensor(np.asarray(e))
                        for e in extrinsics])
    cam = proj @ xyz_h.t().unsqueeze(0).expand(v, 4, -1)
    cam = cam.permute(0, 2, 1)
    pix = cam[..., :2] / torch.clamp(cam[..., 2:3], min=1e-8)
    pix = torch.clamp(pix, -1e6, 1e6)
    in_front = cam[..., 2] > 0
    h, w = IMG
    resize = torch.tensor([w - 1.0, h - 1.0])
    norm_pix = 2 * pix / resize - 1.0
    norm_pix = norm_pix.reshape(v, r, N_SAMPLES, 2)

    rgb_s = tF.grid_sample(images_pad, norm_pix, align_corners=True)
    feat_s = tF.grid_sample(featmaps, norm_pix, align_corners=True)
    rgb_feat = torch.cat([rgb_s, feat_s], dim=1).permute(2, 3, 0, 1)

    inbound = ((pix[..., 0] <= w - 1.0) & (pix[..., 0] >= 0)
               & (pix[..., 1] <= h - 1.0) & (pix[..., 1] >= 0))
    mask = (inbound & in_front).float().reshape(
        v, r, N_SAMPLES).permute(1, 2, 0).unsqueeze(-1)

    pixel_mask = mask[..., 0].sum(dim=2) > 1
    weight = mask / (mask.sum(dim=2, keepdim=True) + 1e-8)
    mean = torch.sum(rgb_feat * weight, dim=2, keepdim=True)
    var = torch.sum((rgb_feat - mean) ** 2, dim=2, keepdim=True)
    var = var / (mask.sum(dim=2, keepdim=True) + 1e-8)
    globalfeat = torch.cat([mean, torch.exp(-var)], dim=-1).squeeze(2)

    rgb_pts, density_pts = mlp(pts, ray_d, globalfeat)
    sigma = density_pts[..., 0]
    alpha = 1.0 - torch.exp(-sigma)
    T = torch.cumprod(1.0 - alpha + 1e-10, dim=-1)[:, :-1]
    T = torch.cat((torch.ones_like(T[:, :1]), T), dim=-1)
    weights = alpha * T
    rgb_map = torch.sum(weights.unsqueeze(2) * rgb_pts, dim=1)
    depth_map = torch.sum(weights * z_vals, dim=-1) / (
        torch.sum(weights, dim=-1) + 1e-8)
    depth_map = torch.clamp(depth_map, z_vals.min(), z_vals.max())
    return rgb_map, depth_map, pixel_mask


@pytest.fixture(scope="module")
def everything():
    from nerfdet_tpu.data.synthetic import make_synthetic_scene
    from nerfdet_tpu.models.nerfdet import NerfDet, SceneMeta
    from nerfdet_tpu.utils.weight_convert import (
        convert_reference_checkpoint, merge_params)

    torch.manual_seed(0)
    backbone = TorchResNet50().eval()
    fpn = TorchFPN(out=FPN_OUT).eval()
    _randomize_bn(backbone)
    neck3d = TorchNeck3D(FPN_OUT, NECK3D_OUT).eval()
    randomize_bn(neck3d)
    head = TorchHead(NECK3D_OUT).eval()
    mlp = TorchNerfMLP().eval()
    mapping = tnn.Sequential(tnn.Linear(FPN_OUT, FPN_OUT // 8)).eval()

    state = {}
    for mod, pre in ((backbone, "backbone."), (fpn, "neck."),
                     (neck3d, "neck_3d."), (head, "bbox_head."),
                     (mlp, "nerf_mlp."), (mapping, "mapping.")):
        for k, v in mod.state_dict().items():
            state[pre + k] = v.numpy()

    model = NerfDet(
        backbone_depth=50, fpn_out_channels=FPN_OUT,
        neck3d_out_channels=NECK3D_OUT, neck3d_n_blocks=(1, 1),
        n_classes=N_CLS, head_n_reg_outs=N_REG, n_scales=N_SCALES,
        n_voxels=N_VOX, voxel_size=VOX,
        aabb=((-4.8, -4.8, -1.6), (4.8, 4.8, 1.6)),
        near_far_range=NEAR_FAR, n_samples=N_SAMPLES, n_rand=N_RAND,
        nerf_density=True,
        meta=SceneMeta(ori_shape=ORI, img_shape=IMG, pad_shape=PAD))

    scene = make_synthetic_scene(seed=3, n_views=3, n_targets=1,
                                 hw=IMG, pad_hw=PAD, n_rand=N_RAND,
                                 n_boxes=2, max_gt=4, margin=2)
    scene = {k: jnp.asarray(v) for k, v in scene.items()}

    variables = jax.jit(lambda k: model.init(k, scene, train=False))(
        jax.random.PRNGKey(0))
    converted = convert_reference_checkpoint(
        state, depth=50, neck3d_blocks=(1, 1), n_scales=N_SCALES)
    params = merge_params(dict(variables["params"]),
                          converted["params"])
    stats = merge_params(dict(variables.get("batch_stats", {})),
                         converted["batch_stats"])
    torch_mods = dict(backbone=backbone, fpn=fpn, neck3d=neck3d,
                      head=head, mlp=mlp, mapping=mapping)
    return (model, {"params": params, "batch_stats": stats}, scene,
            torch_mods)


def test_whole_graph_torch_parity(everything):
    model, variables, scene, tm = everything

    # ---------------- jax: the full production forward ----------------
    head_outs, valid_j, render_j = jax.jit(
        lambda v, s: model.apply(v, s, train=False, with_rays=True)
    )(variables, scene)

    # ---------------- torch: the reference pipeline -------------------
    imgs = torch.tensor(np.asarray(scene["imgs"])).permute(0, 3, 1, 2)
    denorm = torch.tensor(
        np.asarray(scene["denorm_images"])).permute(0, 3, 1, 2)
    with torch.no_grad():
        feats = tm["fpn"](tm["backbone"](imgs))[0]  # (V, C, 8, 10)

        stride = 4
        fh, fw = IMG[0] // stride, IMG[1] // stride
        proj = t_projection(scene["intrinsic"], scene["extrinsics"],
                            stride)
        points = t_points(scene["origin"])
        vol, valid = t_backproject(feats[:, :, :fh, :fw], points, proj)
        valid_cnt = valid.sum(dim=0).float()
        vol_mean, _ = t_masked_mean_cov(vol, valid_cnt)

        # global volume: rgb stream (stride 1) + mapped feature stream
        rgb_proj = t_projection(scene["intrinsic"],
                                scene["extrinsics"], 1)
        rgb_vol, _ = t_backproject(denorm[:, :, :IMG[0], :IMG[1]],
                                   points, rgb_proj)
        n_v, c_f = vol.shape[:2]
        mapped = tm["mapping"](
            vol.view(n_v, c_f, -1).permute(0, 2, 1)).permute(
            0, 2, 1).view(n_v, -1, *N_VOX)
        glob = torch.cat([rgb_vol, mapped], dim=1)
        g_mean, g_cov = t_masked_mean_cov(glob, valid_cnt)
        global_volume = torch.cat([g_mean, g_cov], dim=0)
        gv = global_volume.view(-1, int(np.prod(N_VOX))).t()
        pts_flat = points.view(3, -1).t()
        density = tm["mlp"].query_density(pts_flat, gv)
        alpha = 1 - torch.exp(-density)
        det_vol = alpha.t().view(1, *N_VOX) * vol_mean
        det_vol[:, valid_cnt[0] == 0] = 0.0

        scales_t = tm["neck3d"](det_vol.unsqueeze(0))
        outs_t = tm["head"](scales_t)

        featmaps = tm["mapping"](
            feats[:, :, :fh, :fw].reshape(n_v, c_f, -1).permute(0, 2, 1)
        ).permute(0, 2, 1).reshape(n_v, -1, fh, fw)
        rgb_t, depth_t, pmask_t = t_render(
            torch.tensor(np.asarray(scene["ray_o"])),
            torch.tensor(np.asarray(scene["ray_d"])),
            denorm, featmaps, scene["intrinsic"],
            scene["extrinsics"], tm["mlp"])

    # ---------------- comparisons -------------------------------------
    assert np.array_equal(
        np.asarray(valid_j),
        valid_cnt[0].numpy())  # integer view counts must be identical

    for s in range(N_SCALES):
        cen_j, reg_j, cls_j = head_outs[s]
        cen_t, reg_t, cls_t = [
            o[0].permute(1, 2, 3, 0).numpy() for o in outs_t[s]]
        for name, a, b in (("centerness", cen_j, cen_t),
                           ("bbox", reg_j, reg_t),
                           ("cls", cls_j, cls_t)):
            err = np.abs(np.asarray(a) - b).max()
            assert err <= 1e-3, f"scale {s} {name}: max err {err}"

    # tolerance calibration: with the featmap-crop semantics wrong
    # (sampling the padded map, the bug this test exists to catch) the
    # rgb error here is 5.5e-4; with correct semantics it is 1.5e-6 —
    # 1e-4 separates the two by >5x in both directions
    err_rgb = np.abs(np.asarray(render_j["rgb"]) - rgb_t.numpy()).max()
    assert err_rgb <= 1e-4, f"render rgb: max err {err_rgb}"
    err_d = np.abs(np.asarray(render_j["depth"]) - depth_t.numpy()).max()
    assert err_d <= 1e-3, f"render depth: max err {err_d}"
    assert np.array_equal(
        np.asarray(render_j["mask"]),
        (pmask_t.float().sum(dim=1) > 8).numpy())

    # boxes/scores: decode both head outputs through the same decoder —
    # identical head tensors must give identical candidates
    from nerfdet_tpu.nn.heads import get_candidate_bboxes

    mlvl_points = model.mlvl_points(scene["origin"])
    boxes_j, scores_j = get_candidate_bboxes(
        head_outs, valid_j, mlvl_points, 20, N_CLS)
    outs_torch_as_jax = [
        tuple(jnp.asarray(o[0].permute(1, 2, 3, 0).numpy())
              for o in outs_t[s]) for s in range(N_SCALES)]
    boxes_t, scores_t = get_candidate_bboxes(
        outs_torch_as_jax, jnp.asarray(valid_cnt[0].numpy()),
        mlvl_points, 20, N_CLS)
    assert np.abs(np.asarray(boxes_j) - np.asarray(boxes_t)).max() <= 1e-3
    assert np.abs(
        np.asarray(scores_j) - np.asarray(scores_t)).max() <= 1e-3
