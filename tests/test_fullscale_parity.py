"""FULL-GEOMETRY whole-graph parity, host pipeline included.

The toy-shape twin (`test_whole_graph_parity.py`) proves the graph is
right at 12x12x4 voxels / 31x40 images; divergences that only
materialize at the real flagship geometry — the stride-4 crop
arithmetic at 239x320 -> 60x80 feature maps, the 40x40x16 volume, the
3-scale neck/head assignment, double-digit view fusion — would slip
past it, and so would any resize/pad/intrinsic-rescale regression in
`data/pipeline.py`, because it feeds pre-shaped tensors.

This test closes both holes:

* it starts from RAW synthetic 968x1296 images ON DISK, runs this
  framework's host pipeline (`MultiViewPipeline`: Resize keep_ratio ->
  Normalize -> Pad -> ray generation, reference
  `mmdet3d/datasets/pipelines/multi_view.py:90-160`), and REPLICATES
  the reference's mmcv arithmetic independently in the test — so the
  resize scale `int(w*s+0.5)`, the bottom/right zero pad, the
  uint8-quantized denorm, the intrinsic /ratio rescale and the
  +0.5-pixel-center ray directions are all inside the parity boundary;
* it then runs the COMPLETE graph at the flagship geometry on both
  sides from one reference-shaped state_dict: ResNet-50 -> 4-scale FPN
  -> projection -> backprojection (40x40x16) -> mean/cov fusion ->
  rgb+mapped global volume -> nerf_density -> 3-level 3D neck ->
  3-scale head, plus the image-mode renderer on the pipeline's own
  2048-ray bundle (reference `mmdet3d/models/detectors/nerfdet.py:
  133-269,362-420`, `model_utils/render_ray.py:250-369`).

f32 on CPU, relaxed (shape-scaled) tolerances; marked slow.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_checkpoint_convert import (TorchBasicBlock,  # noqa: E402
                                           randomize_bn)
from tests.test_whole_model_parity import (TorchFPN,  # noqa: E402
                                           TorchResNet50, _randomize_bn)

# flagship geometry (configs/nerfdet/nerfdet_res50_2x_low_res.py)
ORI = (968, 1296)
IMG = (239, 320)          # 968x1296 resized keep_ratio into (240, 320)
PAD = (240, 320)
N_VOX = (40, 40, 16)
VOX = (0.16, 0.16, 0.2)
NEAR_FAR = (0.2, 8.0)
N_SAMPLES = 64
N_RAND = 2048
FPN_OUT = 256             # nerf_feature_dim 64, mapping half 32
NECK3D_OUT = 128
N_CLS, N_REG, N_SCALES = 18, 6, 3
V_SRC, V_TGT = 10, 2
MLP_W, MLP_SKIP, COND_W = 256, 3, 128
FEAT_DIM = FPN_OUT // 4 + 6           # 70
POS_DIM, COND_DIM = 63, 27


# ---------------------------------------------------------------------
# torch modules at flagship widths (reference state_dict naming)
# ---------------------------------------------------------------------


class TorchNeck3D3(tnn.Module):
    """FastIndoorImVoxelNeck n_blocks=(1, 1, 1) — the flagship 3-level
    neck (`mmdet3d/models/necks/imvoxelnet.py:9-66`)."""

    def __init__(self, c, c_out):
        super().__init__()
        self.down_layer_0 = tnn.Sequential(TorchBasicBlock(c, c))
        self.down_layer_1 = tnn.Sequential(
            TorchBasicBlock(c, 2 * c, stride=2))
        self.down_layer_2 = tnn.Sequential(
            TorchBasicBlock(2 * c, 4 * c, stride=2))

        def up(cin):
            return tnn.Sequential(
                tnn.ConvTranspose3d(cin, cin // 2, 2, 2, bias=False),
                tnn.BatchNorm3d(cin // 2), tnn.ReLU(),
                tnn.Conv3d(cin // 2, cin // 2, 3, 1, 1, bias=False),
                tnn.BatchNorm3d(cin // 2), tnn.ReLU())

        def out(cin):
            return tnn.Sequential(
                tnn.Conv3d(cin, c_out, 3, 1, 1, bias=False),
                tnn.BatchNorm3d(c_out), tnn.ReLU())

        self.up_block_1 = up(2 * c)
        self.up_block_2 = up(4 * c)
        self.out_block_0 = out(c)
        self.out_block_1 = out(2 * c)
        self.out_block_2 = out(4 * c)

    def forward(self, x):
        d0 = self.down_layer_0(x)
        d1 = self.down_layer_1(d0)
        d2 = self.down_layer_2(d1)
        out2 = self.out_block_2(d2)
        x1 = d1 + self.up_block_2(d2)
        out1 = self.out_block_1(x1)
        x0 = d0 + self.up_block_1(x1)
        out0 = self.out_block_0(x0)
        return [out0, out1, out2]


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
        return [(self.centerness_conv(x),
                 torch.exp(self.scales[i].scale * self.reg_conv(x)),
                 self.cls_conv(x)) for i, x in enumerate(xs)]


class TorchNerfMLP(tnn.Module):
    """VanillaNeRFRadianceField at flagship feature_dim
    (`model_utils/nerf_mlp.py`, net_depth=4 / skip=3)."""

    def __init__(self, feat_dim=FEAT_DIM):
        super().__init__()
        in_dim = POS_DIM + feat_dim
        base = tnn.Module()
        base.hidden_layers = tnn.ModuleList(
            [tnn.Linear(d, MLP_W) for d in (in_dim, MLP_W, MLP_W, MLP_W)])
        trunk_out = MLP_W + in_dim
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
        return torch.relu(self.mlp.sigma_layer.output_layer(
            self._trunk(pts, features)))

    def forward(self, pts, viewdirs, features):
        h = self._trunk(pts, features)
        sigma = torch.relu(self.mlp.sigma_layer.output_layer(h))
        b = self.mlp.bottleneck_layer.output_layer(h)
        cond = self._encode(viewdirs, 4)
        if cond.dim() < b.dim():
            cond = cond.unsqueeze(1).expand(b.shape[:-1] + (COND_DIM,))
        h2 = torch.relu(self.mlp.rgb_layer.hidden_layers[0](
            torch.cat([b, cond], dim=-1)))
        return torch.sigmoid(self.mlp.rgb_layer.output_layer(h2)), sigma


# ---------------------------------------------------------------------
# torch replica of the reference HOST pipeline (mmcv arithmetic)
# ---------------------------------------------------------------------

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


def ref_resize_keep_ratio(img):
    """mmcv Resize(img_scale=(320, 240), keep_ratio=True):
    scale = min(max_w/w, max_h/h), new = int(dim * scale + 0.5)."""
    import cv2

    h, w = img.shape[:2]
    scale = min(320 / w, 240 / h)
    new = (int(w * scale + 0.5), int(h * scale + 0.5))
    return cv2.resize(img, new, interpolation=cv2.INTER_LINEAR)


def ref_preprocess(img):
    """Resize -> Normalize -> uint8-quantized denorm -> Pad
    (`multi_view.py:90-114`; RGB kept throughout, matching this
    framework's documented channel convention)."""
    img = ref_resize_keep_ratio(img)
    norm = (img.astype(np.float32) - MEAN) / STD
    denorm = np.clip(norm * STD + MEAN, 0, 255).astype(np.uint8)
    denorm = denorm.astype(np.float32) / 255.0
    pad = np.zeros((PAD[0], PAD[1], 3), np.float32)
    padd = np.zeros((PAD[0], PAD[1], 3), np.float32)
    pad[:img.shape[0], :img.shape[1]] = norm
    padd[:img.shape[0], :img.shape[1]] = denorm
    return pad, padd


def ref_raydirs(intrinsic_scaled, c2w, margin=10):
    """`data_augment_utils.py:410-424` + the `multi_view.py:118-131`
    margin pixel grid over the PADDED size."""
    px, py = np.meshgrid(
        np.arange(margin, PAD[1] - margin, dtype=np.float32),
        np.arange(margin, PAD[0] - margin, dtype=np.float32))
    x = (px + 0.5 - intrinsic_scaled[0, 2]) / intrinsic_scaled[0, 0]
    y = (py + 0.5 - intrinsic_scaled[1, 2]) / intrinsic_scaled[1, 1]
    dirs = np.stack([x, y, np.ones_like(x)], axis=-1) @ c2w[:3, :3].T
    return dirs.reshape(-1, 3).astype(np.float32), px, py


# ---------------------------------------------------------------------
# torch replica of the reference model pipeline (flagship shapes)
# ---------------------------------------------------------------------


def t_projection(intrinsic, extrinsics, stride):
    """`nerfdet.py:363-378`."""
    intr = torch.tensor(np.asarray(intrinsic, np.float32)[:3, :3]).clone()
    intr[:2] /= ORI[0] / (IMG[0] / stride)
    return torch.stack([
        intr @ torch.tensor(np.asarray(e, np.float32))[:3]
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
    """Image-mode renderer (`render_ray.py:250-369` + `projection.py`)."""
    r = ray_o.shape[0]
    step = (NEAR_FAR[1] - NEAR_FAR[0]) / (N_SAMPLES - 1)
    z_vals = NEAR_FAR[0] + step * torch.arange(
        N_SAMPLES, dtype=torch.float32)
    z_vals = z_vals.unsqueeze(0).expand(r, N_SAMPLES)
    pts = z_vals.unsqueeze(2) * ray_d.unsqueeze(1) + ray_o.unsqueeze(1)

    intr4 = torch.eye(4)
    intr4[:3, :3] = torch.tensor(np.asarray(intrinsic, np.float32)[:3, :3])
    intr4[:2] /= ORI[0] / IMG[0]
    v = extrinsics.shape[0]
    xyz = pts.reshape(-1, 3)
    xyz_h = torch.cat([xyz, torch.ones_like(xyz[:, :1])], dim=-1)
    proj = torch.stack(
        [intr4 @ torch.tensor(np.asarray(e, np.float32))
         for e in extrinsics])
    cam = (proj @ xyz_h.t().unsqueeze(0).expand(v, 4, -1)).permute(0, 2, 1)
    pix = cam[..., :2] / torch.clamp(cam[..., 2:3], min=1e-8)
    pix = torch.clamp(pix, -1e6, 1e6)
    in_front = cam[..., 2] > 0
    h, w = IMG
    norm_pix = 2 * pix / torch.tensor([w - 1.0, h - 1.0]) - 1.0
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


# ---------------------------------------------------------------------
# the synthetic RAW scene on disk
# ---------------------------------------------------------------------


def _write_raw_scene(tmpdir):
    """V_SRC ring cameras around the origin; smooth random 968x1296
    uint8 images written as PNGs (bilinear resize is content-sensitive,
    so smooth full-range content exercises the resize arithmetic)."""
    import cv2

    rng = np.random.RandomState(11)
    intrinsic = np.eye(4, dtype=np.float32)
    intrinsic[0, 0] = intrinsic[1, 1] = 1170.0
    intrinsic[0, 2], intrinsic[1, 2] = 648.0, 484.0

    img_paths, extrinsics, c2ws = [], [], []
    for i in range(V_SRC):
        ang = 2 * np.pi * i / V_SRC
        pos = np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 1.2],
                       np.float32)
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(fwd, np.array([0.0, 0.0, 1.0], np.float32))
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        rot = np.stack([right, down, fwd], axis=1).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3], c2w[:3, 3] = rot, pos
        w2c = np.linalg.inv(c2w).astype(np.float32)
        low = rng.randint(0, 256, (121, 162, 3), np.uint8)
        img = cv2.resize(low, (1296, 968), interpolation=cv2.INTER_LINEAR)
        path = str(tmpdir / f"view_{i}.png")
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        img_paths.append(path)
        extrinsics.append(w2c)
        c2ws.append(c2w)

    return dict(img_paths=img_paths,
                extrinsics=np.stack(extrinsics),
                c2w=np.stack(c2ws),
                intrinsic=intrinsic)


@pytest.fixture(scope="module")
def everything(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from nerfdet_tpu.data.pipeline import MultiViewPipeline, subsample_rays
    from nerfdet_tpu.models.nerfdet import NerfDet, SceneMeta
    from nerfdet_tpu.utils.weight_convert import (
        convert_reference_checkpoint, merge_params)

    tmpdir = tmp_path_factory.mktemp("fullscale_scene")
    info = _write_raw_scene(tmpdir)

    # ------- this framework's host pipeline, stride loading -----------
    pipe = MultiViewPipeline(
        n_images=V_SRC, img_scale=(320, 240), pad_size=PAD,
        margin=10, loading="stride", nerf_target_views=V_TGT,
        sample_freq=1)
    out = pipe(info, np.random.RandomState(0))
    out = subsample_rays(out, N_RAND, np.random.RandomState(1))
    origin = np.array([0.0, 0.0, 0.5], np.float32)
    batch = {k: jnp.asarray(v) for k, v in dict(
        imgs=out["imgs"], denorm_images=out["denorm_images"],
        intrinsic=out["intrinsic"], extrinsics=out["extrinsics"],
        origin=origin, ray_o=out["ray_o"], ray_d=out["ray_d"]).items()}

    # ------- one reference-shaped state_dict ---------------------------
    torch.manual_seed(0)
    backbone = TorchResNet50().eval()
    fpn = TorchFPN(out=FPN_OUT).eval()
    _randomize_bn(backbone)
    neck3d = TorchNeck3D3(FPN_OUT, NECK3D_OUT).eval()
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
        neck3d_out_channels=NECK3D_OUT, neck3d_n_blocks=(1, 1, 1),
        n_classes=N_CLS, head_n_reg_outs=N_REG, n_scales=N_SCALES,
        n_voxels=N_VOX, voxel_size=VOX,
        near_far_range=NEAR_FAR, n_samples=N_SAMPLES, n_rand=N_RAND,
        nerf_density=True,
        meta=SceneMeta(ori_shape=ORI, img_shape=IMG, pad_shape=PAD))
    variables = jax.jit(lambda k: model.init(k, batch, train=False))(
        jax.random.PRNGKey(0))
    converted = convert_reference_checkpoint(
        state, depth=50, neck3d_blocks=(1, 1, 1), n_scales=N_SCALES)
    params = merge_params(dict(variables["params"]), converted["params"])
    stats = merge_params(dict(variables.get("batch_stats", {})),
                         converted["batch_stats"])
    torch_mods = dict(backbone=backbone, fpn=fpn, neck3d=neck3d,
                      head=head, mlp=mlp, mapping=mapping)
    return (model, {"params": params, "batch_stats": stats}, batch, out,
            info, origin, torch_mods)


def test_host_pipeline_matches_reference_arithmetic(everything):
    """The pipeline's resize/pad/denorm/ray outputs vs an independent
    replica of the reference's mmcv arithmetic over the same PNGs."""
    import cv2

    _, _, _, out, info, _, _ = everything

    assert tuple(out["img_shape"]) == IMG
    assert out["imgs"].shape == (V_SRC, PAD[0], PAD[1], 3)

    for i in range(V_SRC):
        raw_bgr = cv2.imread(info["img_paths"][i])
        raw = cv2.cvtColor(raw_bgr, cv2.COLOR_BGR2RGB)
        norm_ref, denorm_ref = ref_preprocess(raw)
        assert np.abs(out["imgs"][i] - norm_ref).max() < 1e-4, i
        assert np.abs(out["denorm_images"][i] - denorm_ref).max() < 1e-6, i

    # ray directions: intrinsic / (ori_h / img_h), +0.5 pixel centers —
    # compare the pipeline's generator against the independent replica
    # for every target view's full grid
    from nerfdet_tpu.data.pipeline import get_dtu_raydir

    ratio = ORI[0] / IMG[0]
    intr = np.asarray(info["intrinsic"], np.float32).copy()
    intr[:2] /= ratio
    px, py = np.meshgrid(np.arange(10, PAD[1] - 10, dtype=np.float32),
                         np.arange(10, PAD[0] - 10, dtype=np.float32))
    for t in range(V_TGT):
        dirs_ref, _, _ = ref_raydirs(intr, info["c2w"][t])
        ours = get_dtu_raydir(np.stack((px, py), axis=-1), intr,
                              info["c2w"][t][:3, :3]).reshape(-1, 3)
        assert np.abs(ours - dirs_ref).max() < 1e-6, t


def test_fullscale_whole_graph_parity(everything):
    model, variables, batch, _, info, origin, tm = everything

    # ---------------- jax: the production forward ---------------------
    head_outs, valid_j, render_j = jax.jit(
        lambda v, b: model.apply(v, b, train=False, with_rays=True)
    )(variables, batch)

    # ---------------- torch: the reference pipeline -------------------
    imgs = torch.tensor(np.asarray(batch["imgs"])).permute(0, 3, 1, 2)
    denorm = torch.tensor(
        np.asarray(batch["denorm_images"])).permute(0, 3, 1, 2)
    with torch.no_grad():
        feats = tm["fpn"](tm["backbone"](imgs))[0]  # (V, 256, 60, 80)

        stride = 4
        fh, fw = IMG[0] // stride, IMG[1] // stride  # 59, 80
        proj = t_projection(info["intrinsic"], info["extrinsics"], stride)
        points = t_points(origin)
        vol, valid = t_backproject(feats[:, :, :fh, :fw], points, proj)
        valid_cnt = valid.sum(dim=0).float()
        vol_mean, _ = t_masked_mean_cov(vol, valid_cnt)

        rgb_proj = t_projection(info["intrinsic"], info["extrinsics"], 1)
        rgb_vol, _ = t_backproject(denorm[:, :, :IMG[0], :IMG[1]],
                                   points, rgb_proj)
        n_v, c_f = vol.shape[:2]
        mapped = tm["mapping"](
            vol.view(n_v, c_f, -1).permute(0, 2, 1)).permute(
            0, 2, 1).view(n_v, -1, *N_VOX)
        glob = torch.cat([rgb_vol, mapped], dim=1)
        g_mean, g_cov = t_masked_mean_cov(glob, valid_cnt)
        gv = torch.cat([g_mean, g_cov], dim=0).view(
            -1, int(np.prod(N_VOX))).t()
        density = tm["mlp"].query_density(points.view(3, -1).t(), gv)
        alpha = 1 - torch.exp(-density)
        det_vol = alpha.t().view(1, *N_VOX) * vol_mean
        det_vol[:, valid_cnt[0] == 0] = 0.0

        scales_t = tm["neck3d"](det_vol.unsqueeze(0))
        outs_t = tm["head"](scales_t)

        featmaps = tm["mapping"](
            feats[:, :, :fh, :fw].reshape(n_v, c_f, -1).permute(0, 2, 1)
        ).permute(0, 2, 1).reshape(n_v, -1, fh, fw)
        rgb_t, depth_t, pmask_t = t_render(
            torch.tensor(np.asarray(batch["ray_o"])),
            torch.tensor(np.asarray(batch["ray_d"])),
            denorm, featmaps, info["intrinsic"], info["extrinsics"],
            tm["mlp"])

    # ---------------- comparisons --------------------------------------
    assert np.array_equal(np.asarray(valid_j), valid_cnt[0].numpy())

    # f32 tolerance at depth: the 50-layer backbone + 6-layer 3D stack
    # accumulate ~1e-3 of reassociation noise at these widths
    for s in range(N_SCALES):
        cen_j, reg_j, cls_j = head_outs[s]
        cen_t, reg_t, cls_t = [
            o[0].permute(1, 2, 3, 0).numpy() for o in outs_t[s]]
        for name, a, b in (("centerness", cen_j, cen_t),
                           ("bbox", reg_j, reg_t),
                           ("cls", cls_j, cls_t)):
            err = np.abs(np.asarray(a) - b).max()
            assert err <= 5e-3, f"scale {s} {name}: max err {err}"

    err_rgb = np.abs(np.asarray(render_j["rgb"]) - rgb_t.numpy()).max()
    assert err_rgb <= 1e-3, f"render rgb: max err {err_rgb}"
    err_d = np.abs(np.asarray(render_j["depth"]) - depth_t.numpy()).max()
    assert err_d <= 5e-3, f"render depth: max err {err_d}"
    assert np.array_equal(
        np.asarray(render_j["mask"]),
        (pmask_t.float().sum(dim=1) > 8).numpy())
