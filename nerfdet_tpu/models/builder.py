"""Build models from reference-style config dicts.

Preserves the config surface of `configs/nerfdet/*.py` (the `model`,
`train_cfg`, `test_cfg` keys) while constructing the TPU-native modules.
A light registry keeps the string-keyed extensibility of the reference's
DETECTORS/NECKS/HEADS registries (`mmdet3d/models/builder.py:1-53`)
without the framework-wide indirection.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .nerfdet import NerfDet, SceneMeta

MODELS: Dict[str, Any] = {}


def register_model(name: str):
    def deco(fn):
        MODELS[name] = fn
        return fn

    return deco


@register_model("nerfdet")
def _build_nerfdet(cfg: dict, meta: SceneMeta = None,
                   compute_dtype=jnp.float32) -> NerfDet:
    backbone = cfg["backbone"]
    neck = cfg["neck"]
    neck_3d = cfg["neck_3d"]
    head = cfg["bbox_head"]
    btype = backbone.get("type", "ResNet")
    assert btype in ("ResNet", "SwinTransformer"), btype
    swin_cfg = None
    if btype == "SwinTransformer":
        swin_cfg = {k: tuple(v) if isinstance(v, list) else v
                    for k, v in backbone.items()
                    if k in ("embed_dims", "patch_size", "window_size",
                             "mlp_ratio", "depths", "num_heads",
                             "out_indices", "qkv_bias")}
    return NerfDet(
        backbone_type=btype,
        backbone_cfg=swin_cfg,
        backbone_depth=backbone.get("depth", 50),
        fpn_in_channels=tuple(neck["in_channels"]),
        fpn_out_channels=neck["out_channels"],
        neck3d_out_channels=neck_3d["out_channels"],
        neck3d_n_blocks=tuple(neck_3d["n_blocks"]),
        n_classes=head["n_classes"],
        head_n_reg_outs=head["n_reg_outs"],
        n_scales=head["n_scales"],
        head_limit=head["limit"],
        head_centerness_topk=head["centerness_topk"],
        n_voxels=tuple(cfg["n_voxels"]),
        voxel_size=tuple(cfg["voxel_size"]),
        aabb=tuple(tuple(x) for x in cfg["aabb"]),
        near_far_range=tuple(cfg["near_far_range"]),
        n_samples=cfg.get("N_samples", 64),
        n_rand=cfg.get("N_rand", 2048),
        nerf_mode=cfg.get("nerf_mode", "image"),
        squeeze_scale=cfg.get("squeeze_scale", 4),
        nerf_density=cfg.get("nerf_density", False),
        volume_type=cfg.get("volume_type", "mean"),
        meta=meta or SceneMeta(),
        compute_dtype=compute_dtype,
    )


@register_model("imvoxelnet")
def _build_imvoxelnet(cfg: dict, meta: SceneMeta = None,
                      compute_dtype=jnp.float32) -> NerfDet:
    """ImVoxelNet = the same volume detector without the NeRF branch
    (the reference derives NeRF-Det from SamsungLabs/ImVoxelNet;
    `README.md:54-57`). Rays/density are disabled."""
    cfg = dict(cfg, nerf_density=False)
    model = _build_nerfdet(cfg, meta=meta, compute_dtype=compute_dtype)
    return model


@register_model("ImVoxelNet")
def _build_imvoxelnet_ref(cfg: dict, meta: SceneMeta = None,
                          compute_dtype=jnp.float32):
    """The reference's `type='ImVoxelNet'` configs — dispatched by the
    3D-neck type: Kitti/NuScenes BEV necks build the outdoor anchor
    detector, the Atlas/Fast indoor necks the indoor FCOS-style one.
    NOTE: the reference ships all these configs, necks and heads but
    not the detector class itself — `models/imvoxelnet.py` (outdoor)
    and `models/imvoxelnet_indoor.py` complete them. The outdoor path
    returns the model; use `models.imvoxelnet.build_imvoxelnet_outdoor`
    for (model, anchors)."""
    n3_type = cfg.get("neck_3d", {}).get("type", "KittiImVoxelNeck")
    if n3_type in ("ImVoxelNeck", "FastIndoorImVoxelNeck"):
        # the fast_cov ablation family (56 `imvoxelnet_scannet_fast_cov*`
        # configs) is NeRF-Det's dev surface typed as ImVoxelNet: any
        # nerf key present routes to the full NeRF-Det graph so
        # volume_type / nerf_mode / nerf_density / render supervision
        # all take effect
        if any(k in cfg for k in ("volume_type", "nerf_mode",
                                  "nerf_density", "N_samples")):
            return _build_nerfdet(cfg, meta=meta,
                                  compute_dtype=compute_dtype)
        from .imvoxelnet_indoor import build_imvoxelnet_indoor

        return build_imvoxelnet_indoor(cfg, meta=meta,
                                       compute_dtype=compute_dtype)
    from .imvoxelnet import build_imvoxelnet_outdoor

    return build_imvoxelnet_outdoor(cfg, compute_dtype=compute_dtype)[0]


@register_model("VoteNet")
def _build_votenet(cfg: dict, meta: SceneMeta = None,
                   compute_dtype=jnp.float32):
    """Point-cloud VoteNet (reference `detectors/votenet.py`)."""
    from .votenet import SCANNET_MEAN_SIZES, VoteNet

    head = cfg.get("bbox_head", {})
    coder = head.get("bbox_coder", {})
    return VoteNet(
        num_classes=head.get("num_classes", 18),
        num_dir_bins=coder.get("num_dir_bins", 1),
        with_rot=coder.get("with_rot", False),
        mean_sizes=tuple(tuple(m) for m in coder.get(
            "mean_sizes", SCANNET_MEAN_SIZES)),
        num_proposal=head.get("num_proposal", 256),
        backbone_cfg=cfg.get("backbone_cfg"),
        iou_loss_weight=(head.get("iou_loss") or {}).get(
            "loss_weight", 1.0) if head.get("iou_loss") else 0.0,
        dtype=compute_dtype,
    )


@register_model("H3DNet")
def _build_h3dnet(cfg: dict, meta: SceneMeta = None,
                  compute_dtype=jnp.float32):
    """Two-stage geometric-primitive detector (reference
    `detectors/h3dnet.py` + `roi_heads/h3d_roi_head.py`)."""
    from .h3dnet import H3DNet
    from .votenet import SCANNET_MEAN_SIZES

    rpn = cfg.get("rpn_head", {})
    coder = rpn.get("bbox_coder", {})
    backbone = cfg.get("backbone", {})
    bcfg = backbone.get("backbone_cfg") or {}
    # seeds = the last FP level's point count; the primitive heads'
    # proposal count must equal it (reference config: both 1024)
    num_points = bcfg.get("num_points", (2048, 1024, 512, 256))
    n_fp = len(bcfg.get("fp_channels", ((256, 256), (256, 256))))
    num_seed = num_points[len(num_points) - n_fp - 1]
    return H3DNet(
        num_classes=rpn.get("num_classes", 18),
        num_dir_bins=coder.get("num_dir_bins", 24),
        with_rot=coder.get("with_rot", False),
        mean_sizes=tuple(tuple(m) for m in coder.get(
            "mean_sizes", SCANNET_MEAN_SIZES)),
        num_proposal=rpn.get("num_proposal", 256),
        primitive_num_proposal=cfg.get("roi_head", {}).get(
            "primitive_num_proposal", num_seed),
        num_streams=backbone.get("num_streams", 4),
        backbone_cfg=backbone.get("backbone_cfg"),
        dtype=compute_dtype,
    )


@register_model("VoxelNet")
@register_model("DynamicVoxelNet")
def _build_voxelnet(cfg: dict, meta: SceneMeta = None,
                    compute_dtype=jnp.float32):
    """LiDAR single-stage detectors (reference `detectors/voxelnet.py`,
    `dynamic_voxelnet.py`). Returns the model; use
    `models.voxelnet.build_voxelnet` for (model, anchors)."""
    from .voxelnet import build_voxelnet

    return build_voxelnet(cfg, compute_dtype=compute_dtype)[0]


@register_model("FCOS3D")
def _build_fcos3d(cfg: dict, meta: SceneMeta = None,
                  compute_dtype=jnp.float32):
    """Monocular camera-frame detector (reference
    `detectors/fcos3d.py`)."""
    from .fcos3d import build_fcos3d

    return build_fcos3d(cfg, compute_dtype=compute_dtype)


@register_model("MVXFasterRCNN")
@register_model("DynamicMVXFasterRCNN")
def _build_mvx(cfg: dict, meta: SceneMeta = None,
               compute_dtype=jnp.float32):
    """Multi-modality voxel detectors (reference
    `detectors/mvx_two_stage.py`, `mvx_faster_rcnn.py`). Returns the
    model; use `models.mvx.build_mvx` for (model, anchors)."""
    from .mvx import build_mvx

    return build_mvx(cfg, compute_dtype=compute_dtype)[0]


@register_model("SSD3DNet")
def _build_ssd3dnet(cfg: dict, meta: SceneMeta = None,
                    compute_dtype=jnp.float32):
    """Anchor-free single-stage point detector (reference
    `detectors/ssd3dnet.py` + `dense_heads/ssd_3d_head.py`)."""
    from .ssd3dnet import SSD3DNet

    head = cfg.get("bbox_head", {})
    coder = head.get("bbox_coder", {})
    bb = cfg.get("backbone", {})
    bcfg = {k: v for k, v in bb.items()
            if k in ("in_channels", "num_points", "radii", "num_samples",
                     "sa_channels", "aggregation_channels", "fps_mods",
                     "fps_sample_range_lists", "dilated_group")}
    # normalize the reference's scalar-or-tuple config fields
    if "fps_mods" in bcfg:
        bcfg["fps_mods"] = tuple(
            (m,) if isinstance(m, str) else tuple(m)
            for m in bcfg["fps_mods"])
    if "fps_sample_range_lists" in bcfg:
        bcfg["fps_sample_range_lists"] = tuple(
            (r,) if isinstance(r, int) else tuple(r)
            for r in bcfg["fps_sample_range_lists"])
    return SSD3DNet(
        num_classes=head.get("num_classes", 1),
        num_dir_bins=coder.get("num_dir_bins", 12),
        with_rot=coder.get("with_rot", True),
        num_candidates=head.get("vote_module_cfg", {}).get(
            "num_points", 256),
        backbone_cfg=bcfg or None,
        dtype=compute_dtype,
    )


@register_model("PartA2")
def _build_parta2(cfg: dict, meta: SceneMeta = None,
                  compute_dtype=jnp.float32):
    """Two-stage part-aware LiDAR detector (reference
    `detectors/parta2.py`). Returns the model; use
    `models.parta2.build_parta2` for (model, anchors)."""
    from .parta2 import build_parta2

    return build_parta2(cfg, compute_dtype=compute_dtype)[0]


@register_model("CenterPoint")
def _build_centerpoint(cfg: dict, meta: SceneMeta = None,
                       compute_dtype=jnp.float32):
    """Center-based LiDAR detector (reference
    `detectors/centerpoint.py`). Returns the model; use
    `models.centerpoint.build_centerpoint` for (model, aux)."""
    from .centerpoint import build_centerpoint

    return build_centerpoint(cfg, compute_dtype=compute_dtype)[0]


# 2D instance-segmentation stacks (configs/nuimages/*): the reference
# trains these with EXTERNAL mmdet models on the nuImages COCO export.
# This framework ships the complete data path (data/nuimages_etl.py)
# and the config surface, but scopes the 2D model stacks out of its 3D
# scope (docs/migration.md "nuimages") — building one raises the
# documented decision instead of a generic unknown-type error.
SCOPED_OUT_2D_MSG = (
    "{name} is a 2D instance-segmentation model the reference delegates "
    "to external mmdet (configs/nuimages/*). This framework scopes 2D "
    "instance segmentation out: the nuImages DATA path is complete "
    "(tools/create_data.py nuimages -> COCO json, "
    "data/nuimages_etl.py), so any 2D stack can consume the export. "
    "See docs/migration.md, section 'nuimages'.")


def _register_scoped_out_2d(name: str):
    @register_model(name)
    def _scoped(cfg: dict, meta: SceneMeta = None,
                compute_dtype=jnp.float32):
        raise NotImplementedError(SCOPED_OUT_2D_MSG.format(name=name))


for _name in ("MaskRCNN", "CascadeRCNN", "HybridTaskCascade"):
    _register_scoped_out_2d(_name)


def build_model(model_cfg: dict, meta: SceneMeta = None,
                compute_dtype=jnp.float32):
    """Construct a model module from a config ``model`` dict."""
    mtype = model_cfg["type"]
    if mtype not in MODELS:
        raise KeyError(
            f"unknown model type {mtype!r}; registered: {sorted(MODELS)}"
        )
    return MODELS[mtype](model_cfg, meta=meta, compute_dtype=compute_dtype)
