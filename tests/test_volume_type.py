"""`volume_type` ablation key (the reference's fast_cov config family,
`configs/imvoxelnet/imvoxelnet_scannet_fast_cov_w_mean_volume_renderrgb_image_mode_1028_rgb_depthtest.py:44`
— dead upstream, live here): the fused statistic feeding the 3D neck is
mean / cov / mean*cov. Checked against the streaming fusion's own
mean/cov outputs, with and without the nerf-density modulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.data.synthetic import make_synthetic_scene
from nerfdet_tpu.models.builder import build_model
from nerfdet_tpu.models.nerfdet import NerfDet, SceneMeta

META = SceneMeta(ori_shape=(128, 160), img_shape=(31, 40),
                 pad_shape=(32, 40))


def tiny(volume_type, nerf_density=False):
    return NerfDet(
        n_voxels=(8, 8, 4), voxel_size=(0.8, 0.8, 0.8),
        aabb=((-3.2, -3.2, -1.1), (3.2, 3.2, 2.1)),
        n_samples=16, n_rand=32, nerf_density=nerf_density,
        volume_type=volume_type, meta=META)


def scene():
    s = make_synthetic_scene(seed=3, n_views=3, n_targets=1,
                             hw=(31, 40), pad_hw=(32, 40), n_rand=32,
                             n_boxes=2, max_gt=4, margin=2)
    return {k: jnp.asarray(v) for k, v in s.items()
            if k in ("imgs", "denorm_images", "intrinsic", "extrinsics",
                     "origin")}


def _volume(model, batch):
    variables = model.init(jax.random.PRNGKey(0), batch, train=False,
                           with_rays=model.nerf_density)

    def vol(v):
        return model.apply(
            v, batch["imgs"], method=lambda m, i: m.build_volume(
                m.extract_2d(i), batch["denorm_images"],
                batch["intrinsic"], batch["extrinsics"], batch["origin"],
                use_nerf=m.nerf_density))

    return variables, jax.jit(vol)(variables)


@pytest.mark.parametrize("vt", ["mean", "cov", "cov_w_mean"])
def test_volume_type_statistic(vt):
    batch = scene()
    _, out = _volume(tiny(vt), batch)
    mean, cov = out["mean"], out["cov"]
    observed = (out["valid"] > 0)[..., None]
    expect = {"mean": mean, "cov": cov, "cov_w_mean": mean * cov}[vt]
    expect = jnp.where(observed, expect, 0.0)
    np.testing.assert_allclose(out["det_volume"], expect, atol=1e-6)


def test_volume_types_differ():
    batch = scene()
    outs = {vt: _volume(tiny(vt), batch)[1]["det_volume"]
            for vt in ("mean", "cov", "cov_w_mean")}
    assert float(jnp.abs(outs["mean"] - outs["cov"]).max()) > 1e-3
    assert float(jnp.abs(outs["mean"] - outs["cov_w_mean"]).max()) > 1e-3


def test_density_modulates_chosen_statistic():
    batch = scene()
    model = tiny("cov_w_mean", nerf_density=True)
    _, out = _volume(model, batch)
    # alpha in (0, 1): the modulated volume is strictly inside the
    # unmodulated statistic wherever it is nonzero
    base = out["mean"] * out["cov"]
    det = out["det_volume"]
    nz = jnp.abs(base) > 1e-6
    assert float((jnp.abs(det) <= jnp.abs(base) + 1e-6)[nz].mean()) == 1.0


def test_fast_cov_config_routes_to_nerfdet():
    from nerfdet_tpu.config import Config

    cfg = Config.fromfile(
        "configs/imvoxelnet/imvoxelnet_scannet_fast_cov_w_mean_volume.py")
    model = build_model(cfg.model, meta=META)
    assert isinstance(model, NerfDet)
    assert model.volume_type == "cov_w_mean"
    assert model.nerf_density


def test_fast_depth_config_routes_mean():
    from nerfdet_tpu.config import Config

    cfg = Config.fromfile(
        "configs/imvoxelnet/imvoxelnet_scannet_fast_depth_1.py")
    model = build_model(cfg.model, meta=META)
    assert isinstance(model, NerfDet)
    assert model.volume_type == "mean"
