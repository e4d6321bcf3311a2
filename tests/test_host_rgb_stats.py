"""Host-precomputed rgb statistics (ops/voxel.host_rgb_stats).

The nerf_density global volume's rgb stream is a pure function of scene
geometry and the input images (reference `nerfdet.py:201-210` — the
rgb_volume back-projection), so the data pipeline can ship its per-voxel
sums and the device fusion scan skips the per-view full-resolution rgb
gather (PERF.md round 4). These tests pin the exactness claims:

* host projection/rounding/validity == `ops/voxel.project_points`;
* `fused_mean_cov(precomputed_extra=...)` == the in-scan rgb gather;
* the dataset integration ships stats that reproduce the device path.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.data.synthetic import make_synthetic_scene
from nerfdet_tpu.ops.voxel import (compute_projection, fused_mean_cov,
                                   get_points, host_rgb_stats,
                                   project_points)

# single-core smoke tier: flagship-path signal in <10 min (README)
pytestmark = pytest.mark.smoke

N_VOX = (8, 8, 4)
VSZ = (0.6, 0.6, 0.5)
HW = (31, 40)
PAD = (32, 40)
ORI = (62, 80)


def _scene(seed=0, n_views=5):
    return make_synthetic_scene(seed=seed, n_views=n_views, n_targets=1,
                                hw=HW, pad_hw=PAD, n_rand=32, n_boxes=3,
                                max_gt=8)


def _host_projection_parts(scene):
    """Re-run host_rgb_stats' projection math for mask comparison."""
    pts = np.asarray(get_points(N_VOX, VSZ, scene["origin"])).reshape(-1, 3)
    ratio = ORI[0] / HW[0]
    proj = compute_projection(scene["intrinsic"], scene["extrinsics"],
                              ratio)
    x, y, z, valid = project_points(jnp.asarray(pts), proj, HW[0], HW[1])
    return np.asarray(x), np.asarray(y), np.asarray(valid)


def test_host_projection_matches_device():
    """Pixel indices and validity agree with project_points (CPU f32)."""
    scene = _scene()
    x_d, y_d, valid_d = _host_projection_parts(scene)

    # host twin: recompute via host_rgb_stats internals by calling it on
    # a one-hot image and reading the gathered mass — instead compare
    # the sums directly on random images below; here check the count
    # surrogate: stats of an all-ones image give per-voxel view counts.
    ones = np.ones_like(scene["denorm_images"])
    s1, _ = host_rgb_stats(ones, scene["intrinsic"], scene["extrinsics"],
                           scene["origin"], N_VOX, VSZ, ORI, HW)
    count_host = s1[:, 0]
    count_dev = np.asarray(valid_d).astype(np.float32).sum(0)
    np.testing.assert_array_equal(count_host, count_dev)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_precomputed_extra_matches_in_scan(dtype):
    """fused_mean_cov(precomputed) == the in-scan rgb gather, bitwise on
    CPU (same f32 projection, same per-view rounding, same bf16 cast)."""
    scene = _scene(seed=3)
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    v = scene["imgs"].shape[0]
    c_feat = 16
    rng = np.random.RandomState(0)
    fh, fw = PAD[0] // 4, PAD[1] // 4
    feats = jnp.asarray(
        rng.randn(v, fh, fw, c_feat).astype(np.float32)).astype(cdt)
    kernel = jnp.asarray(rng.randn(c_feat, 4).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))

    pts = get_points(N_VOX, VSZ, scene["origin"]).reshape(-1, 3)
    ratio_feat = ORI[0] / (HW[0] / 4)
    proj = compute_projection(scene["intrinsic"], scene["extrinsics"],
                              ratio_feat)
    rgb_proj = compute_projection(scene["intrinsic"], scene["extrinsics"],
                                  ORI[0] / HW[0])
    feat_hw = (HW[0] // 4, HW[1] // 4)

    ref = fused_mean_cov(
        feats, pts, proj, image_hw=feat_hw,
        extra_features=jnp.asarray(scene["denorm_images"]).astype(cdt),
        extra_projection=rgb_proj, extra_image_hw=HW,
        mapped_kernel=kernel, mapped_bias=bias)

    s1, s2 = host_rgb_stats(scene["denorm_images"], scene["intrinsic"],
                            scene["extrinsics"], scene["origin"],
                            N_VOX, VSZ, ORI, HW, compute_dtype=dtype)
    got = fused_mean_cov(
        feats, pts, proj, image_hw=feat_hw,
        mapped_kernel=kernel, mapped_bias=bias,
        precomputed_extra=(jnp.asarray(s1), jnp.asarray(s2)))

    names = ("mean", "cov", "count", "g_mean", "g_cov")
    for name, a, b in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6, err_msg=name)


def test_dataset_ships_stats_and_model_agrees(tmp_path):
    """End-to-end: dataset integration emits rgb_s1/s2 and the flagship
    forward with the precomputed path matches the device-gather path."""
    from nerfdet_tpu.data import (MultiViewPipeline,
                                  ScanNetMultiViewDataset,
                                  write_synthetic_scannet)
    from tests.test_train_step import tiny_model

    from nerfdet_tpu.models.nerfdet import SceneMeta

    root = write_synthetic_scannet(str(tmp_path / "scan"), n_scenes=1,
                                   n_images=4, hw=HW, splits=("val",))
    # meta must MATCH the data geometry (as the config guarantees in
    # production): the host stats use the sample's ori/img shapes, the
    # device path the model's SceneMeta — equality needs them equal
    model = dc.replace(tiny_model(), meta=SceneMeta(
        ori_shape=HW, img_shape=HW, pad_shape=PAD))
    pipe = dict(n_images=3, img_scale=(HW[1], HW[0]), pad_size=PAD,
                margin=4, nerf_target_views=1)
    spec = (model.n_voxels, model.voxel_size, "float32")
    kw = dict(data_root=root, ann_file=f"{root}/scannet_infos_val.pkl",
              test_mode=True, use_ray=True)
    ds = ScanNetMultiViewDataset(
        pipeline=MultiViewPipeline(**pipe), rgb_stats_spec=spec, **kw)
    ds_plain = ScanNetMultiViewDataset(
        pipeline=MultiViewPipeline(**pipe), **kw)

    s = ds[0]
    assert "rgb_s1" in s and s["rgb_s1"].shape == (
        int(np.prod(model.n_voxels)), 3)
    s0 = ds_plain[0]
    assert "rgb_s1" not in s0

    def fwd(sample):
        b = {k: jnp.asarray(np.asarray(v)) for k, v in sample.items()
             if k in ("imgs", "denorm_images", "intrinsic", "extrinsics",
                      "origin", "rgb_s1", "rgb_s2")}
        b["ray_o"] = jnp.asarray(np.asarray(sample["ray_o"]).reshape(-1, 3)[:16])
        b["ray_d"] = jnp.asarray(np.asarray(sample["ray_d"]).reshape(-1, 3)[:16])
        variables = model.init(jax.random.PRNGKey(0), b, train=False,
                               with_rays=True)
        return model.apply(variables, b, train=False, with_rays=True)

    (head_a, valid_a, render_a) = fwd(s)
    (head_b, valid_b, render_b) = fwd(s0)
    np.testing.assert_allclose(np.asarray(valid_a), np.asarray(valid_b))
    for (ca, ba, sa), (cb, bb, sb) in zip(head_a, head_b):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                   rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(render_a["rgb"]),
                               np.asarray(render_b["rgb"]),
                               rtol=0, atol=2e-5)


def test_device_twin_bitwise_on_cpu():
    """`device_rgb_stats` (the perfsuite honesty-key probe) vs the host
    pipeline on CPU: the sums are bitwise-equal in both dtypes; the f32
    squared-sum is within 2 ulp (XLA fuses the x*x multiply into the
    reduction as an FMA, numpy rounds the product first). In the
    flagship's bf16 dtype both stats are bitwise-equal — the squares of
    bf16-cast values and their few-term sums are exact in f32."""
    from nerfdet_tpu.ops.voxel import device_rgb_stats

    scene = _scene(seed=3, n_views=4)
    for dtype in (jnp.float32, jnp.bfloat16):
        s1_h, s2_h = host_rgb_stats(
            scene["denorm_images"], scene["intrinsic"],
            scene["extrinsics"], scene["origin"], N_VOX, VSZ, ORI, HW,
            compute_dtype=("bfloat16" if dtype == jnp.bfloat16
                           else np.float32))
        d1, d2 = jax.jit(lambda im, k, e, o, dt=dtype: device_rgb_stats(
            im, k, e, o, N_VOX, VSZ, ORI, HW, compute_dtype=dt))(
            scene["denorm_images"], scene["intrinsic"],
            scene["extrinsics"], scene["origin"])
        np.testing.assert_array_equal(np.asarray(d1), s1_h)
        if dtype == jnp.bfloat16:
            np.testing.assert_array_equal(np.asarray(d2), s2_h)
        else:
            np.testing.assert_allclose(np.asarray(d2), s2_h,
                                       rtol=3e-7, atol=0)
