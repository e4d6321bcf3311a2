"""Host-precomputed ray rgb statistics (ops/render.host_ray_rgb_stats).

The renderer's per-sample-point source-view COLORS are a pure function
of ray geometry and the input images (reference `projection.py:91-151`),
so the data pipeline can ship the scan's rgb accumulators and the
device render gathers only the feature maps (PERF.md round 5). These
tests pin the exactness claims:

* `streaming_sample_mean_var(precomputed_rgb=...)` == the in-scan rgb
  sampling, given the same z_vals;
* the full model render (and the train-step loss) agree between the
  two paths;
* the dataset integration ships stats that reproduce the device path.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfdet_tpu.data.synthetic import make_synthetic_scene
from nerfdet_tpu.ops.render import (host_ray_rgb_stats, host_sample_z,
                                    streaming_sample_mean_var)

# single-core smoke tier: flagship-path signal in <10 min (README)
pytestmark = pytest.mark.smoke

HW = (31, 40)
PAD = (32, 40)
ORI = (62, 80)
N_RAND, N_SAMPLES = 24, 16
NEAR_FAR = (0.2, 6.0)


def _scene(seed=0, n_views=5):
    return make_synthetic_scene(seed=seed, n_views=n_views, n_targets=1,
                                hw=HW, pad_hw=PAD, n_rand=N_RAND,
                                n_boxes=3, max_gt=8)


def _intr4(intrinsic, n_views):
    ratio = ORI[0] / HW[0]
    intr = np.asarray(intrinsic, np.float32)
    i4 = np.eye(4, dtype=np.float32)
    i4[: intr.shape[0], : intr.shape[1]] = intr
    i4[:2] /= ratio
    return jnp.broadcast_to(jnp.asarray(i4), (n_views, 4, 4))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_streaming_equivalence(dtype):
    """Same globalfeat/pixel_mask with and without the host rgb stream,
    from identical z_vals."""
    scene = _scene(seed=1)
    v = scene["extrinsics"].shape[0]
    rng = np.random.RandomState(7)
    z = host_sample_z(rng, N_RAND, *NEAR_FAR, N_SAMPLES)
    pts = (z[..., None] * scene["ray_d"][:, None, :]
           + scene["ray_o"][:, None, :])
    images = jnp.asarray(scene["denorm_images"]).astype(dtype)
    featmaps = jnp.asarray(
        np.random.RandomState(3).rand(v, 8, 10, 6).astype(np.float32)
    ).astype(dtype)
    intr = _intr4(scene["intrinsic"], v)
    poses = jnp.asarray(scene["extrinsics"])

    gf_dev, m_dev = jax.jit(
        lambda p: streaming_sample_mean_var(
            p, images, intr, poses, HW, featmaps=featmaps))(
        jnp.asarray(pts))

    host = host_ray_rgb_stats(
        scene["denorm_images"], scene["intrinsic"], scene["extrinsics"],
        scene["ray_o"], scene["ray_d"], z, ORI, HW,
        compute_dtype=("bfloat16" if dtype == jnp.bfloat16
                       else np.float32))
    gf_pre, m_pre = jax.jit(
        lambda p, h: streaming_sample_mean_var(
            p, images, intr, poses, HW, featmaps=featmaps,
            precomputed_rgb=h))(
        jnp.asarray(pts), tuple(jnp.asarray(x) for x in host))

    np.testing.assert_array_equal(np.asarray(m_pre), np.asarray(m_dev))
    gf_pre = np.asarray(gf_pre, np.float32)
    gf_dev = np.asarray(gf_dev, np.float32)
    cf = featmaps.shape[-1]
    # channel layout: [rgb mean (3), feat mean (cf), exp(-var) rgb (3),
    # exp(-var) feat (cf)]. The rgb channels are EXACT (the in-scan rgb
    # taps are f32-pinned to the host law); the featmap channels agree
    # to bf16 rounding only — XLA's bf16 tap-sum accumulation order is
    # compilation-context dependent (measured ~1.5e-3; pinning it f32
    # costs 32% on the NVS path, PERF.md round 5), and those channels
    # are computed by the DEVICE in both paths anyway.
    rgb_idx = np.r_[0:3, 3 + cf:6 + cf]
    feat_idx = np.r_[3:3 + cf, 6 + cf:6 + 2 * cf]
    np.testing.assert_allclose(gf_pre[..., rgb_idx],
                               gf_dev[..., rgb_idx],
                               rtol=2e-6, atol=2e-6)
    feat_tol = 2e-6 if dtype == jnp.float32 else 4e-3
    np.testing.assert_allclose(gf_pre[..., feat_idx],
                               gf_dev[..., feat_idx],
                               rtol=feat_tol, atol=feat_tol)


def test_full_model_paths_agree():
    """The complete NerfDet forward (render branch) and the train-step
    loss terms agree between the device and host-precomputed paths."""
    from nerfdet_tpu.models.nerfdet import NerfDet, SceneMeta

    scene = _scene(seed=2, n_views=4)
    model = NerfDet(
        backbone_depth=50, n_voxels=(8, 8, 4),
        voxel_size=(0.8, 0.8, 0.8),
        aabb=((-3.2, -3.2, -1.1), (3.2, 3.2, 2.1)),
        near_far_range=NEAR_FAR, n_samples=N_SAMPLES, n_rand=N_RAND,
        nerf_density=True,
        meta=SceneMeta(ori_shape=ORI, img_shape=HW, pad_shape=PAD))
    base = {k: jnp.asarray(v) for k, v in scene.items()}
    rng = np.random.RandomState(11)
    z = host_sample_z(rng, N_RAND, *NEAR_FAR, N_SAMPLES)
    dev_batch = dict(base, z_vals=jnp.asarray(z))
    host = host_ray_rgb_stats(
        scene["denorm_images"], scene["intrinsic"], scene["extrinsics"],
        scene["ray_o"], scene["ray_d"], z, ORI, HW)
    pre_batch = dict(dev_batch,
                     ray_s1u=jnp.asarray(host[0]),
                     ray_s2u=jnp.asarray(host[1]),
                     ray_s1m=jnp.asarray(host[2]),
                     ray_cnt=jnp.asarray(host[3]))

    variables = jax.jit(
        lambda k: model.init(k, dev_batch, train=False,
                             with_rays=True))(jax.random.PRNGKey(0))

    def fwd(b):
        return model.apply(variables, b, train=False, with_rays=True)

    (h_a, v_a, r_a) = jax.jit(fwd)(dev_batch)
    (h_b, v_b, r_b) = jax.jit(fwd)(pre_batch)
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))
    np.testing.assert_allclose(np.asarray(r_b["rgb"]),
                               np.asarray(r_a["rgb"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_b["depth"]),
                               np.asarray(r_a["depth"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(r_a["mask"]),
                                  np.asarray(r_b["mask"]))


def test_dataset_ships_ray_stats(tmp_path):
    """ScanNetMultiViewDataset with ray_stats_spec attaches z_vals +
    the four accumulators, and they reproduce the device scan."""
    from nerfdet_tpu.data.dataset import ScanNetMultiViewDataset
    from nerfdet_tpu.data.pipeline import MultiViewPipeline
    from nerfdet_tpu.data.synthetic import write_synthetic_scannet

    root = str(tmp_path / "syn")
    # raw images written at HW directly: ori_shape == img_shape == HW
    write_synthetic_scannet(root, n_scenes=1, n_images=4, hw=HW)
    ds = ScanNetMultiViewDataset(
        data_root=root,
        ann_file=f"{root}/scannet_infos_train.pkl",
        pipeline=MultiViewPipeline(
            n_images=3, img_scale=(HW[1], HW[0]), pad_size=PAD,
            margin=2, nerf_target_views=1),
        n_rand=N_RAND,
        ray_stats_spec=(NEAR_FAR, N_SAMPLES, "float32"),
        filter_empty_gt=False)
    sample = ds[0]
    for k in ("z_vals", "ray_s1u", "ray_s2u", "ray_s1m", "ray_cnt"):
        assert k in sample, k
    assert sample["z_vals"].shape == (N_RAND, N_SAMPLES)
    assert sample["ray_s1u"].shape == (N_RAND, N_SAMPLES, 3)
    assert sample["ray_cnt"].shape == (N_RAND, N_SAMPLES, 1)
    # z_vals strictly increasing per ray (stratified)
    assert (np.diff(sample["z_vals"], axis=1) > 0).all()
    # recompute from the shipped sample: must match exactly
    s1u, s2u, s1m, cnt = host_ray_rgb_stats(
        sample["denorm_images"], sample["intrinsic"],
        sample["extrinsics"], sample["ray_o"], sample["ray_d"],
        sample["z_vals"], HW, HW)
    np.testing.assert_array_equal(sample["ray_s1u"], s1u)
    np.testing.assert_array_equal(sample["ray_cnt"], cnt)


def test_eval_path_unaffected(tmp_path):
    """test_mode datasets never ship the ray keys (eval renders on
    device, full-image)."""
    from nerfdet_tpu.data.dataset import ScanNetMultiViewDataset
    from nerfdet_tpu.data.pipeline import MultiViewPipeline
    from nerfdet_tpu.data.synthetic import write_synthetic_scannet

    root = str(tmp_path / "syn")
    write_synthetic_scannet(root, n_scenes=1, n_images=4, hw=HW)
    ds = ScanNetMultiViewDataset(
        data_root=root,
        ann_file=f"{root}/scannet_infos_val.pkl",
        pipeline=MultiViewPipeline(
            n_images=3, img_scale=(HW[1], HW[0]), pad_size=PAD,
            margin=2, nerf_target_views=1),
        test_mode=True,
        ray_stats_spec=(NEAR_FAR, N_SAMPLES, "float32"))
    sample = ds[0]
    assert "z_vals" not in sample and "ray_s1u" not in sample
