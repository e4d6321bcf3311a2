"""Ray sampling, multi-view feature conditioning, volume rendering.

TPU-native equivalent of the reference renderer
(`mmdet3d/models/model_utils/render_ray.py` and `projection.py`). All
shapes are static: the training-time random ray subset is drawn in the
data layer (host numpy, own RNG streams — no reference-RNG replay), and
test-time full-image rendering maps a fixed-size chunk function with
``lax.map``.

The per-(ray,sample,view) feature gather is expressed as dense bilinear
sampling + masking, which XLA fuses into the surrounding elementwise
work; the MLP evaluation over all R*S points is a stack of large matmuls
on the MXU.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid_sample import (grid_sample_2d, grid_sample_2d_packed,
                          grid_sample_3d, pack_bilinear)


def sample_along_camera_ray(ray_o, ray_d, near: float, far: float,
                            n_samples: int, det: bool = False,
                            key: Optional[jax.Array] = None):
    """Stratified depth sampling (reference `render_ray.py:145-189`).

    Returns (pts (R, S, 3), z_vals (R, S)).
    """
    r = ray_d.shape[0]
    step = (far - near) / (n_samples - 1)
    z_vals = near + step * jnp.arange(n_samples, dtype=jnp.float32)
    z_vals = jnp.broadcast_to(z_vals[None, :], (r, n_samples))
    if not det:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, 0:1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    pts = (
        z_vals[..., None] * ray_d[:, None, :] + ray_o[:, None, :]
    )
    return pts, z_vals


def project_to_views(pts, intrinsics, poses):
    """Project sample points into every source view.

    Reference `projection.py:42-64`: ``K @ pose`` (pose is already the
    inverted camera-to-world, see `scannet_monocular_dataset.py:44-45`),
    perspective divide with z clamped to >= 1e-8, pixels clamped to
    ±1e6.

    Args:
        pts: (..., 3) world points.
        intrinsics: (V, 4, 4); poses: (V, 4, 4).

    Returns:
        pixels (V, ..., 2), in_front (V, ...).
    """
    shape = pts.shape[:-1]
    xyz = pts.reshape(-1, 3)
    xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=-1)
    proj = jnp.einsum("vij,vjk->vik", intrinsics, poses,
                      precision=jax.lax.Precision.HIGHEST)  # (V, 4, 4)
    cam = jnp.einsum("vij,nj->vni", proj, xyz_h,
                     precision=jax.lax.Precision.HIGHEST)  # (V, N, 4)
    z = jnp.clip(cam[..., 2:3], 1e-8, None)
    pixels = jnp.clip(cam[..., :2] / z, -1e6, 1e6)
    in_front = cam[..., 2] > 0
    return (
        pixels.reshape((intrinsics.shape[0],) + shape + (2,)),
        in_front.reshape((intrinsics.shape[0],) + shape),
    )


def projector_compute(pts, images, intrinsics, poses, img_hw,
                      featmaps=None):
    """Sample per-view RGB (+features) at ray sample points.

    Reference `projection.py:91-151` (grid_sample path, align_corners=True,
    zeros padding).

    Args:
        pts: (R, S, 3).
        images: (V, H, W, 3) de-normalized RGB in [0, 1].
        img_hw: static (H, W) the projection pixels live in.
        featmaps: optional (V, h, w, C) stride-s feature maps.

    Returns:
        rgb_feat (R, S, V, 3+C), mask (R, S, V, 1) float.
    """
    h, w = img_hw
    pixels, in_front = project_to_views(pts, intrinsics, poses)

    def sample_one(img, px, py):
        return grid_sample_2d(img, px, py, padding="zeros")

    px, py = pixels[..., 0], pixels[..., 1]
    # The reference normalizes pixel coords by (img_shape - 1) but
    # grid_samples the *padded* tensor, whose extent maps [-1, 1] onto
    # (tensor_size - 1) (`projection.py:37-40,120`). Mirror that exactly:
    # sampling any map of size (mh, mw) rescales the coords by
    # (m - 1) / (img_shape - 1) per axis.
    ih, iw = images.shape[1:3]
    rgb = jax.vmap(sample_one)(
        images,
        px * ((iw - 1.0) / (w - 1.0)),
        py * ((ih - 1.0) / (h - 1.0)),
    )  # (V, R, S, 3)
    if featmaps is not None:
        fh, fw = featmaps.shape[1:3]
        fx = px * ((fw - 1.0) / (w - 1.0))
        fy = py * ((fh - 1.0) / (h - 1.0))
        feat = jax.vmap(sample_one)(featmaps, fx, fy)
        rgb = jnp.concatenate([rgb, feat], axis=-1)

    inbound = (
        (px <= w - 1.0) & (px >= 0) & (py <= h - 1.0) & (py >= 0)
    )
    mask = (inbound & in_front).astype(jnp.float32)
    # (V, R, S, *) -> (R, S, V, *)
    rgb = jnp.moveaxis(rgb, 0, 2)
    mask = jnp.moveaxis(mask, 0, 2)[..., None]
    return rgb, mask


def compute_angle(xyz, query_pose, train_poses):
    """Per-(point, view) ray-direction difference features.

    Port of `projection.py:66-89` (IBRNet-style view-direction
    conditioning; defined on the reference Projector but unused by the
    shipped configs). Returns (V, ..., 4): unit difference vector of the
    query/source ray directions + their dot product.

    Args:
        xyz: (..., 3) sample points.
        query_pose: (4, 4) query camera-to-world.
        train_poses: (V, 4, 4) source camera-to-world.
    """
    shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    to_query = query_pose[:3, 3][None, None] - pts[None]
    to_query = to_query / (
        jnp.linalg.norm(to_query, axis=-1, keepdims=True) + 1e-6)
    to_train = train_poses[:, :3, 3][:, None] - pts[None]
    to_train = to_train / (
        jnp.linalg.norm(to_train, axis=-1, keepdims=True) + 1e-6)
    diff = to_query - to_train
    norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    dot = jnp.sum(to_query * to_train, axis=-1, keepdims=True)
    direction = diff / jnp.clip(norm, 1e-6, None)
    out = jnp.concatenate([direction, dot], axis=-1)
    return out.reshape((train_poses.shape[0],) + shape + (4,))


def streaming_sample_mean_var(pts, images, intrinsics, poses, img_hw,
                              featmaps=None, axis_name=None,
                              precomputed_rgb=None):
    """Fused per-view sampling + masked mean / exp(-var) over views.

    Numerically identical to ``projector_compute`` +
    ``compute_mask_points`` but streams over views with a ``lax.scan``,
    never materializing the (R, S, V, C) tensor — the renderer's HBM
    bottleneck (PERF.md). Returns (globalfeat (R, S, 2C),
    pixel_mask (R, S) = count > 1).

    ``axis_name``: when the VIEW axis is sharded over a mesh axis (each
    device holds a (V_local, ...) slice of images/featmaps/poses), the
    per-view sums are ``psum``-reduced over that axis so the returned
    statistics are the global-view values, replicated.

    ``precomputed_rgb``: optional ``(s1u, s2u, s1m, cnt)`` — the rgb
    stream's (R, S, 3)/(R, S, 1) f32 accumulators from the DATA
    PIPELINE (:func:`host_ray_rgb_stats`). The rgb image sampling is a
    pure function of ray geometry and the input images — no
    parameters — so when the host ships it, the scan gathers only the
    featmaps: the render's gather rows (and their backward scatter
    rows) halve (PERF.md round 5). The values are view-GLOBAL: under
    ``axis_name`` they are used as-is while the device feature sums
    are psummed.
    """
    h, w = img_hw
    pixels, in_front = project_to_views(pts, intrinsics, poses)
    px, py = pixels[..., 0], pixels[..., 1]
    ih, iw = images.shape[1:3]
    sx = (iw - 1.0) / (w - 1.0)
    sy = (ih - 1.0) / (h - 1.0)
    if featmaps is not None:
        fh, fw = featmaps.shape[1:3]
        fx_s = (fw - 1.0) / (w - 1.0)
        fy_s = (fh - 1.0) / (h - 1.0)
    inbound = (px <= w - 1.0) & (px >= 0) & (py <= h - 1.0) & (py >= 0)
    mask_all = (inbound & in_front)  # (V, R, S)

    r, s = pts.shape[:2]
    with_host_rgb = precomputed_rgb is not None
    assert not (with_host_rgb and featmaps is None), (
        "precomputed_rgb with no featmaps leaves nothing to scan")
    c = ((0 if with_host_rgb else 3)
         + (featmaps.shape[-1] if featmaps is not None else 0))

    def body(carry, view):
        s1u, s2u, s1m, cnt = carry
        if with_host_rgb:
            fm_v, px_v, py_v, m_v = view
            f = grid_sample_2d_packed(pack_bilinear(fm_v),
                                      px_v * fx_s, py_v * fy_s)
        else:
            if featmaps is not None:
                img_v, fm_v, px_v, py_v, m_v = view
            else:
                img_v, px_v, py_v, m_v = view
            # packed bilinear: ONE gather row per (point, view) instead
            # of four — row count bounds the gather and its backward
            # scatter (PERF.md, "packed bilinear gather"). f32 taps on
            # the rgb stream ONLY: they pin the reduction order the
            # host twin reproduces (host_ray_rgb_stats), and this
            # branch doesn't run at all when the host ships the stream
            f = grid_sample_2d_packed(pack_bilinear(img_v),
                                      px_v * sx, py_v * sy,
                                      f32_taps=True)
            if featmaps is not None:
                ff = grid_sample_2d_packed(pack_bilinear(fm_v),
                                           px_v * fx_s, py_v * fy_s)
                f = jnp.concatenate([f, ff], axis=-1)
        f = f.astype(jnp.float32)
        m = m_v.astype(jnp.float32)[..., None]
        return (s1u + f, s2u + f * f, s1m + f * m, cnt + m), None

    init = (jnp.zeros((r, s, c), jnp.float32),
            jnp.zeros((r, s, c), jnp.float32),
            jnp.zeros((r, s, c), jnp.float32),
            jnp.zeros((r, s, 1), jnp.float32))
    if with_host_rgb:
        xs = (featmaps, px, py, mask_all)
    else:
        xs = ((images, featmaps, px, py, mask_all)
              if featmaps is not None else (images, px, py, mask_all))
    # optional remat of the per-view (R, S, C) residuals — a measured
    # net loss at flagship shapes, opt-in for memory-constrained runs
    # (see the matching note in ops/voxel.fused_mean_cov)
    import os

    if os.environ.get("NERFDET_TPU_REMAT") == "1":
        body = jax.checkpoint(body)
    # unrolling the view scan amortizes per-iteration overhead (the
    # body's gathers are small relative to dispatch/loop cost at
    # N_rand-scale working sets); tuned on TPU v5e — see PERF.md
    unroll = int(os.environ.get("NERFDET_TPU_SCAN_UNROLL", "1"))
    (s1u, s2u, s1m, cnt), _ = jax.lax.scan(body, init, xs,
                                           unroll=unroll)

    v = images.shape[0]
    if axis_name is not None:
        s1u = jax.lax.psum(s1u, axis_name)
        s2u = jax.lax.psum(s2u, axis_name)
        s1m = jax.lax.psum(s1m, axis_name)
        if not with_host_rgb:
            # with host rgb the count ships view-global already
            cnt = jax.lax.psum(cnt, axis_name)
        v = v * jax.lax.psum(1, axis_name)
    if with_host_rgb:
        r1u, r2u, r1m, rcnt = (x.astype(jnp.float32)
                               for x in precomputed_rgb)
        s1u = jnp.concatenate([r1u, s1u], axis=-1)
        s2u = jnp.concatenate([r2u, s2u], axis=-1)
        s1m = jnp.concatenate([r1m, s1m], axis=-1)
        cnt = rcnt  # identical mask math, host-verified bitwise
    mean = s1m / (cnt + 1e-8)
    # reference variance: sum over ALL views of (f - mean)^2 / count
    var = (s2u - 2.0 * mean * s1u + v * mean * mean) / (cnt + 1e-8)
    globalfeat = jnp.concatenate([mean, jnp.exp(-var)], axis=-1)
    pixel_mask = cnt[..., 0] > 1
    return globalfeat, pixel_mask


def compute_mask_points(feature, mask):
    """Masked mean / exp(-var) over views (reference `render_ray.py:71-93`).

    Note the reference's variance sums squared deviations over *all*
    views (masked features are zero), normalized by the valid count — we
    reproduce that exactly.
    """
    weight = mask / (jnp.sum(mask, axis=2, keepdims=True) + 1e-8)
    mean = jnp.sum(feature * weight, axis=2, keepdims=True)
    var = jnp.sum((feature - mean) ** 2, axis=2, keepdims=True)
    var = var / (jnp.sum(mask, axis=2, keepdims=True) + 1e-8)
    return mean, jnp.exp(-var)


def volume_sampling(pts, volume, aabb):
    """Trilinear lookup of a scene-level voxel volume at sample points.

    Functional analog of `render_ray.py:26-46`. ``volume`` is
    (nx, ny, nz, C) channels-last; points are normalized by the axis-
    aligned bounding box and sampled with border padding. (The reference
    feeds torch grid_sample x/y/z in an order that transposes the volume;
    we index each world axis onto its own voxel axis.)

    Returns (features (R, S, C), inbound (R, S)).
    """
    aabb0 = jnp.asarray(aabb[0], jnp.float32)
    aabb1 = jnp.asarray(aabb[1], jnp.float32)
    norm = (pts - aabb0) / (aabb1 - aabb0) * 2.0 - 1.0  # [-1, 1]
    inbound = jnp.all((norm > -1) & (norm < 1), axis=-1)
    nx, ny, nz, _ = volume.shape
    # align_corners=True: [-1,1] -> [0, n-1]
    ix = (norm[..., 0] + 1.0) / 2.0 * (nx - 1)
    iy = (norm[..., 1] + 1.0) / 2.0 * (ny - 1)
    iz = (norm[..., 2] + 1.0) / 2.0 * (nz - 1)
    # grid_sample_3d expects (D,H,W,C) with (px,py,pz)=(W,H,D)
    feats = grid_sample_3d(volume, iz, iy, ix, padding="border")
    return feats, inbound


def sample_pdf(bins, weights, n_samples: int, det: bool = False,
               key: Optional[jax.Array] = None):
    """Hierarchical importance sampling along rays.

    Exact port of `render_ray.py:96-142` (used when N_importance > 0;
    the shipped configs keep it at 0 but the capability is part of the
    renderer surface). ``bins``: (R, M+1) depth-bin edges; ``weights``:
    (R, M). Returns (R, n_samples) depths.
    """
    r, m = weights.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_samples), (r, n_samples))
    else:
        u = jax.random.uniform(key, (r, n_samples))

    above = jnp.sum(
        (u[:, :, None] >= cdf[:, None, :-1]).astype(jnp.int32), axis=-1)
    below = jnp.clip(above - 1, 0, None)
    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def raw2outputs(raw, z_vals, mask, white_bkgd: bool = False):
    """Alpha compositing (reference `render_ray.py:196-247`)."""
    rgb = raw[:, :, :3]
    sigma = raw[:, :, 3]
    alpha = 1.0 - jnp.exp(-sigma)
    t = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[:, :-1]
    t = jnp.concatenate([jnp.ones_like(t[:, 0:1]), t], axis=-1)
    weights = alpha * t
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    if mask is not None:
        # >= 8 valid view-observations along the ray (reference `:230`)
        ray_mask = mask.astype(jnp.float32).sum(axis=1) > 8
    else:
        ray_mask = None
    depth_map = jnp.sum(weights * z_vals, axis=-1) / (
        jnp.sum(weights, axis=-1) + 1e-8
    )
    depth_map = jnp.clip(depth_map, z_vals.min(), z_vals.max())
    return dict(
        rgb=rgb_map,
        depth=depth_map,
        weights=weights,
        mask=ray_mask,
        alpha=alpha,
        z_vals=z_vals,
        transparency=t,
    )


def render_rays_chunk(
    ray_o,
    ray_d,
    mlp_fn: Callable,
    *,
    mode: str,
    near_far: Tuple[float, float],
    n_samples: int,
    images=None,
    intrinsics=None,
    poses=None,
    img_hw=None,
    featmaps=None,
    mean_volume=None,
    cov_volume=None,
    aabb=None,
    det: bool = True,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
    view_axis: Optional[str] = None,
    n_ray_shards: int = 1,
    z_vals=None,
    precomputed_rgb=None,
) -> Dict[str, jnp.ndarray]:
    """Render one fixed-size chunk of rays (reference `render_ray.py:250-369`).

    ``mlp_fn(pts, viewdirs, features) -> (rgb, sigma)`` is the applied
    radiance field (parameters already bound).

    2-D mesh support: with ``view_axis`` set, images/featmaps/poses are
    the device-local VIEW shard and the per-point view statistics are
    ``psum``-reduced (exact global values, replicated). With
    ``n_ray_shards > 1`` each device additionally keeps only its own
    R / n slice of rays after the aggregation — the MLP evaluation and
    compositing then run ray-parallel over the same mesh axis and the
    returned maps are the LOCAL ray slice (callers psum their masked
    loss sums). Sampling jitter is drawn for the full ray set before
    slicing, so results are invariant to the shard count.
    """
    if z_vals is not None:
        # host-sampled depths (data pipeline, host_sample_z): the
        # stratified jitter moved off-device with the precomputed rgb
        # stream; pts are recomputed here (cheap, exact)
        z_vals = jnp.asarray(z_vals, jnp.float32)
        pts = (z_vals[..., None] * ray_d[:, None, :]
               + ray_o[:, None, :])
    else:
        pts, z_vals = sample_along_camera_ray(
            ray_o, ray_d, near_far[0], near_far[1], n_samples, det=det,
            key=key)

    if mode == "image":
        # streaming over views: same math as projector_compute +
        # compute_mask_points without the (R, S, V, C) intermediate
        globalfeat, pixel_mask = streaming_sample_mean_var(
            pts, images, intrinsics, poses, img_hw, featmaps=featmaps,
            axis_name=view_axis, precomputed_rgb=precomputed_rgb,
        )
    elif mode == "volume":
        mean_pts, inbound = volume_sampling(pts, mean_volume, aabb)
        cov_pts, _ = volume_sampling(pts, cov_volume, aabb)
        _, view_mask = projector_compute(
            pts, images, intrinsics, poses, img_hw, featmaps=None
        )
        view_cnt = view_mask[..., 0].sum(axis=2)
        if view_axis is not None:
            view_cnt = jax.lax.psum(view_cnt, view_axis)
        pixel_mask = view_cnt > 1
        globalfeat = jnp.concatenate([mean_pts, cov_pts], axis=-1)
    else:
        raise ValueError(f"unknown nerf mode {mode}")

    if n_ray_shards > 1:
        assert view_axis is not None, "ray sharding needs a mesh axis"
        r = ray_d.shape[0]
        assert r % n_ray_shards == 0, (
            f"ray count {r} not divisible by {n_ray_shards} shards")
        r_loc = r // n_ray_shards
        start = jax.lax.axis_index(view_axis) * r_loc

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, start, r_loc, axis=0)

        pts, z_vals, globalfeat, pixel_mask, ray_d = map(
            sl, (pts, z_vals, globalfeat, pixel_mask, ray_d))

    rgb_pts, density_pts = mlp_fn(pts, ray_d, globalfeat)
    if mode == "volume":
        if n_ray_shards > 1:
            inbound = jax.lax.dynamic_slice_in_dim(
                inbound, jax.lax.axis_index(view_axis)
                * (inbound.shape[0] // n_ray_shards),
                inbound.shape[0] // n_ray_shards, axis=0)
        density_pts = density_pts * inbound[..., None]

    raw = jnp.concatenate([rgb_pts, density_pts], axis=-1)
    outputs = raw2outputs(raw, z_vals, pixel_mask, white_bkgd=white_bkgd)
    outputs["sigma"] = density_pts
    return outputs


def render_rays_full(ray_o, ray_d, chunk: int, render_fn: Callable):
    """Test-time full-image rendering as a ``lax.map`` over ray chunks
    (reference chunk loop `render_ray.py:472-498`).

    ``ray_o/ray_d``: (N, 3) with N a multiple of ``chunk`` (pad upstream).
    ``render_fn(ray_o_chunk, ray_d_chunk) -> dict`` with at least
    ``rgb``/``depth``.
    """
    n = ray_o.shape[0]
    assert n % chunk == 0, "pad rays to a multiple of the chunk size"
    ro = ray_o.reshape(-1, chunk, 3)
    rd = ray_d.reshape(-1, chunk, 3)
    outs = jax.lax.map(lambda ab: render_fn(ab[0], ab[1]), (ro, rd))
    return {
        "rgb": outs["rgb"].reshape(n, 3),
        "depth": outs["depth"].reshape(n),
    }


# ---------------------------------------------------------------------
# host (data pipeline) twins of the rgb stream — see PERF.md round 5
# ---------------------------------------------------------------------

def host_sample_z(rng, n_rays: int, near: float, far: float,
                  n_samples: int, det: bool = False) -> np.ndarray:
    """Host-side stratified depth sampling, the numpy twin of
    :func:`sample_along_camera_ray`'s z path (R, S). ``rng`` is the
    pipeline's per-sample ``np.random.RandomState`` — the jitter moves
    off-device together with the precomputed rgb stream."""
    step = np.float32((far - near) / (n_samples - 1))
    z = (np.float32(near)
         + step * np.arange(n_samples, dtype=np.float32))
    z = np.broadcast_to(z[None], (n_rays, n_samples)).copy()
    if not det:
        mids = np.float32(0.5) * (z[:, 1:] + z[:, :-1])
        upper = np.concatenate([mids, z[:, -1:]], axis=-1)
        lower = np.concatenate([z[:, 0:1], mids], axis=-1)
        t = rng.random_sample(z.shape).astype(np.float32)
        z = lower + (upper - lower) * t
    return z


def host_ray_rgb_stats(denorm_images, intrinsic, extrinsics,
                       ray_o, ray_d, z_vals, ori_shape, img_shape,
                       compute_dtype=np.float32):
    """Numpy twin of the rgb stream of :func:`streaming_sample_mean_var`.

    The renderer's per-sample-point source-view COLORS are a pure
    function of ray geometry and the input images — no parameters, no
    gradients — so the data pipeline computes the scan's rgb
    accumulators and the device scan gathers only the (parameter-
    dependent) feature maps: the render's gather rows and their
    backward scatter rows halve (PERF.md round 5; the same pattern as
    `ops/voxel.host_rgb_stats` for the volume).

    Exactness: f32 projection (HIGHEST-precision einsum on device),
    f32 packed-bilinear tap sum round-tripped through ``compute_dtype``
    (matching `grid_sample_2d_packed` on a ``compute_dtype`` image),
    f32 accumulation. Bitwise-equal to the device scan on CPU
    (tests/test_host_ray_rgb.py).

    Returns ``(s1u, s2u, s1m, cnt)``: unmasked sum, unmasked squared
    sum, masked sum — each (R, S, 3) f32 — and the view count
    (R, S, 1) f32.
    """
    import ml_dtypes

    h, w = int(img_shape[0]), int(img_shape[1])
    ratio = np.float32(ori_shape[0]) / np.float32(h)
    intr = np.asarray(intrinsic, np.float32)
    intr4 = np.eye(4, dtype=np.float32)
    intr4[: intr.shape[0], : intr.shape[1]] = intr
    intr4[:2] /= ratio
    poses = np.asarray(extrinsics, np.float32)
    proj = np.einsum("ij,vjk->vik", intr4, poses).astype(np.float32)

    pts = (np.asarray(z_vals, np.float32)[..., None]
           * np.asarray(ray_d, np.float32)[:, None, :]
           + np.asarray(ray_o, np.float32)[:, None, :])  # (R, S, 3)
    r, s = pts.shape[:2]
    xyz = pts.reshape(-1, 3)
    xyz_h = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=-1)
    cam = np.einsum("vij,nj->vni", proj, xyz_h).astype(np.float32)
    z = np.clip(cam[..., 2], 1e-8, None)
    px = np.clip(cam[..., 0] / z, -1e6, 1e6)
    py = np.clip(cam[..., 1] / z, -1e6, 1e6)
    in_front = cam[..., 2] > 0
    inbound = (px <= w - 1.0) & (px >= 0) & (py <= h - 1.0) & (py >= 0)
    mask = (inbound & in_front).astype(np.float32)  # (V, R*S)

    imgs = np.asarray(denorm_images, np.float32)
    if compute_dtype not in (np.float32, "float32", jnp.float32):
        imgs = imgs.astype(ml_dtypes.bfloat16).astype(np.float32)
        out_rt = ml_dtypes.bfloat16
    else:
        out_rt = np.float32
    v, ih, iw, _ = imgs.shape
    sx = np.float32((iw - 1.0) / (w - 1.0))
    sy = np.float32((ih - 1.0) / (h - 1.0))
    pxs, pys = px * sx, py * sy
    x0 = np.clip(np.floor(pxs), 0.0, iw - 1.0)
    y0 = np.clip(np.floor(pys), 0.0, ih - 1.0)
    rx, ry = pxs - x0, pys - y0
    wx0 = np.maximum(np.float32(0), np.float32(1) - np.abs(rx))
    wx1 = np.maximum(np.float32(0), np.float32(1) - np.abs(rx - 1))
    wy0 = np.maximum(np.float32(0), np.float32(1) - np.abs(ry))
    wy1 = np.maximum(np.float32(0), np.float32(1) - np.abs(ry - 1))
    x0i = x0.astype(np.int64)
    y0i = y0.astype(np.int64)

    # zero-pad right/bottom exactly like pack_bilinear
    pad = np.pad(imgs, ((0, 0), (0, 1), (0, 1), (0, 0)))
    flat = pad.reshape(v, (ih + 1) * (iw + 1), 3)
    base = y0i * (iw + 1) + x0i

    # sequential per-view accumulation, matching the device scan's
    # carry order bit-for-bit (numpy's axis-sum is pairwise)
    n = r * s
    s1u = np.zeros((n, 3), np.float32)
    s2u = np.zeros((n, 3), np.float32)
    s1m = np.zeros((n, 3), np.float32)
    cnt = np.zeros((n, 1), np.float32)
    for vi in range(v):
        fv = flat[vi]
        lin = base[vi]
        f = (fv[lin] * (wy0[vi] * wx0[vi])[:, None]
             + fv[lin + 1] * (wy0[vi] * wx1[vi])[:, None]
             + fv[lin + (iw + 1)] * (wy1[vi] * wx0[vi])[:, None]
             + fv[lin + (iw + 2)] * (wy1[vi] * wx1[vi])[:, None])
        if out_rt is not np.float32:
            f = f.astype(out_rt).astype(np.float32)
        m = mask[vi][:, None]
        s1u += f
        s2u += f * f
        s1m += f * m
        cnt += m
    return (s1u.reshape(r, s, 3), s2u.reshape(r, s, 3),
            s1m.reshape(r, s, 3), cnt.reshape(r, s, 1))
