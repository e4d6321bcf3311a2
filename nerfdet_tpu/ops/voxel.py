"""Voxel grid generation and 2D->3D back-projection (pure JAX, XLA-fusable).

TPU-native re-design of the reference's back-projection path
(`mmdet3d/models/detectors/nerfdet.py:380-420` and the multi-view fusion
at `:171-183`). Key differences from the CUDA/torch formulation:

* The reference materialises a ``(V, C, nx, ny, nz)`` per-view volume and
  a python loop over views with boolean scatter. Here each voxel *gathers*
  its one pixel per view (dense, static-shape `take`), and the mean /
  variance fusion is computed *streaming* over views with a
  ``lax.scan`` — the (V, N, C) intermediate never exists, saving
  ``V``x HBM traffic.
* Validity is a mask multiplied into the gather, not a scatter index.

Exact-semantics notes (verified against the reference in tests):

* pixel rounding is round-half-to-even in both torch and jnp;
* invalid views contribute 0 to the sum and ``mean**2`` to the variance
  (the reference sums ``(x - mean)^2`` over *all* views, `nerfdet.py:179`),
  which streaming recovers as ``s2 - 2*mean*s1 + V*mean^2``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_points(n_voxels, voxel_size, origin):
    """World-space voxel-center grid, shape (nx, ny, nz, 3).

    Mirrors `nerfdet.py:380-390` (which returns (3, nx, ny, nz)); we use
    channels-last. ``origin`` is the scene center; the grid spans
    ``origin ± n_voxels/2 * voxel_size``.
    """
    n_voxels = np.asarray(n_voxels)
    voxel_size = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.asarray(origin, jnp.float32)
    idx = jnp.stack(
        jnp.meshgrid(
            jnp.arange(n_voxels[0], dtype=jnp.float32),
            jnp.arange(n_voxels[1], dtype=jnp.float32),
            jnp.arange(n_voxels[2], dtype=jnp.float32),
            indexing="ij",
        ),
        axis=-1,
    )
    new_origin = origin - jnp.asarray(n_voxels, jnp.float32) / 2.0 * voxel_size
    return idx * voxel_size + new_origin


def compute_projection(intrinsic, extrinsics, ratio: float):
    """Per-view 3x4 projection matrices (reference `nerfdet.py:363-378`).

    Args:
        intrinsic: (3, 3) or (4, 4) camera intrinsics (original-image pixels).
        extrinsics: (V, 4, 4) world->camera matrices.
        ratio: ori_height / feature_height — rescales the focal/center rows
            onto the feature grid.
    """
    intrinsic = jnp.asarray(intrinsic, jnp.float32)[:3, :3]
    intrinsic = intrinsic.at[:2].divide(ratio)
    extrinsics = jnp.asarray(extrinsics, jnp.float32)
    # geometry must be exact f32: pixel-rounding ties (exact .5) are common
    return jnp.einsum("ij,vjk->vik", intrinsic, extrinsics[:, :3, :],
                      precision=jax.lax.Precision.HIGHEST)


def project_points(points, projection, height: int, width: int):
    """Project world points into every view with nearest-pixel rounding.

    Args:
        points: (N, 3) world coordinates.
        projection: (V, 3, 4).

    Returns:
        (x, y, z, valid): each (V, N); x/y int32 pixel coords (unclipped),
        z the camera depth, valid the in-image & in-front mask
        (reference `nerfdet.py:396-403`).
    """
    pts_h = jnp.concatenate(
        [points, jnp.ones_like(points[:, :1])], axis=-1
    )  # (N, 4)
    # HIGHEST: voxel centers frequently project to exact half-pixel ties,
    # and the default (bf16-accumulated) matmul flips their rounding
    cam = jnp.einsum("vij,nj->vin", projection, pts_h,
                     precision=jax.lax.Precision.HIGHEST)  # (V, 3, N)
    z = cam[:, 2]
    x = jnp.round(cam[:, 0] / z).astype(jnp.int32)
    y = jnp.round(cam[:, 1] / z).astype(jnp.int32)
    valid = (x >= 0) & (y >= 0) & (x < width) & (y < height) & (z > 0)
    return x, y, z, valid


def _gather_view(features_v, x_v, y_v, valid_v):
    """Gather (N, C) pixels from one (H, W, C) view, zeroing invalid.

    The row index is clipped explicitly, so the gather itself runs in
    PROMISE_IN_BOUNDS mode: the TPU gather is per-row-dispatch bound
    (~5.3 ns/row at 256 bf16 channels, width-insensitive — PERF.md
    round 4) and skipping XLA's implicit clamp recovers ~10%.
    """
    h, w, c = features_v.shape
    flat = features_v.reshape(h * w, c)
    idx = jnp.clip(y_v, 0, h - 1) * w + jnp.clip(x_v, 0, w - 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    out = jax.lax.gather(
        flat, idx[:, None], dn, slice_sizes=(1, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out * valid_v[:, None].astype(out.dtype)


def depth_gate(z, x, y, valid, depth, height: int, width: int,
               voxel_size_z: float):
    """Restrict validity to voxels within ±voxel_z of the sensed depth.

    Reference `nerfdet.py:405-411`: depth is bilinearly resized to the
    feature resolution, and a voxel's projection is kept only when its
    camera depth lies in ``(d - voxel_z, d + voxel_z)``.
    """
    v = depth.shape[0]
    depth_r = jax.image.resize(depth, (v, height, width), method="bilinear")
    flat = depth_r.reshape(v, height * width)
    idx = jnp.clip(y, 0, height - 1) * width + jnp.clip(x, 0, width - 1)
    d = jnp.take_along_axis(flat, idx, axis=1)
    near = (z > d - voxel_size_z) & (z < d + voxel_size_z)
    return valid & near


def backproject_volume(features, points, projection,
                       depth: Optional[jnp.ndarray] = None,
                       voxel_size_z: Optional[float] = None,
                       image_hw: Optional[Tuple[int, int]] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-semantics dense back-projection (for tests & small runs).

    Args:
        features: (V, H, W, C) per-view feature maps.
        points: (N, 3) voxel centers.
        projection: (V, 3, 4).
        image_hw: validity bounds when smaller than the (padded) map —
            the reference crops ``feature[:, :, :height, :width]``
            (`nerfdet.py:162-169`); passing bounds instead of cropping
            keeps the gather shape TPU-aligned.

    Returns:
        (volume, valid): (V, N, C) gathered features (0 where invalid) and
        (V, N) validity (reference `nerfdet.py:393-420`).
    """
    v, fh, fw, _ = features.shape
    h, w = image_hw if image_hw is not None else (fh, fw)
    x, y, z, valid = project_points(points, projection, h, w)
    if depth is not None:
        valid = depth_gate(z, x, y, valid, depth, h, w, voxel_size_z)
    volume = jax.vmap(_gather_view)(features, x, y, valid)
    return volume, valid


def host_rgb_stats(denorm_imgs, intrinsic, extrinsics, origin,
                   n_voxels, voxel_size, ori_shape, img_shape,
                   compute_dtype=np.float32):
    """Host-side (numpy) twin of the rgb stream of :func:`fused_mean_cov`.

    The rgb statistics the nerf_density global volume needs (per-voxel
    sum and squared sum of the de-normalized image colors over observing
    views, `nerfdet.py:239-251` in the reference) are a pure function of
    the scene GEOMETRY and the input images — no parameters, no
    gradients. Computing them here, in the data pipeline (the VoteNet
    host-sampling-chain pattern, PERF.md round 1), removes the per-view
    full-resolution rgb gather from the device step entirely (~7 ms of
    the 50-view fusion scan on v5e — it is row-dispatch bound, PERF.md
    round 4).

    Exactness: projection/rounding are f32 like `project_points`
    (round-half-to-even in both numpy and jnp); the gathered colors are
    cast to ``compute_dtype`` (bf16 in the flagship) BEFORE the f32
    accumulation, matching the device scan bit-for-bit on CPU. On TPU
    the f32 projection matmul may differ in the last ulp, which can
    flip an exact half-pixel rounding tie — a per-voxel rgb
    perturbation bounded by one pixel, with no effect on the detection
    stream (its count/validity stay on device).

    Returns ``(s1, s2)``: two (N, 3) f32 arrays, N = prod(n_voxels).
    """
    import ml_dtypes

    n_voxels = np.asarray(n_voxels)
    vsz = np.asarray(voxel_size, np.float32)
    origin = np.asarray(origin, np.float32)
    idx = np.stack(np.meshgrid(
        np.arange(n_voxels[0], dtype=np.float32),
        np.arange(n_voxels[1], dtype=np.float32),
        np.arange(n_voxels[2], dtype=np.float32), indexing="ij"), axis=-1)
    new_origin = origin - n_voxels.astype(np.float32) / 2.0 * vsz
    pts = (idx * vsz + new_origin).reshape(-1, 3)

    h_img, w_img = int(img_shape[0]), int(img_shape[1])
    ratio = np.float32(ori_shape[0]) / np.float32(h_img)
    intr = np.asarray(intrinsic, np.float32)[:3, :3].copy()
    intr[:2] /= ratio
    proj = np.einsum("ij,vjk->vik", intr,
                     np.asarray(extrinsics, np.float32)[:, :3, :])

    pts_h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=-1)
    cam = np.einsum("vij,nj->vin", proj, pts_h.astype(np.float32),
                    dtype=np.float32)  # (V, 3, N)
    z = cam[:, 2]
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        px = np.nan_to_num(cam[:, 0] / z, nan=-1.0, posinf=-1.0,
                           neginf=-1.0)
        py = np.nan_to_num(cam[:, 1] / z, nan=-1.0, posinf=-1.0,
                           neginf=-1.0)
    x = np.round(px).astype(np.int32)
    y = np.round(py).astype(np.int32)
    valid = (x >= 0) & (y >= 0) & (x < w_img) & (y < h_img) & (z > 0)

    np_dtype = (ml_dtypes.bfloat16 if compute_dtype in
                ("bfloat16", jnp.bfloat16, ml_dtypes.bfloat16)
                else np.float32)
    imgs = np.asarray(denorm_imgs, np.float32)
    v = imgs.shape[0]
    flat = imgs.reshape(v, -1, 3)
    lin = (np.clip(y, 0, h_img - 1) * imgs.shape[2]
           + np.clip(x, 0, w_img - 1))
    gathered = np.take_along_axis(flat, lin[..., None], axis=1)
    if np_dtype is not np.float32:
        # cast-after-gather == cast-before-gather (gathers preserve
        # values); converting only the gathered rows is ~3x cheaper
        gathered = gathered.astype(np_dtype).astype(np.float32)
    gathered *= valid[..., None].astype(np.float32)
    return gathered.sum(0), (gathered * gathered).sum(0)


def device_rgb_stats(denorm_imgs, intrinsic, extrinsics, origin,
                     n_voxels, voxel_size, ori_shape, img_shape,
                     compute_dtype=jnp.float32):
    """On-device twin of :func:`host_rgb_stats` (jit it).

    Uses the SAME device projection code path as the fusion scan
    (:func:`project_points`), so comparing its output against the host
    pipeline's continuously measures the documented TPU tie-break
    caveat (see the Exactness paragraph of :func:`host_rgb_stats`):
    perfsuite reports ``flagship_host_vs_device_rgb_stats_max_delta``
    from exactly this pair. Returns ``(s1, s2)``, (N, 3) f32.
    """
    h_img, w_img = int(img_shape[0]), int(img_shape[1])
    ratio = float(ori_shape[0]) / float(h_img)
    points = get_points(n_voxels, voxel_size, origin).reshape(-1, 3)
    proj = compute_projection(intrinsic, extrinsics, ratio)
    x, y, z, valid = project_points(points, proj, h_img, w_img)
    imgs = jnp.asarray(denorm_imgs, jnp.float32)
    v = imgs.shape[0]
    flat = imgs.reshape(v, -1, 3)
    lin = (jnp.clip(y, 0, h_img - 1) * imgs.shape[2]
           + jnp.clip(x, 0, w_img - 1))
    gathered = jnp.take_along_axis(flat, lin[..., None], axis=1)
    if compute_dtype not in (jnp.float32, "float32", np.float32):
        gathered = gathered.astype(compute_dtype).astype(jnp.float32)
    gathered = gathered * valid[..., None].astype(jnp.float32)
    return gathered.sum(0), (gathered * gathered).sum(0)


def fused_mean_cov(features, points, projection,
                   depth: Optional[jnp.ndarray] = None,
                   voxel_size_z: Optional[float] = None,
                   invalid_fill: Optional[jnp.ndarray] = None,
                   extra_features: Optional[jnp.ndarray] = None,
                   extra_projection: Optional[jnp.ndarray] = None,
                   image_hw: Optional[Tuple[int, int]] = None,
                   extra_image_hw: Optional[Tuple[int, int]] = None,
                   axis_name: Optional[str] = None,
                   mapped_kernel: Optional[jnp.ndarray] = None,
                   mapped_bias: Optional[jnp.ndarray] = None,
                   precomputed_extra=None):
    """Streaming multi-view fusion: mean, exp(-var), valid count.

    Computes, without materialising the (V, N, C) tensor, exactly the
    fusion of `nerfdet.py:171-183` (and, with ``invalid_fill`` /
    ``extra_features``, the nerf_density global-volume fusion of
    `nerfdet.py:239-251`):

        mean  = sum_v x_v / (count + 1e-8),  zeroed where count == 0
        cov   = exp(-sum_v (x_v - mean)^2 / (count + 1e-8)),
                set to exp(-1e6)=0 where count == 0
        x_v   = gathered features where valid, ``invalid_fill`` otherwise
                (defaults to zeros, the plain-volume case)

    Args:
        features: (V, H, W, C) per-view maps gathered with ``projection``.
        extra_features/extra_projection: optional second stream (V, H2, W2,
            C2) gathered with its *own* projection but masked by its own
            validity while the count still comes from the primary stream —
            the rgb_volume concat of `nerfdet.py:239`. Prepended to the
            channel axis.
        invalid_fill: (C_total,) contribution of an invalid view (e.g. the
            mapping bias), default zeros.

    Args (cont.):
        axis_name: when the VIEW axis is sharded over a mesh axis (each
            device holds V_local views; intra-scene view parallelism,
            SURVEY §2.4 — an axis the reference lacks), pass that mesh
            axis name: the streaming sums are ``psum``-reduced across it
            before normalization, making the result bit-identical to the
            unsharded fusion.

    Args (cont. 2):
        precomputed_extra: optional ``(s1e, s2e)`` pair of (N, C_extra)
            f32 host-precomputed rgb sums (:func:`host_rgb_stats`).
            The extra stream is parameter-independent (input images x
            scene geometry), so when the data pipeline ships these the
            per-view extra gather is dropped from the scan — the
            device step's rgb cost goes to zero. Requires
            ``mapped_kernel`` (the flagship nerf_density path). The
            values are GLOBAL over views: under ``axis_name`` they are
            used as-is while the device-accumulated sums are psummed.
        mapped_kernel/mapped_bias: fuse the nerf_density "mapped"
            stream into the SAME scan: since the reference's
            ``mapping`` is a 1x1 linear whose invalid-view fill equals
            its own bias (`nerfdet.py:239-251`, mapping(0) == bias),
            the mapped stream's gather is redundant — its per-view
            contribution is ``gathered_features @ W + b`` and its
            running sum is recovered post-scan as ``s1 @ W + V*b``.
            Only the squared sum needs in-scan work (one thin MXU
            matmul per view). Requires ``extra_features`` (the rgb
            stream). Adds ``(g_mean, g_cov)`` to the return, channel
            order [extra, mapped] (the reference's rgb_volume concat).

    Returns:
        (mean, cov, count) — or (mean, cov, count, g_mean, g_cov) when
        ``mapped_kernel`` is given.
    """
    v, fh, fw, c = features.shape
    h, w = image_hw if image_hw is not None else (fh, fw)
    x, y, z, valid = project_points(points, projection, h, w)
    if depth is not None:
        valid = depth_gate(z, x, y, valid, depth, h, w, voxel_size_z)

    c_extra = 0
    if extra_features is not None:
        c_extra = extra_features.shape[-1]
        feh, few = extra_features.shape[1:3]
        he, we = (extra_image_hw if extra_image_hw is not None
                  else (feh, few))
        xe, ye, ze, valide = project_points(points, extra_projection, he, we)
        if depth is not None:
            # the reference depth-gates the rgb back-projection too
            # (`nerfdet.py:204-210` passes the same depth tensor)
            valide = depth_gate(ze, xe, ye, valide, depth, he, we,
                                voxel_size_z)

    n = points.shape[0]
    c_total = c + c_extra
    fill = (jnp.zeros((c_total,), jnp.float32) if invalid_fill is None
            else invalid_fill.astype(jnp.float32))

    with_mapped = mapped_kernel is not None
    if with_mapped:
        assert extra_features is not None or precomputed_extra is not None
        c_map = mapped_kernel.shape[-1]
        w_map = mapped_kernel.astype(jnp.float32)
        b_map = mapped_bias.astype(jnp.float32)
    if precomputed_extra is not None:
        assert with_mapped, "precomputed_extra is a nerf_density path"
        c_extra = precomputed_extra[0].shape[-1]

    def body(carry, view):
        if with_mapped:
            if precomputed_extra is not None:
                s1, s2, count, s2m = carry
                f_v, x_v, y_v, valid_v = view
                contrib = _gather_view(f_v, x_v, y_v, valid_v).astype(
                    jnp.float32)
                mapped = contrib @ w_map + b_map
                s1 = s1 + contrib
                s2 = s2 + contrib * contrib
                s2m = s2m + mapped * mapped
                count = count + valid_v.astype(jnp.float32)
                return (s1, s2, count, s2m), None
            s1, s2, count, s1e, s2e, s2m = carry
            f_v, x_v, y_v, valid_v, fe_v, xe_v, ye_v, valide_v = view
            contrib = _gather_view(f_v, x_v, y_v, valid_v).astype(
                jnp.float32)
            extra = _gather_view(fe_v, xe_v, ye_v, valide_v).astype(
                jnp.float32)
            mapped = contrib @ w_map + b_map
            s1 = s1 + contrib
            s2 = s2 + contrib * contrib
            s1e = s1e + extra
            s2e = s2e + extra * extra
            s2m = s2m + mapped * mapped
            count = count + valid_v.astype(jnp.float32)
            return (s1, s2, count, s1e, s2e, s2m), None
        s1, s2, count = carry
        if extra_features is None:
            f_v, x_v, y_v, valid_v = view
            contrib = _gather_view(f_v, x_v, y_v, valid_v)
            contrib = jnp.where(valid_v[:, None], contrib, fill[None, :])
        else:
            f_v, x_v, y_v, valid_v, fe_v, xe_v, ye_v, valide_v = view
            main = _gather_view(f_v, x_v, y_v, valid_v)
            main = jnp.where(valid_v[:, None], main, fill[None, c_extra:])
            extra = _gather_view(fe_v, xe_v, ye_v, valide_v)
            contrib = jnp.concatenate([extra, main], axis=-1)
        contrib = contrib.astype(jnp.float32)
        s1 = s1 + contrib
        s2 = s2 + contrib * contrib
        count = count + valid_v.astype(jnp.float32)
        return (s1, s2, count), None

    count = jnp.zeros((n,), jnp.float32)
    if with_mapped and precomputed_extra is not None:
        init = (jnp.zeros((n, c), jnp.float32),
                jnp.zeros((n, c), jnp.float32), count,
                jnp.zeros((n, c_map), jnp.float32))
        xs = (features, x, y, valid)
    elif with_mapped:
        init = (jnp.zeros((n, c), jnp.float32),
                jnp.zeros((n, c), jnp.float32), count,
                jnp.zeros((n, c_extra), jnp.float32),
                jnp.zeros((n, c_extra), jnp.float32),
                jnp.zeros((n, c_map), jnp.float32))
        xs = (features, x, y, valid, extra_features, xe, ye, valide)
    else:
        init = (jnp.zeros((n, c_total), jnp.float32),
                jnp.zeros((n, c_total), jnp.float32), count)
        xs = ((features, x, y, valid) if extra_features is None else
              (features, x, y, valid, extra_features, xe, ye, valide))
    # optional remat: recomputing the per-view gathers in the backward
    # trades FLOPs for the (V, N, C_total) residual HBM. Measured on a
    # single v5e at the flagship shape it is a net LOSS (738 vs 580
    # ms/step f32 — the re-gather dominates the saved bandwidth), so it
    # is opt-in via NERFDET_TPU_REMAT=1 for memory-constrained configs
    # (larger V / volumes) rather than default.
    import os

    if os.environ.get("NERFDET_TPU_REMAT") == "1":
        body = jax.checkpoint(body)
    # unroll default measured on v5e (PERF.md round 4): the per-view
    # gathers are row-dispatch bound and unrolling lets XLA overlap
    # consecutive views' gathers (8 ~= the knee; 1 -> 8 is -9% on the
    # 50-view fusion scan, flat beyond). On CPU an unrolled body only
    # inflates compile time (the test suite jits this everywhere), so
    # the default stays 1 there.
    default = "8" if jax.default_backend() != "cpu" else "1"
    unroll = int(os.environ.get("NERFDET_TPU_SCAN_UNROLL", default))
    unroll = max(1, min(unroll, v))
    carry, _ = jax.lax.scan(body, init, xs, unroll=unroll)
    if with_mapped and precomputed_extra is not None:
        s1, s2, count, s2m = carry
        s1e = precomputed_extra[0].astype(jnp.float32)
        s2e = precomputed_extra[1].astype(jnp.float32)
    elif with_mapped:
        s1, s2, count, s1e, s2e, s2m = carry
    else:
        s1, s2, count = carry

    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        count = jax.lax.psum(count, axis_name)
        if with_mapped:
            if precomputed_extra is None:
                # host-precomputed stats are already view-global
                s1e = jax.lax.psum(s1e, axis_name)
                s2e = jax.lax.psum(s2e, axis_name)
            s2m = jax.lax.psum(s2m, axis_name)
        v = v * jax.lax.psum(1, axis_name)

    denom = count[:, None] + 1e-8
    observed = count[:, None] > 0

    def stats(s1_, s2_):
        mean_ = jnp.where(observed, s1_ / denom, 0.0)
        var_ = (s2_ - 2.0 * mean_ * s1_ + v * mean_ * mean_) / denom
        var_ = jnp.where(observed, var_, 1e6)
        return mean_, jnp.exp(-var_)

    mean, cov = stats(s1, s2)
    if not with_mapped:
        return mean, cov, count
    # mapped running sum recovered without in-scan storage: every view
    # contributes gathered @ W + b (invalid gathers are zero, so their
    # contribution is exactly the bias — the reference's fill)
    s1m = s1 @ w_map + v * b_map
    mean_m, cov_m = stats(s1m, s2m)
    mean_e, cov_e = stats(s1e, s2e)
    g_mean = jnp.concatenate([mean_e, mean_m], axis=-1)
    g_cov = jnp.concatenate([cov_e, cov_m], axis=-1)
    return mean, cov, count, g_mean, g_cov
