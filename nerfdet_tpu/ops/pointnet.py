"""PointNet++ point ops (pure JAX, static shapes, MXU-friendly).

TPU-native equivalents of the reference's CUDA point ops (SURVEY §2.3):

* :func:`furthest_point_sample` — `mmdet3d/ops/furthest_point_sample/
  src/furthest_point_sample_cuda.cu` (iterative FPS).
* :func:`ball_query` — `mmdet3d/ops/ball_query/src/ball_query_cuda.cu`
  (first-K neighbors within a radius, degenerate duplication of the
  first hit, exactly the CUDA kernel's fill behavior).
* :func:`gather_points` / :func:`group_points` — gather & query-and-
  group used by PointNet++ set abstraction.
* :func:`three_nn` / :func:`three_interpolate` — feature propagation.

The CUDA kernels thread over points; here everything is a dense
(N, M) distance matrix + masked reductions, which XLA tiles onto the
MXU/VPU — the right trade for indoor point budgets (<= ~50k points).
All functions take a single cloud; ``jax.vmap`` adds the batch axis.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def square_distance(a, b):
    """(N, 3) x (M, 3) -> (N, M) squared euclidean distances.

    The cross matmul MUST run at full f32 precision: the TPU default
    (bf16 operands) loses ~2 decimal digits of |a||b|-scale magnitude,
    which through the |a|^2 - 2ab + |b|^2 expansion turns into
    ABSOLUTE d^2 errors of ~1e-1 at room-scale coordinates — enough to
    flip ball-query membership wholesale, not just at the radius
    boundary (the reference CUDA kernels compute exact f32
    differences)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 - 2.0 * cross + b2.T, 0.0)


def furthest_point_sample(points, n_samples: int):
    """Iterative farthest-point sampling. Returns (n_samples,) int32
    indices; starts from index 0 like the CUDA kernel.

    On TPU this dispatches to the Pallas kernel
    (:mod:`ops.pallas_fps`), which keeps the min-distance state in
    VMEM across the serial loop; elsewhere (and for point blocks too
    large for VMEM) it runs the XLA ``fori_loop`` twin. Both paths are
    bit-identical (same metric, same first-index tie-breaking)."""
    if (os.environ.get("NERFDET_TPU_PALLAS_FPS", "1") == "1"
            and jax.default_backend() == "tpu"):
        from .pallas_fps import fits_vmem, fps_pallas

        if fits_vmem(points.shape[0], points.shape[1]):
            # indices are a non-differentiable selection (the CUDA
            # kernel has no backward either); stop_gradient keeps AD
            # from tracing a JVP into the pallas_call when `points`
            # carries tangents (e.g. 3DSSD's F-FPS over learned feats)
            return fps_pallas(jax.lax.stop_gradient(points), n_samples)
    return _furthest_point_sample_xla(points, n_samples)


@partial(jax.jit, static_argnames=("n_samples",))
def _furthest_point_sample_xla(points, n_samples: int):
    n = points.shape[0]

    def body(i, state):
        idx, min_dist, last = state
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        return idx, min_dist, nxt

    idx0 = jnp.zeros((n_samples,), jnp.int32)
    min_dist = jnp.full((n,), jnp.inf, jnp.float32)
    idx, _, _ = jax.lax.fori_loop(1, n_samples, body,
                                  (idx0, min_dist, jnp.int32(0)))
    return idx


def _first_k_hits(within, n_neighbors: int):
    """First ``n_neighbors`` True columns of each row, in scan order.

    K-step masked-min scan: step k finds the smallest column index
    that is a hit and beyond the previous hit. K passes over the
    (C, N) mask are an order of magnitude cheaper than the previous
    full (C, N) argsort (the CUDA kernels' scan-order selection has no
    sorted structure to exploit; `lax.top_k` lowers to the same sort).

    Slot semantics match the CUDA kernels (`ball_query_cuda.cu`):
    slots beyond the found neighbors repeat the FIRST hit; rows with
    no hit at all are left zeroed.
    """
    n = within.shape[1]
    iota = jnp.arange(n, dtype=jnp.int32)

    def step(last, _):
        cand = jnp.where(within & (iota[None, :] > last[:, None]),
                         iota[None, :], n)
        cur = jnp.min(cand, axis=1).astype(jnp.int32)
        return cur, cur

    last0 = jnp.full((within.shape[0],), -1, jnp.int32)
    _, hits = jax.lax.scan(step, last0, None, length=n_neighbors)
    take = jnp.swapaxes(hits, 0, 1)  # (C, K), misses hold n
    found = take < n
    first = take[:, :1]
    fallback = jnp.where(first < n, first, 0)
    return jnp.where(found, take, fallback)


@partial(jax.jit, static_argnames=("n_neighbors",))
def ball_query(centers, points, radius: float, n_neighbors: int,
               d2=None):
    """First ``n_neighbors`` points within ``radius`` of each center.

    Returns (n_centers, n_neighbors) int32 indices. Matches the CUDA
    kernel: slots beyond the found neighbors repeat the FIRST found
    index; centers with no neighbor get all-zero indices. ``d2``
    optionally supplies a precomputed (C, N) squared-distance matrix
    (MSG modules share one across their radius branches).
    """
    if d2 is None:
        d2 = square_distance(centers, points)  # (C, N)
    return _first_k_hits(d2 < radius * radius, n_neighbors)


@jax.jit
def gather_points(features, indices):
    """(C_or_N, ...) gather along the first axis — the reference's
    gather_points on (N, C) layouts."""
    return jnp.take(features, indices, axis=0)


def group_points(points, features, centers_idx, group_idx,
                 use_xyz: bool = True, new_xyz=None):
    """Query-and-group (reference `mmdet3d/ops/group_points`).

    Args:
        points: (N, 3); features: (N, C) or None.
        centers_idx: (S,) FPS indices, or None with ``new_xyz`` giving
            the (S, 3) group centers directly.
        group_idx: (S, K) ball-query.

    Returns (S, K, 3[+C]) grouped local-offset xyz (+features).
    """
    centers = new_xyz if centers_idx is None else points[centers_idx]
    grouped_xyz = points[group_idx] - centers[:, None, :]
    if features is None:
        return grouped_xyz
    grouped_feat = features[group_idx]
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    return grouped_feat


@jax.jit
def three_nn(unknown, known):
    """3 nearest neighbors: returns ((U, 3) distances, (U, 3) indices)
    (reference `mmdet3d/ops/interpolate/three_nn`)."""
    d2 = square_distance(unknown, known)
    neg_d, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(features, indices, weights):
    """Weighted sum of 3 neighbor features: (K, C), (U, 3), (U, 3)
    -> (U, C) (reference `three_interpolate`)."""
    gathered = features[indices]  # (U, 3, C)
    return jnp.sum(gathered * weights[..., None], axis=1)


def interpolation_weights(dist, eps: float = 1e-8):
    """Inverse-distance weights used by PointNet++ FP modules."""
    recip = 1.0 / jnp.maximum(dist * dist, eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def ball_query_ring(centers, points, min_radius: float, radius: float,
                    n_neighbors: int, d2=None):
    """Dilated ball query: first K points with min_radius <= dist <
    radius (the reference QueryAndGroup's ``min_radius`` used by
    3DSSD's dilated grouping). Ring semantics follow
    `mmdet3d/ops/group_points`: empty rings duplicate slot 0."""
    if d2 is None:
        d2 = square_distance(centers, points)
    within = (d2 < radius * radius) & (d2 >= min_radius * min_radius)
    return _first_k_hits(within, n_neighbors)


def sample_points_mixed(xyz, features, num_points, fps_mods,
                        fps_sample_ranges):
    """3DSSD's mixed point sampler (reference
    `mmdet3d/ops/pointnet_modules/point_sa_module.py` Points_Sampler):
    the point set is split into static index ranges, each sampled with
    its own mode —

    - ``D-FPS``: euclidean farthest-point sampling;
    - ``F-FPS``: FPS in the concatenated (xyz, features) metric;
    - ``FS``: fused sampling — BOTH F-FPS and D-FPS samples are kept
      (2 x num output indices).

    Args:
        num_points/fps_mods/fps_sample_ranges: per-section settings;
        a range of -1 means "to the end".

    Returns (S_total,) int32 indices into ``xyz``.
    """
    out = []
    start = 0
    n = xyz.shape[0]
    for num, mod, rng in zip(num_points, fps_mods, fps_sample_ranges):
        end = n if rng == -1 else start + rng
        sec_xyz = xyz[start:end]
        if mod in ("F-FPS", "FS"):
            sec_feat = features[start:end]
            ffps_in = jnp.concatenate(
                [sec_xyz, sec_feat.astype(sec_xyz.dtype)], axis=-1)
        if mod == "D-FPS":
            idx = furthest_point_sample(sec_xyz, num)
        elif mod == "F-FPS":
            idx = furthest_point_sample(ffps_in, num)
        elif mod == "FS":
            idx = jnp.concatenate([
                furthest_point_sample(ffps_in, num),
                furthest_point_sample(sec_xyz, num)])
        else:
            raise ValueError(f"unknown fps mod {mod!r}")
        out.append(idx + start)
        start = end
    return jnp.concatenate(out).astype(jnp.int32)


def host_sa_chain(points, num_points, radii, num_samples):
    """Precompute the SA-SSG sampling chain on the HOST (native C++).

    The FPS -> ball-query chain depends only on the input xyz, so it
    can run in the data pipeline where the loader's prefetch overlaps
    it with device compute — removing the TPU train step's only serial
    op (PERF.md "VoteNet decomposition": FPS + ball query were ~87% of
    the step; the backward is free because no gradient flows through
    indices). Same algorithms as the device twins
    (:func:`furthest_point_sample`, :func:`ball_query`) and the
    reference CUDA kernels.

    Returns a flat dict ``{"sa_fps_<l>": (M_l,) int32,
    "sa_group_<l>": (M_l, K_l) int32}`` (flat so the loader's
    ``stack_scenes`` batches it), or None when the native library is
    unavailable (callers fall back to on-device sampling).
    """
    from . import native

    if not native.available():
        return None
    cur = np.ascontiguousarray(np.asarray(points)[:, :3], np.float32)
    out = {}
    for lvl, (m, r, k) in enumerate(zip(num_points, radii, num_samples)):
        fi = native.fps_sample(cur, int(m))
        nxt = cur[fi]
        gi = native.ball_query(nxt, cur, float(r), int(k))
        out[f"sa_fps_{lvl}"] = fi
        out[f"sa_group_{lvl}"] = gi
        cur = nxt
    return out


def collect_sa_indices(scene):
    """Reassemble :func:`host_sa_chain`'s flat dict entries from a
    scene/batch dict into the per-level tuple the backbones take;
    None when absent."""
    lvls = sorted(int(k[len("sa_fps_"):]) for k in scene
                  if k.startswith("sa_fps_"))
    if not lvls:
        return None
    return tuple((scene[f"sa_fps_{l}"], scene[f"sa_group_{l}"])
                 for l in lvls)
