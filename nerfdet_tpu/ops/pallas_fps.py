"""Pallas TPU kernel for iterative farthest-point sampling.

FPS is the one serial op left on the device path (reference CUDA kernel
`mmdet3d/ops/furthest_point_sample/src/furthest_point_sample_cuda.cu`:
one block scans all points per selection step). The XLA `fori_loop`
twin (:func:`ops.pointnet.furthest_point_sample`) round-trips the
(N,) min-distance state through HBM and re-dispatches an argmax
reduction every iteration — measured 10-19 us/iteration on TPU v5e
regardless of unrolling (PERF.md "VoteNet decomposition").

This kernel keeps the whole state in VMEM for the lifetime of the
sampling loop, laid out for full VPU tile utilization:

- the N points are folded into (R, 128) planes (sublanes x lanes), one
  plane per coordinate, so every per-step pass over the cloud runs
  8/8-sublane-dense VPU tiles instead of wasting 7/8 of every (8, 128)
  tile on a flat (1, N) row;
- the running min-distance plane is a VMEM scratch, initialized to
  +inf on real points and -inf on padding so padding can never win;
- the selected point's coordinates are extracted with a masked
  reduction (`sum(plane * (flat_index == last))`) instead of a dynamic
  lane slice — Mosaic vectorizes it with no alignment constraints;
- argmax is spelled max + first-index-of-max (`min(where(eq, idx, N))`)
  to pin the CUDA/XLA first-hit tie-breaking exactly.

Semantics match the XLA twin bit-for-bit: start from index 0, squared
euclidean metric over all feature columns (supports D-FPS xyz and
3DSSD's F-FPS concatenated (xyz, feature) metric), first-index ties.

Measured steady-state on TPU v5e (bit-exact vs the XLA twin at every
config; see PERF.md "Pallas FPS kernel" for methodology — the first
~10 executions after compile run a slow relay path, so short benches
under-report):

    N=40000 S=2048 C=3   pallas 3.7 ms   xla 34.0 ms   (9.2x)
    N=16384 S= 512 C=3   pallas 1.5 ms   xla  4.3 ms   (2.8x)
    N= 4096 S= 512 C=19  pallas 3.2 ms   xla  3.9 ms   (1.2x)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128
# beyond this VMEM footprint for the point planes, callers should use
# the XLA fallback (v5e VMEM is ~16 MB; leave headroom for the
# min-dist plane, the index plane, and the output row)
_VMEM_BYTES_LIMIT = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _folded(n: int):
    """(rows, n_pad) of the (R, 128) folding of an N-point cloud."""
    rows = _round_up(max(-(-n // _LANES), 8), 8)
    return rows, rows * _LANES


def fits_vmem(n: int, c: int = 3) -> bool:
    """True when the (C, R, 128) point planes fit the VMEM budget."""
    rows, n_pad = _folded(n)
    return (c + 2) * n_pad * 4 <= _VMEM_BYTES_LIMIT


def _fps_kernel(n: int, n_samples: int, c: int, xt_ref, out_ref, md_ref):
    rows = xt_ref.shape[1]
    idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
           + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    # +inf on real points (any distance improves them), -inf on padding
    # (never selected by the max)
    md_ref[...] = jnp.where(idx < n, jnp.inf, -jnp.inf)
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, n_samples), 1)
    out_ref[...] = jnp.zeros((1, n_samples), jnp.int32)  # slot 0 <- 0
    n_pad = rows * _LANES

    def body(i, last):
        eq = (idx == last).astype(jnp.float32)            # (R, L)
        d = jnp.zeros((rows, _LANES), jnp.float32)
        for ci in range(c):                               # static unroll
            plane = xt_ref[ci]
            vc = jnp.sum(plane * eq)                      # selected coord
            d = d + (plane - vc) ** 2
        md = jnp.minimum(md_ref[...], d)
        md_ref[...] = md
        m = jnp.max(md)
        nxt = jnp.min(jnp.where(md == m, idx, n_pad)).astype(jnp.int32)
        out_ref[...] = jnp.where(slots == i, nxt, out_ref[...])
        return nxt

    jax.lax.fori_loop(1, n_samples, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def fps_pallas(points, n_samples: int, interpret: bool = False):
    """Farthest-point sampling on TPU via a single-program Pallas kernel.

    Args:
        points: (N, C) float array (C = 3 for D-FPS; larger for F-FPS).
        n_samples: number of indices to select (<= N).
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns (n_samples,) int32 indices, starting from index 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = points.shape
    rows, n_pad = _folded(n)
    xt = jnp.zeros((c, n_pad), jnp.float32)
    xt = xt.at[:, :n].set(points.T.astype(jnp.float32))
    xt = xt.reshape(c, rows, _LANES)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n, n_samples, c),
        out_shape=jax.ShapeDtypeStruct((1, n_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[0]
