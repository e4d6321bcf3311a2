#!/usr/bin/env python
"""Micro-profile the sparse SECOND middle encoder, piece by piece.

Times each primitive of `ops/sparse_conv.py` at the exact shapes the
`hv_second_secfpn_kitti` encoder runs them (per level), plus the whole
encoder fwd and fwd+bwd — to locate where the SECOND train step's time
goes. Methodology per PERF.md (jit, varied inputs, one device_get).

Usage: python tools/profile_sparse.py [--dtype bf16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from nerfdet_tpu.ops import sparse_conv as sp

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    V = 16000

    # per-level (shape, cin, n_subm) schedule of the KITTI encoder
    levels = [
        ((41, 1600, 1408), 16, 2),   # conv_input + encoder_0_0
        ((21, 800, 704), 32, 2),     # after down1
        ((11, 400, 352), 64, 2),
        ((5, 200, 176), 64, 2),
    ]

    print(f"dtype={args.dtype}  V={V}")
    total_est = 0.0
    for li, (shape, cin, n_subm) in enumerate(levels):
        d, h, w = shape
        n = min(V, d * h * w // 2)
        lin = rng.choice(d * h * w, n, replace=False)
        coords = np.full((V, 3), -1, np.int32)
        coords[:n, 0] = lin // (h * w)
        coords[:n, 1] = (lin // w) % h
        coords[:n, 2] = lin % w
        coords = jnp.asarray(coords)
        feats = jnp.asarray(
            rng.randn(V, cin).astype(np.float32)).astype(dt)
        kern = jnp.asarray(
            rng.randn(3, 3, 3, cin, cin).astype(np.float32) * 0.1
        ).astype(dt)

        f_idx = jax.jit(functools.partial(
            sp.build_index_volume, shape=shape, sentinel=V))
        idx = f_idx(coords)
        t_idx = timeit(f_idx, coords)

        f_nbr = jax.jit(lambda c, i: sp.neighbor_indices(
            c, i, V, shape, (3, 3, 3), 1, 1))
        nbr = f_nbr(coords, idx)
        t_nbr = timeit(f_nbr, coords, idx)

        f_gg = jax.jit(lambda f, nb, k: sp.gather_gemm(f, nb, k, V))
        t_gg = timeit(f_gg, feats, nbr, kern)

        def loss(f, k, nb):
            return (sp._subm_gemm(f, k, nb).astype(jnp.float32) ** 2
                    ).sum()

        f_bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_bwd = timeit(f_bwd, feats, kern, nbr)

        f_ds = jax.jit(lambda c: sp.downsample_active(
            c, shape, (3, 3, 3), (2, 2, 2), 1, V)[0])
        t_ds = timeit(f_ds, coords)

        est = t_idx + t_nbr + n_subm * t_gg + t_ds
        total_est += est
        print(f"L{li} {shape} C={cin}: idxvol {t_idx:.1f}  "
              f"nbr27 {t_nbr:.1f}  gemm {t_gg:.1f}  "
              f"subm f+b {t_bwd:.1f}  downsample {t_ds:.1f}  "
              f"(level fwd est {est:.1f})")

    print(f"sum of fwd estimates: {total_est:.1f} ms")

    # whole encoder fwd and fwd+bwd, row vs column formulations
    from nerfdet_tpu.nn.middle_encoders import (SparseEncoderColumn,
                                                SparseEncoderSparse)

    coords0 = np.full((V, 3), -1, np.int32)
    lin = rng.choice(41 * 1600 * 1408, V, replace=False)
    coords0[:, 0] = lin // (1600 * 1408)
    coords0[:, 1] = (lin // 1408) % 1600
    coords0[:, 2] = lin % 1408
    coords0 = jnp.asarray(coords0)
    vf = jnp.asarray(rng.randn(V, 4).astype(np.float32)).astype(dt)

    for name, cls in [("row", SparseEncoderSparse),
                      ("column", SparseEncoderColumn)]:
        enc = cls(dtype=dt)
        variables = jax.jit(enc.init)(jax.random.PRNGKey(0), vf, coords0)

        f_fwd = jax.jit(lambda p, f, e=enc: e.apply(p, f, coords0))
        t_fwd = timeit(f_fwd, variables, vf, iters=5)

        def eloss(params, f, e=enc):
            return (e.apply(params, f, coords0).astype(jnp.float32)
                    ** 2).mean()

        f_fb = jax.jit(jax.grad(eloss))
        t_fb = timeit(f_fb, variables, vf, iters=5)
        print(f"{name:6s} encoder fwd {t_fwd:.1f} ms   "
              f"fwd+bwd {t_fb:.1f} ms")


if __name__ == "__main__":
    main()
