"""Micro-benchmark the 3D-conv schedules on the detector's volume shapes.

Times forward and forward+backward of one Conv3D per schedule
(``ztap`` / ``mm`` / ``zfold``, see `ops/conv3d.py`) on the flagship
neck's layer shapes, with the PERF.md methodology: jit, warm the exec
and transfer programs, enqueue varied inputs, synchronize with one
``device_get`` at the end.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/convbench.py
    python tools/convbench.py --cpu --tiny     # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from nerfdet_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfdet_tpu.ops import conv3d  # noqa: E402

# flagship FastIndoorImVoxelNeck + head layer shapes:
# (D, H, W, Cin, Cout, stride) — D is the folded (z) axis
SHAPES = [
    ("neck_down0", (16, 40, 40, 256, 256, 1)),       # down_0 conv1/2, up_1
    ("neck_down1_s2", (16, 40, 40, 256, 512, 2)),    # down_1 conv1
    ("neck_down1b", (8, 20, 20, 512, 512, 1)),       # down_1 conv2, up_2
    ("neck_down2_s2", (8, 20, 20, 512, 1024, 2)),    # down_2 conv1
    ("neck_down2b", (4, 10, 10, 1024, 1024, 1)),     # down_2 conv2
    ("neck_out0", (16, 40, 40, 256, 128, 1)),
    ("neck_out1", (8, 20, 20, 512, 128, 1)),
    ("neck_out2", (4, 10, 10, 1024, 128, 1)),
    ("head_cls0", (16, 40, 40, 128, 18, 1)),
    ("head_cls1", (8, 20, 20, 128, 18, 1)),
    ("head_reg0", (16, 40, 40, 128, 6, 1)),
]
TINY = [("tiny", (4, 8, 8, 16, 16, 1))]


def bench_one(schedule_fn, shape, dtype, iters: int, warmup: int):
    """Time one conv via an ON-DEVICE chained fori_loop.

    The axon relay costs ~1.5-3 ms per dispatch, which swamps sub-ms
    kernels when each iteration is its own executable (the winners
    flipped between runs under the old per-dispatch loop). Here ONE
    dispatch runs ``iters`` data-dependent iterations (each conv's
    input is perturbed by the previous mean, so XLA can neither batch
    nor elide them); per-iteration time = total / iters.
    """
    d, h, w, cin, cout, s = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, d, h, w, cin), dtype)
    k = jax.random.normal(key, (3, 3, 3, cin, cout), dtype) * 0.02
    strides = (s, s, s)

    def fwd_once(xx):
        return schedule_fn(xx, k, strides).mean().astype(dtype)

    def fwdbwd_once(xx):
        # squared sum: a plain sum's gradient is input-independent
        # (conv is linear), which XLA hoists out of the timing loop
        g = jax.grad(lambda a: (schedule_fn(a, k, strides)
                                .astype(jnp.float32) ** 2).sum())(xx)
        return g.mean().astype(dtype)

    def chain(once):
        @jax.jit
        def run(x, n):
            def body(_, acc):
                return acc * 1e-6 + once(x + acc * 1e-6)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.asarray(0.0, dtype))
        return run

    out = {}
    for name, once in (("fwd", fwd_once), ("fwd+bwd", fwdbwd_once)):
        run = chain(once)
        jax.device_get(run(x, warmup))  # compile + warm
        jax.device_get(run(x, warmup))
        t0 = time.perf_counter()
        jax.device_get(run(x, iters))
        t1 = time.perf_counter() - t0
        # subtract the fixed dispatch cost with a second length
        t0 = time.perf_counter()
        jax.device_get(run(x, 2 * iters))
        t2 = time.perf_counter() - t0
        out[name] = max(t2 - t1, 0.0) / iters * 1e3
    return out


# neck up-block ConvTranspose shapes: (D, H, W, Cin, Cout)
UP_SHAPES = [
    ("neck_up2", (4, 10, 10, 1024, 512)),
    ("neck_up1", (8, 20, 20, 512, 256)),
]


def bench_transpose(shape, dtype, iters: int, warmup: int):
    """A/B the 2x2x2 stride-2 ConvTranspose schedules: XLA's
    fractionally-strided lowering vs the matmul + depth-to-space
    formulation (`conv3d.conv_transpose_block`). Same chained-fori
    methodology as :func:`bench_one`."""
    from flax import linen as nn

    d, h, w, cin, cout = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, d, h, w, cin), dtype)
    k = jax.random.normal(key, (2, 2, 2, cin, cout), dtype) * 0.02
    ref = nn.ConvTranspose(cout, (2, 2, 2), strides=(2, 2, 2),
                           use_bias=False, dtype=dtype)

    def xla_once(xx):
        return ref.apply({"params": {"kernel": k}},
                         xx).mean().astype(dtype)

    def mm_once(xx):
        return conv3d.conv_transpose_block(xx, k).mean().astype(dtype)

    out = {}
    for name, once in (("xla", xla_once), ("mm", mm_once)):
        fwdbwd = jax.grad(
            lambda a, f=once: (f(a).astype(jnp.float32) ** 2).sum())

        for phase, fn in (("fwd", once), ("fwd+bwd", lambda a,
                                          g=fwdbwd: g(a).mean())):
            @jax.jit
            def run(x, n, fn=fn):
                def body(_, acc):
                    return (acc * 1e-6
                            + jnp.asarray(fn(x + acc * 1e-6),
                                          jnp.float32))
                return jax.lax.fori_loop(0, n, body,
                                         jnp.asarray(0.0, jnp.float32))

            jax.device_get(run(x, warmup))
            jax.device_get(run(x, warmup))
            t0 = time.perf_counter()
            jax.device_get(run(x, iters))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.device_get(run(x, 2 * iters))
            t2 = time.perf_counter() - t0
            out[f"{name}_{phase}"] = max(t2 - t1, 0.0) / iters * 1e3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--schedules", default="ztap,mm,zfold")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if not args.tiny:
        for label, shape in UP_SHAPES:
            ms = bench_transpose(shape, dtype, args.iters, args.warmup)
            print(json.dumps(dict(
                {"shape": label,
                 "dtype": "bf16" if args.bf16 else "f32"},
                **{kk: round(vv, 3) for kk, vv in ms.items()})),
                flush=True)
    shapes = TINY if args.tiny else SHAPES
    for label, shape in shapes:
        for sched in args.schedules.split(","):
            ms = bench_one(conv3d._SCHEDULES[sched], shape, dtype,
                           args.iters, args.warmup)
            print(json.dumps({
                "shape": label, "schedule": sched,
                "dtype": "bf16" if args.bf16 else "f32",
                "fwd_ms": round(ms["fwd"], 3),
                "fwd_bwd_ms": round(ms["fwd+bwd"], 3),
            }), flush=True)


if __name__ == "__main__":
    main()
