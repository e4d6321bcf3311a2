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

# flagship FastIndoorImVoxelNeck layer shapes: (D, H, W, Cin, Cout, stride)
SHAPES = [
    ("neck_down0", (16, 40, 40, 256, 256, 1)),
    ("neck_down1_s2", (16, 40, 40, 256, 512, 2)),
    ("neck_down2_s2", (8, 20, 20, 512, 1024, 2)),
    ("neck_out0", (16, 40, 40, 256, 128, 1)),
]
TINY = [("tiny", (4, 8, 8, 16, 16, 1))]


def bench_one(schedule_fn, shape, dtype, iters: int, warmup: int):
    d, h, w, cin, cout, s = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, d, h, w, cin), dtype)
    k = jax.random.normal(key, (3, 3, 3, cin, cout), dtype) * 0.02
    strides = (s, s, s)

    @jax.jit
    def fwd(x, eps):
        return schedule_fn(x + eps, k, strides).sum()

    @jax.jit
    def fwdbwd(x, eps):
        return jax.grad(lambda xx: schedule_fn(xx, k, strides).sum())(
            x + eps).sum()

    out = {}
    for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        jax.device_get(fn(x, jnp.asarray(0.0, dtype)))
        for i in range(warmup):
            fn(x, jnp.asarray(i * 1e-6, dtype))
        jax.device_get(fn(x, jnp.asarray(0.0, dtype)))
        t0 = time.perf_counter()
        r = None
        for i in range(iters):
            r = fn(x, jnp.asarray(i * 1e-6, dtype))
        jax.device_get(r)
        out[name] = (time.perf_counter() - t0) / iters * 1e3
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
