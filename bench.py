"""Benchmark: interpolated frames/sec/chip for x8 MFI on DeMFI-Net_rb(5,3).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs at Rt = 0.61 s per output frame
at 640x352 on a TITAN RTX (figures/Table2.PNG), i.e. 1.64 frames/s.
We measure the same workload — one 4-frame 640x352 window interpolated x8
(7 output instants, N_tst=3) — end to end through the inference engine
(t-batched, Stage I computed once per window), steady state.

Usage: python bench.py [--quick] [--res 352x640] [--dtype float32|bfloat16]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller spatial size (fast smoke run)")
    ap.add_argument("--res", type=str, default="352x640",
                    help="HxW, e.g. 352x640 or 720x1280")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--n_tst", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model
    from demfi_tpu.infer import InferenceEngine

    if args.quick:
        h, w = 128, 256
        args.iters = 2
    else:
        h, w = (int(x) for x in args.res.split("x"))

    cfg = config_rb(5, args.n_tst, compute_dtype=args.dtype)
    model = make_model(cfg)
    rng = np.random.RandomState(0)
    frames = rng.uniform(-1, 1, (1, 4, h, w, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(frames[:, :, :64, :64]),
                        jnp.zeros((1, 1)), num_update=1)
    engine = InferenceEngine(model, params, num_update=args.n_tst)
    ts = np.linspace(1 / 8, 7 / 8, 7).astype(np.float32)

    # warmup / compile
    engine.forward_window(frames, ts)
    t0 = time.time()
    for _ in range(args.iters):
        res = engine.forward_window(frames, ts)
    dt = (time.time() - t0) / args.iters
    fps = 7.0 / dt

    baseline_fps = 1.0 / 0.61  # reference Rt at 640x352 (Table 2)
    print(json.dumps({
        "metric": f"x8 MFI interp frames/sec/chip ({h}x{w}, N_tst="
                  f"{args.n_tst}, {args.dtype})",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
